package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable Bloom filter for ingest-time dedup pre-filtering.
  *
  * Layout: 4,032 bits as 64 × 63-bit BIGINT words (63 bits per word so no
  * set bit ever touches the sign bit — the words round-trip through any
  * engine, file format, or SQL dialect unchanged), 3 hash positions per
  * key derived from md5 prefixes (the same salted-md5 family the MinHash /
  * train-split operators use). Everything is integer/bit arithmetic, so
  * DuckDB replays the filter bit-for-bit and the fitted words themselves
  * are oracle-checkable — not just the verdicts.
  *
  * 100 TB shape: the fit is ONE bit_or aggregate over the corpus (shuffle
  * of (word, mask) pairs — 64 distinct keys); the fitted table is tiny and
  * broadcasts; the probe is per-row compute + a broadcast lookup, so the
  * arriving side NEVER shuffles — which is why [[probe]] is written
  * input-agnostic and runs unchanged under Structured Streaming
  * (stream-static broadcast join, no stateful operator, append mode).
  */
object BloomDedup {

  val mBits = 4032L // 64 words × 63 bits

  /** The 3 hash positions of an md5-hex key column. */
  def positions(h: Column): Seq[Column] = (0 until 3).map { j =>
    conv(substring(md5(concat(lit(s"$j|"), h)), 1, 12), 16, 10)
      .cast(LongType) % mBits
  }

  /** Fit: (word BIGINT, bits BIGINT) rows, one per touched word. Input
    * must carry an md5-hex `h` column. */
  def fit(corpus: DataFrame): DataFrame = corpus
    .select(explode(array(positions(col("h")): _*)).as("pos"))
    .select(expr("pos div 63").as("word"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").as("mask"))
    .groupBy(col("word")).agg(expr("bit_or(mask)").as("bits"))

  /** The fitted filter pivoted to a ONE-ROW word→bits map, so the probe
    * is a broadcast cross join + map lookups instead of a key join + a
    * per-doc aggregate — no stateful operator, so the identical plan runs
    * under streaming append mode. (Map construction is collect_list-based;
    * map lookup is order-insensitive, so the row is deterministic.) */
  def fitMapRow(bloom: DataFrame): DataFrame = bloom
    .agg(map_from_entries(collect_list(struct(col("word"), col("bits"))))
      .as("bmap"))

  /** Probe: per-row Bloom verdict for a frame carrying `doc_id` and an
    * md5-hex `h` column — batch or streaming. A position whose word is
    * absent from the map (never set by the fit) is a definite miss. */
  def probe(arriving: DataFrame, bloomMapRow: DataFrame): DataFrame = {
    val hits = positions(col("h")).zipWithIndex.map { case (p, i) =>
      val pos = s"pos$i"
      (pos, p)
    }
    val withPos = hits.foldLeft(arriving)((df, pc) => df.withColumn(pc._1, pc._2))
    val verdict = hits.map { case (pos, _) =>
      coalesce(
        expr(s"(shiftright(element_at(bmap, $pos div 63), CAST($pos % 63 AS INT)) & 1) = 1"),
        lit(false))
    }.reduce(_ && _)
    withPos.crossJoin(broadcast(bloomMapRow))
      .select(col("doc_id"), verdict.as("bloom_hit"))
  }
}
