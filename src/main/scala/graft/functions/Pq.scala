package graft.functions

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", IEEE TPAMI 2011): the embedding space is split into
  * `m` subspaces, each quantized by its own small k-means codebook, so a
  * vector compresses to `m` small codes (here 8 codes over 64 dims — an
  * 8-byte fingerprint instead of 256 bytes of floats, 32× less state to
  * scan).
  *
  * The 100 TB story: candidate scanning touches ONLY the code column and
  * a broadcast codebook; full vectors are read once at encode time and
  * again only for the final exact rerank of a small candidate set. Search
  * is two-stage and fully plan-side: approximate scores come from
  * reconstructing candidates out of codebook literals (`element_at` on a
  * nested array literal + the codegen'd [[VectorDot]]), then the top
  * `rerank` candidates join back to true embeddings for exact cosine.
  */
object Pq {

  final case class Codebook(m: Int, dsub: Int, centroids: Array[Array[Array[Double]]])

  /** Fit one k-means per subspace. Codebook training never needs the full
    * corpus — a deterministic systematic sample (`vec_id % stride = 0`,
    * capped at `fitSample` rows) bounds the fit cost independently of
    * corpus size, which is the only viable shape at 100 TB. The `m`
    * independent fits run concurrently (each is a small Spark job; serial
    * execution made the driver-side job overhead the dominant cost). */
  def fit(spark: SparkSession, emb: DataFrame, m: Int = 8, k: Int = 16,
      seed: Long = 42L, fitSample: Long = 100000L): Codebook = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val n = emb.count()
    val stride = (n + fitSample - 1) / fitSample // ceil: sample stays <= fitSample rows
    val sample =
      if (stride > 1) emb.filter(col("vec_id") % stride === 0).cache()
      else emb // full corpus already small; never cache-pin the whole table
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fits = (0 until m).map { j =>
      Future {
        val sub = sample.select(array_to_vector(
          slice(col("embedding"), j * dsub + 1, dsub).cast("array<double>")).as("features"))
        new KMeans().setK(k).setSeed(seed + j).setMaxIter(10).fit(sub)
          .clusterCenters.map(_.toArray)
      }
    }
    val centroids = fits.map(f => Await.result(f, Duration.Inf)).toArray
    if (stride > 1) sample.unpersist()
    Codebook(m, dsub, centroids)
  }

  /** Tag every row with its `m` codes. Per-partition batch encode against
    * the broadcast codebook (the [[graft.multimodal.Media]] pattern: the
    * shared lookup state is the point of mapPartitions here; a per-row
    * expression would re-materialize the codebook per call). */
  def encode(emb: DataFrame, cb: Codebook): DataFrame = {
    val spark = emb.sparkSession
    val bcb = spark.sparkContext.broadcast(cb)
    val schema = StructType(emb.schema.fields :+
      StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    emb.mapPartitions { it =>
      val c = bcb.value
      it.map { row =>
        val e = row.getAs[scala.collection.Seq[Float]]("embedding")
        val codes = new Array[Int](c.m)
        var j = 0
        while (j < c.m) {
          var best = 0
          var bestD = Double.MaxValue
          val cents = c.centroids(j)
          var ci = 0
          while (ci < cents.length) {
            var d = 0.0
            var i = 0
            while (i < c.dsub) {
              val diff = e(j * c.dsub + i) - cents(ci)(i)
              d += diff * diff
              i += 1
            }
            if (d < bestD) { bestD = d; best = ci }
            ci += 1
          }
          codes(j) = best
          j += 1
        }
        Row.fromSeq(row.toSeq :+ codes.toSeq)
      }
    }(encoder)
  }

  /** Reconstruction of the codes column from codebook LITERALS — stays
    * inside whole-stage codegen; no UDF. */
  private def decodeCol(cb: Codebook) = {
    val parts = (0 until cb.m).map { j =>
      val lit = typedlit(cb.centroids(j).map(_.toSeq).toSeq)
      element_at(lit, element_at(col("codes"), j + 1) + 1)
    }
    concat(parts: _*)
  }

  /** IVF-PQ (the composition actually deployed at 100 TB scale: coarse
    * cells bound the candidate set sub-linearly, codes bound the bytes
    * scanned per candidate): probe the nProbe nearest cells per query,
    * approximate-score ONLY those cells' codes, exact-rerank the top
    * `rerank`. One plan; centroids and probes broadcast. */
  def searchIvfPq(
      encodedWithCell: DataFrame, // Ivf.build().assigned + Pq.encode codes
      cb: Codebook,
      index: Ivf.Index,
      queries: DataFrame, // (query_id, qe)
      topK: Int,
      nProbe: Int,
      rerank: Int = 50): DataFrame = {
    val spark = encodedWithCell.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid")
    val wq = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cell"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("ccos", Vectors.cosine(col("qe"), col("centroid")))
      .withColumn("prnk", row_number().over(wq))
      .filter(col("prnk") <= nProbe)
      .select(col("query_id"), col("qe"), col("cell"))
    // approx_cos is computed MAP-SIDE from the codes; only the skinny
    // (query_id, vec_id, approx_cos) triple shuffles through the ranking
    // window — neither embeddings nor reconstructions move
    val scored = encodedWithCell.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        Vectors.cosine(decodeCol(cb).cast("array<double>"), col("qe")).as("approx_cos"))
    rerankExact(scored, encodedWithCell, queries, topK, rerank)
  }

  /** Shared tail: rank approx scores, fetch true embeddings for the tiny
    * candidate set only, exact-cosine rerank. */
  private def rerankExact(
      scored: DataFrame, // (query_id, vec_id, approx_cos)
      corpus: DataFrame, // has (vec_id, label, embedding)
      queries: DataFrame,
      topK: Int,
      rerank: Int): DataFrame = {
    val wa = Window.partitionBy(col("query_id")).orderBy(col("approx_cos").desc, col("vec_id"))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= rerank)
      .select(col("query_id"), col("vec_id"))
      .join(corpus.select(col("vec_id"), col("label"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        Vectors.cosine(col("embedding"), col("qe")).as("cosine"))
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("label"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Two-stage batch search: ADC-style approximate scores over codes only
    * (reconstruction cosine via [[VectorDot]]), exact cosine rerank of the
    * top `rerank` per query. One plan, queries broadcast, no driver loop. */
  def searchBatch(
      encoded: DataFrame,
      cb: Codebook,
      queries: DataFrame, // (query_id, qe)
      topK: Int,
      rerank: Int = 50): DataFrame = {
    // map-side scoring from the codes; only (query_id, vec_id, approx_cos)
    // shuffles — see rerankExact
    val scored = encoded
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        Vectors.cosine(decodeCol(cb).cast("array<double>"), col("qe")).as("approx_cos"))
    rerankExact(scored, encoded, queries, topK, rerank)
  }
}
