package graft.queries

import org.apache.spark.sql.functions._

import graft.api.{GraftQuery, Tables}
import graft.multimodal.Media

/** Multimodal binary-column pipeline surfaced as driver queries. The
  * decode step is a deterministic stub (see [[graft.multimodal.Media]]),
  * which makes the whole pipeline — binary synthesis, mapPartitions batch
  * decode, metadata aggregation — oracle-checkable end-to-end. */
object MultimodalQueries {

  val mmMediaMeta = GraftQuery(
    "mm_media_meta",
    (s, dir) => {
      val media = Media.synthesize(Tables.load(s, dir, "documents"))
      Media.extractMeta(s, media).toDF().orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
             CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
             1 + (ASCII(SUBSTR(MD5(text), 1, 1)) * 256 + ASCII(SUBSTR(MD5(text), 2, 1))) % 512 AS width,
             1 + (ASCII(SUBSTR(MD5(text), 3, 1)) * 256 + ASCII(SUBSTR(MD5(text), 4, 1))) % 512 AS height,
             ASCII(SUBSTR(MD5(text), 5, 1)) * 256 + ASCII(SUBSTR(MD5(text), 6, 1)) AS duration_ms
      FROM documents
      ORDER BY doc_id"""))

  /** Aggregate over decoded metadata: batch stats per media type. */
  val mmTypeStats = GraftQuery(
    "mm_type_stats",
    (s, dir) => {
      val media = Media.synthesize(Tables.load(s, dir, "documents"))
      Media.extractMeta(s, media).toDF()
        .groupBy("media_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          min(col("width")).as("min_width"),
          max(col("height")).as("max_height"))
        .orderBy("media_type")
    },
    Some("""
      WITH meta AS (
        SELECT doc_id,
               (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
               CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
               1 + (ASCII(SUBSTR(MD5(text), 1, 1)) * 256 + ASCII(SUBSTR(MD5(text), 2, 1))) % 512 AS width,
               1 + (ASCII(SUBSTR(MD5(text), 3, 1)) * 256 + ASCII(SUBSTR(MD5(text), 4, 1))) % 512 AS height
        FROM documents)
      SELECT media_type, COUNT(*) AS n,
             CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
             MIN(width) AS min_width, MAX(height) AS max_height
      FROM meta
      GROUP BY media_type
      ORDER BY media_type"""))

  /** 1→N frame sampling over the video subset (lazy flatMap inside
    * mapPartitions — the shape a video→training-frames extractor runs at
    * scale; decode stubbed, see [[graft.multimodal.Media.sampleFrames]]). */
  val mmFrameSample = GraftQuery(
    "mm_frame_sample",
    (s, dir) => {
      val media = Media.synthesize(Tables.load(s, dir, "documents"))
      Media.sampleFrames(s, media).toDF().orderBy("doc_id", "frame_idx")
    },
    Some("""
      WITH v AS (
        SELECT doc_id, text,
               ASCII(SUBSTR(MD5(text), 5, 1)) * 256 + ASCII(SUBSTR(MD5(text), 6, 1)) AS duration_ms
        FROM documents
        WHERE doc_id % 3 = 2),
      nf AS (SELECT *, 1 + duration_ms % 4 AS n_frames FROM v)
      SELECT doc_id, i AS frame_idx,
             CAST(i * (duration_ms // n_frames) AS BIGINT) AS ts_ms,
             MD5(text || ':' || CAST(i AS VARCHAR)) AS frame_md5
      FROM nf, UNNEST(RANGE(0, CAST(n_frames AS BIGINT))) AS t(i)
      ORDER BY doc_id, frame_idx"""))

  val all: Seq[GraftQuery] = Seq(mmMediaMeta, mmTypeStats, mmFrameSample)
}
