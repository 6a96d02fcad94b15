package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video travel as opaque
  * `binary` columns with typed metadata alongside (driver-mandated
  * extension, SURVEY §7.6.5).
  *
  * The Spark-side mechanics are real and tested — schema, per-partition
  * batch processing (`mapPartitions` over a typed Dataset, the Scala
  * analogue of `mapInPandas` batch shape), partition-friendly layout, no
  * driver-side materialization. The codec step itself is STUBBED (this
  * container has no image/audio libraries): [[Media.decodeStub]] derives
  * deterministic fake dimensions from the payload digest, and marks where a
  * real JPEG/PNG/WAV decoder plugs in.
  */
object Media {

  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      duration_ms: Long)

  /** Synthesize a binary media column from `documents` (deterministic:
    * payload = UTF-8 text bytes, type round-robins by doc_id). In a real
    * pipeline this column comes straight from parquet `binary` storage. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB — real implementation decodes the codec header (JPEG SOF / PNG
    * IHDR / WAV fmt chunk). Here: deterministic pseudo-metadata from the
    * md5 hex digest so the pipeline shape is testable end-to-end. */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val hex = MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
    val width = 1 + (hex(0).toLong * 256 + hex(1)) % 512
    val height = 1 + (hex(2).toLong * 256 + hex(3)) % 512
    val duration = hex(4).toLong * 256 + hex(5)
    (width, height, duration)
  }

  /** Batch metadata extraction: one `mapPartitions` pass, constant memory
    * per partition, executor-local — scales to any number of partitions. */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[(Long, String, Array[Byte])].mapPartitions { it =>
      it.map { case (id, tpe, payload) =>
        val (w, h, d) = decodeStub(payload)
        MediaMeta(id, tpe, payload.length.toLong, w, h, d)
      }
    }
  }

  final case class FrameSample(doc_id: Long, frame_idx: Long, ts_ms: Long, frame_md5: String)

  /** Frame sampling over video rows: the 1→N shape of a real
    * video-to-training-frames pipeline — per-partition batch iteration,
    * lazy flatMap (no per-video frame buffer), 1-4 frames spread evenly
    * across the stubbed duration. STUB boundary: a real implementation
    * seeks the container to `ts_ms` and decodes the frame tensor; here the
    * frame fingerprint md5(payload ++ ":idx") stands in for it (and keeps
    * the operator oracle-checkable). */
  def sampleFrames(spark: SparkSession, media: DataFrame): Dataset[FrameSample] = {
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, _, payload) =>
          val (_, _, dur) = decodeStub(payload)
          val n = 1 + dur % 4
          val md = MessageDigest.getInstance("MD5")
          (0L until n).iterator.map { i =>
            md.reset()
            md.update(payload)
            md.update(s":$i".getBytes("UTF-8"))
            val hex = md.digest().map("%02x".format(_)).mkString
            FrameSample(id, i, i * (dur / n), hex)
          }
        }
      }
  }
}
