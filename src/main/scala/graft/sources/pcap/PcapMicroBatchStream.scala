package graft.sources.pcap

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Micro-batch streaming over a capture DIRECTORY: each new pcap file that
  * appears becomes part of the next micro-batch — i.e. `readStream
  * .format("pcap").load(dir)` tails a rolling-capture directory (the shape
  * tcpdump/dumpcap `-G`/`-b` rotation produces).
  *
  * The reference explicitly does not support live capture (README
  * roadmap, `README.md:37-38`); this is the Spark-native answer: capture
  * rotation + file streaming, with every batch flowing through the same
  * dissector/scan code as the batch source.
  *
  * Offsets are monotonically increasing batch ids over the set of
  * files seen by THIS stream instance, discovered in (name-sorted) order.
  * On checkpoint restart, files are rediscovered — at-least-once delivery;
  * exactly-once requires the file-sink pattern of idempotent downstream
  * writes (documented limitation of this v1).
  */
final class PcapMicroBatchStream(
    schema: StructType,
    options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private final case class PcapOffset(batchId: Long) extends Offset {
    override def json(): String = batchId.toString
  }

  private val conf = new Configuration()
  private val seen = mutable.HashSet.empty[String]
  private val batches = mutable.HashMap.empty[Long, Seq[String]]
  private var lastBatch = -1L

  private def discover(): Seq[String] =
    PcapTable.expand(PcapTable.paths(options), conf).sorted

  override def initialOffset(): Offset = PcapOffset(-1L)

  override def latestOffset(): Offset = synchronized {
    val fresh = discover().filterNot(seen)
    if (fresh.nonEmpty) {
      lastBatch += 1
      batches(lastBatch) = fresh
      seen ++= fresh
    }
    PcapOffset(lastBatch)
  }

  override def deserializeOffset(json: String): Offset = PcapOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PcapOffset].batchId
    val e = end.asInstanceOf[PcapOffset].batchId
    val climit = Option(options.get("climit")).map(_.toLong).getOrElse(Long.MaxValue)
    synchronized {
      ((s + 1) to e).flatMap(b => batches.getOrElse(b, Seq.empty))
        .map(f => PcapInputPartition(f, climit): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val compatStrict = options.getOrDefault("compat", "") == "strict"
    val cfilter = Option(options.get("cfilter")).filter(_.nonEmpty)
    val backend = options.getOrDefault("backend", "native")
    PcapReaderFactory(schema, compatStrict, cfilter, Array.empty, backend)
  }

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[PcapOffset].batchId
    batches.keys.filter(_ <= e).toSeq.foreach(batches.remove)
  }

  override def stop(): Unit = ()
}
