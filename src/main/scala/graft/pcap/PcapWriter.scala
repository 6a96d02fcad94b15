package graft.pcap

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Write side of the pcap surface: rewrite a (filtered / transformed)
  * capture back to classic pcap files — the sink counterpart the
  * reference lacks (wireduck is read-only; `README.md:17` writes results
  * to parquet/json, never back to a capture).
  *
  * Spark-sink shape: ONE part-file per partition under the output
  * directory, written executor-side with no driver materialization, so a
  * 100 TB filtered rewrite scales exactly like any other distributed
  * write; a later `read_pcap(dir)` globs the parts (multi-file scan).
  *
  * Input contract: a `frame.time_epoch` TIMESTAMP column (micros) and the
  * `frame.raw` hex column (select `protocols := ["frame"]` on the scan to
  * reach it); `frame.time_epoch_ns` (when present) feeds the lossless
  * nanosecond paths. Output is classic little-endian pcap — microsecond
  * magic by default, nanosecond magic with `nanos = true` — or pcapng
  * with ns-resolution EPBs via [[writePcapng]].
  */
object PcapWriter {

  private def unhex(s: String): Array[Byte] = {
    // hexBytes renders colon-separated pairs ("0a:1b:…")
    if (s.isEmpty) return Array.emptyByteArray
    val n = (s.length + 1) / 3
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val o = i * 3
      out(i) = ((Character.digit(s.charAt(o), 16) << 4) |
        Character.digit(s.charAt(o + 1), 16)).toByte
      i += 1
    }
    out
  }

  /** Per-row timestamp in ns: the `frame.time_epoch_ns` column when the
    * scan carried it (lossless for ns-magic / pcapng inputs), else the
    * micros timestamp scaled up. */
  private def nsCol(df: DataFrame) =
    if (df.columns.contains("frame.time_epoch_ns")) col("`frame.time_epoch_ns`").cast("long")
    else unix_micros(col("`frame.time_epoch`")) * 1000L

  private def origLenCol(df: DataFrame) =
    if (df.columns.contains("frame.len")) col("`frame.len`").cast("long")
    else lit(-1L)

  /** @param nanos emit the nanosecond-resolution classic magic
    *              (0xA1B23C4D) with ns fractional stamps — lossless for a
    *              capture read from an ns-magic source (`frame.time_epoch_ns`
    *              carries the full stamp through the scan). */
  def write(df: DataFrame, dir: String, linktype: Int = 1, snaplen: Int = 262144,
      nanos: Boolean = false): Unit = {
    val conf = new SerializableConfiguration(df.sparkSession.sessionState.newHadoopConf())
    // preserve the on-the-wire length of snaplen-truncated packets when
    // the scan carried it; otherwise orig_len = captured length
    val rows = df.select(
      nsCol(df).as("ns"),
      col("`frame.raw`").as("raw"),
      origLenCol(df).as("orig_len"))
    val magic = if (nanos) 0xA1B23C4D else 0xA1B2C3D4
    val fracDiv = if (nanos) 1L else 1000L // ns → stored fraction units
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val path = new Path(dir, f"part-${TaskContext.getPartitionId()}%05d.pcap")
        val fs = path.getFileSystem(conf.value)
        val out = new DataOutputStream(new BufferedOutputStream(fs.create(path, true), 1 << 20))
        try {
          val hdr = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
          hdr.putInt(magic).putShort(2).putShort(4)
            .putInt(0).putInt(0).putInt(snaplen).putInt(linktype)
          out.write(hdr.array())
          val rh = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
          it.foreach { r =>
            val ns = r.getLong(0)
            val bytes = unhex(r.getString(1))
            val orig = if (r.getLong(2) >= 0) r.getLong(2).toInt else bytes.length
            rh.clear()
            rh.putInt((ns / 1000000000L).toInt).putInt(((ns % 1000000000L) / fracDiv).toInt)
              .putInt(bytes.length).putInt(orig)
            out.write(rh.array(), 0, 16)
            out.write(bytes)
          }
        } finally out.close()
      }
    }
  }

  /** pcapng output (one SHB + IDB + EPBs per part-file, little-endian,
    * `if_tsresol = 9`): every EPB carries the full nanosecond stamp, so a
    * modern-Wireshark-native container round-trips ns captures too. Same
    * sink shape as [[write]] — one part per partition, executor-side. */
  def writePcapng(df: DataFrame, dir: String, linktype: Int = 1, snaplen: Int = 262144): Unit = {
    val conf = new SerializableConfiguration(df.sparkSession.sessionState.newHadoopConf())
    val rows = df.select(
      nsCol(df).as("ns"),
      col("`frame.raw`").as("raw"),
      origLenCol(df).as("orig_len"))
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val path = new Path(dir, f"part-${TaskContext.getPartitionId()}%05d.pcapng")
        val fs = path.getFileSystem(conf.value)
        val out = new DataOutputStream(new BufferedOutputStream(fs.create(path, true), 1 << 20))
        try {
          // SHB: byte-order magic, version 1.0, section length unknown (-1)
          val shb = ByteBuffer.allocate(28).order(ByteOrder.LITTLE_ENDIAN)
          shb.putInt(0x0A0D0D0A).putInt(28).putInt(0x1A2B3C4D)
            .putShort(1).putShort(0).putLong(-1L).putInt(28)
          out.write(shb.array())
          // IDB: linktype + snaplen + if_tsresol=9 option + end-of-options
          val idb = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
          idb.putInt(1).putInt(32)
            .putShort(linktype.toShort).putShort(0).putInt(snaplen)
            .putShort(9).putShort(1).put(9.toByte).put(new Array[Byte](3)) // if_tsresol = 1e-9
            .putShort(0).putShort(0) // opt_endofopt
            .putInt(32)
          out.write(idb.array())
          it.foreach { r =>
            val ns = r.getLong(0)
            val bytes = unhex(r.getString(1))
            val orig = if (r.getLong(2) >= 0) r.getLong(2).toInt else bytes.length
            val padded = (bytes.length + 3) / 4 * 4
            val total = 8 + 20 + padded + 4
            val epb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
            epb.putInt(6).putInt(total)
              .putInt(0) // interface id
              .putInt((ns >>> 32).toInt).putInt(ns.toInt) // ts high, low (ns units)
              .putInt(bytes.length).putInt(orig)
              .put(bytes).put(new Array[Byte](padded - bytes.length))
              .putInt(total)
            out.write(epb.array())
          }
        } finally out.close()
      }
    }
  }
}
