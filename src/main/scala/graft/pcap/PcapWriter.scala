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
  * reach it). Output format is classic little-endian microsecond pcap.
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

  def write(df: DataFrame, dir: String, linktype: Int = 1, snaplen: Int = 262144): Unit = {
    val conf = new SerializableConfiguration(df.sparkSession.sessionState.newHadoopConf())
    // preserve the on-the-wire length of snaplen-truncated packets when
    // the scan carried it; otherwise orig_len = captured length
    val origLenCol =
      if (df.columns.contains("frame.len")) col("`frame.len`").cast("long")
      else lit(-1L)
    val rows = df.select(
      unix_micros(col("`frame.time_epoch`")).as("us"),
      col("`frame.raw`").as("raw"),
      origLenCol.as("orig_len"))
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val path = new Path(dir, f"part-${TaskContext.getPartitionId()}%05d.pcap")
        val fs = path.getFileSystem(conf.value)
        val out = new DataOutputStream(new BufferedOutputStream(fs.create(path, true), 1 << 20))
        try {
          val hdr = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
          hdr.putInt(0xA1B2C3D4).putShort(2).putShort(4)
            .putInt(0).putInt(0).putInt(snaplen).putInt(linktype)
          out.write(hdr.array())
          val rh = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
          it.foreach { r =>
            val us = r.getLong(0)
            val bytes = unhex(r.getString(1))
            val orig = if (r.getLong(2) >= 0) r.getLong(2).toInt else bytes.length
            rh.clear()
            rh.putInt((us / 1000000L).toInt).putInt((us % 1000000L).toInt)
              .putInt(bytes.length).putInt(orig)
            out.write(rh.array(), 0, 16)
            out.write(bytes)
          }
        } finally out.close()
      }
    }
  }
}
