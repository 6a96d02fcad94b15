package graft.sources.pcap

import java.io.{BufferedReader, InputStreamReader}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Faithful tshark-pipe backend (`backend=tshark` reader option) — the
  * reference's original execution mode (`popen("tshark -r … -T fields -e …")`,
  * reference `src/wireduck_extension.cpp:108-129`, pull loop `:160-252`),
  * with its documented hazards fixed (SURVEY §2A hazards):
  *
  *  - argv-vector ProcessBuilder, no shell string → no injection;
  *  - spawn at reader construction (execution), not bind/planning;
  *  - unbounded BufferedReader line reads → no fixed line-buffer misparse;
  *  - rows with missing trailing fields are padded with NULL
  *    deterministically (the reference's out-of-range read is UB).
  *
  * Delegating to tshark buys the full ~3000-protocol dissector set; the
  * native backend (default) needs no child process and is faster per core.
  */
final class TsharkPartitionReader(
    file: String,
    maxPackets: Long,
    schema: StructType,
    compatStrict: Boolean,
    cfilter: Option[String])
    extends PartitionReader[InternalRow] {

  require(TsharkPartitionReader.available(),
    "backend=tshark requested but no tshark executable is on PATH " +
      "(the reference refuses to load in this situation; the native " +
      "backend needs no tshark — drop the backend option)")

  private val localPath = file.stripPrefix("file:")

  private val process = {
    val cmd = Seq.newBuilder[String]
    cmd += "tshark" += "-r" += localPath += "-T" += "fields"
    schema.fieldNames.foreach(f => cmd += "-e" += f)
    if (maxPackets != Long.MaxValue) cmd += "-c" += maxPackets.toString
    cfilter.foreach(f => cmd += "-Y" += f)
    new ProcessBuilder(cmd.result().asJava).start()
  }
  private val reader = new BufferedReader(new InputStreamReader(process.getInputStream, "UTF-8"))

  private var current: InternalRow = _

  override def next(): Boolean = {
    val line = reader.readLine()
    if (line == null) false
    else {
      current = TsharkPartitionReader.parseLine(line, schema, compatStrict)
      true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = {
    reader.close()
    process.destroy()
  }
}

object TsharkPartitionReader {

  def available(): Boolean = graft.pcap.Glossary.checkTsharkInstalled()

  /** `std::stoll`-style prefix parse: parse the leading integer, NULL when
    * no digits lead (reference `:208` semantics). */
  private[graft] def stollPrefix(s: String): Option[Long] = {
    val t = s.trim
    var i = 0
    if (i < t.length && (t(i) == '+' || t(i) == '-')) i += 1
    var j = i
    while (j < t.length && t(j).isDigit) j += 1
    if (j == i) None else t.substring(0, j).toLongOption
  }

  private[graft] def stodPrefix(s: String): Option[Double] = {
    val t = s.trim
    var j = 0
    def ok(c: Char) = c.isDigit || c == '.' || c == '+' || c == '-' || c == 'e' || c == 'E'
    while (j < t.length && ok(t(j))) j += 1
    if (j == 0) None else t.substring(0, j).toDoubleOption
  }

  /** One tab-separated tshark line → InternalRow with the reference's
    * per-cell semantics (SURVEY §1.2): empty → NULL, parse failure → NULL
    * (never throw), boolean = (text == "1"), timestamps from epoch seconds
    * (whole-second truncation in compat mode). Missing trailing fields →
    * NULL (fixed UB). */
  private[graft] def parseLine(
      line: String,
      schema: StructType,
      compatStrict: Boolean): InternalRow = {
    val cells = line.split("\t", -1)
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val text = if (i < cells.length) cells(i) else ""
      val value: Any =
        if (text.isEmpty) null
        else schema.fields(i).dataType match {
          case LongType    => stollPrefix(text).map(Long.box).orNull
          case DoubleType  => stodPrefix(text).map(Double.box).orNull
          case BooleanType => Boolean.box(text == "1")
          case TimestampType =>
            stodPrefix(text).map { secs =>
              val micros =
                if (compatStrict) secs.toLong * 1000000L // FromEpochSeconds quirk (:217)
                else (secs * 1e6).toLong
              Long.box(micros)
            }.orNull
          case _ => UTF8String.fromString(text)
        }
      row.update(i, value)
      i += 1
    }
    row
  }
}
