package graft

import java.io.{ByteArrayInputStream, DataInputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pcap.{PcapFormat, PcapngFormat}

/** pcapng container tests: hand-built blocks plus a full golden replay —
  * fix.pcap rewrapped as pcapng must reproduce the README flagship
  * aggregate byte-for-byte. */
class PcapngSpec extends AnyFunSuite {

  private def pad4(n: Int): Int = ((n + 3) / 4) * 4

  private def block(le: Boolean, tpe: Int, body: Array[Byte]): Array[Byte] = {
    val total = 12 + pad4(body.length)
    val b = ByteBuffer.allocate(total)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    b.putInt(tpe).putInt(total).put(body)
    b.position(total - 4)
    b.putInt(total)
    b.array()
  }

  private def shb(le: Boolean): Array[Byte] = {
    val body = ByteBuffer.allocate(16)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    body.putInt(0x1a2b3c4d).putShort(1.toShort).putShort(0.toShort).putLong(-1L)
    block(le, PcapngFormat.Magic, body.array())
  }

  private def idb(le: Boolean, linktype: Int, tsresol: Option[Int]): Array[Byte] = {
    val opts = tsresol.map { v =>
      val o = ByteBuffer.allocate(12).order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      o.putShort(9.toShort).putShort(1.toShort).put(v.toByte).put(new Array[Byte](3))
      o.putShort(0.toShort).putShort(0.toShort) // opt_endofopt
      o.array()
    }.getOrElse(Array.empty[Byte])
    val body = ByteBuffer.allocate(8 + opts.length)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    body.putShort(linktype.toShort).putShort(0.toShort).putInt(262144).put(opts)
    block(le, 1, body.array())
  }

  private def epb(le: Boolean, tsUnits: Long, data: Array[Byte]): Array[Byte] = {
    val body = ByteBuffer.allocate(20 + pad4(data.length))
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    body.putInt(0).putInt((tsUnits >>> 32).toInt).putInt(tsUnits.toInt)
      .putInt(data.length).putInt(data.length).put(data)
    block(le, 6, body.array())
  }

  private val arpFrame: Array[Byte] = {
    val b = new Array[Byte](42)
    b(12) = 0x08; b(13) = 0x06
    b
  }

  private def parse(bytes: Array[Byte]): List[PcapFormat.Record] =
    PcapngFormat.records(
      new DataInputStream(new ByteArrayInputStream(bytes)), Long.MaxValue).toList

  for (le <- Seq(true, false)) {
    test(s"SHB+IDB+EPB round-trip, le=$le, microsecond default tsresol") {
      val ts = 1700000000123456L // micros
      val bytes = shb(le) ++ idb(le, 1, None) ++ epb(le, ts, arpFrame)
      val recs = parse(bytes)
      assert(recs.length === 1)
      assert(recs.head.tsMicros === ts)
      assert(recs.head.origLen === 42)
      assert(recs.head.linktype === 1)
    }
  }

  test("nanosecond tsresol converts to micros") {
    val tsNanos = 1700000000123456789L
    val bytes = shb(true) ++ idb(true, 1, Some(9)) ++ epb(true, tsNanos, arpFrame)
    assert(parse(bytes).head.tsMicros === 1700000000123456L)
  }

  test("unknown blocks are skipped; multiple EPBs numbered sequentially") {
    val junk = block(true, 0x0BAD, new Array[Byte](16))
    val bytes = shb(true) ++ idb(true, 1, None) ++
      epb(true, 1L, arpFrame) ++ junk ++ epb(true, 2L, arpFrame)
    val recs = parse(bytes)
    assert(recs.map(_.number) === List(1L, 2L))
  }

  test("fix.pcap rewrapped as pcapng reproduces the flagship aggregate") {
    // convert the classic fixture to pcapng EPBs
    val fixPath = getClass.getResource("/fix.pcap").getPath
    val classic = PcapFormat.records(new java.io.FileInputStream(fixPath)).toList
    assert(classic.length === 485)
    val out = new java.io.ByteArrayOutputStream()
    out.write(shb(true))
    out.write(idb(true, 1, None))
    classic.foreach(r => out.write(epb(true, r.tsMicros, r.data)))
    val ngFile = java.nio.file.Files.createTempFile("fixng", ".pcapng")
    java.nio.file.Files.write(ngFile, out.toByteArray)

    val spark = SparkSpec.session
    val df = graft.api.Wireduck.readPcap(spark, ngFile.toString, protocols = Seq("ip", "tcp"))
    val rows = df.groupBy(col("`tcp.srcport`"), col("`tcp.dstport`"))
      .agg(count(lit(1)).as("n"), sum(col("`tcp.len`")).as("bytes"))
      .orderBy(desc("n")).collect()
    assert(rows.length === 2)
    assert((rows(0).getAs[Long]("n"), rows(0).getAs[Long]("bytes")) === ((429L, 259678L)))
    assert((rows(1).getAs[Long]("n"), rows(1).getAs[Long]("bytes")) === ((56L, 19702L)))
  }
}
