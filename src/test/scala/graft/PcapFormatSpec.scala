package graft

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.pcap.{Dissect, PcapFormat}

/** Synthetic-container edge cases (FIXTURES §4): all four magics,
  * truncation, zero-packet files, non-IP ethertypes. */
class PcapFormatSpec extends AnyFunSuite {

  private def header(le: Boolean, nanos: Boolean, linktype: Int = 1): Array[Byte] = {
    val b = ByteBuffer.allocate(24).order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    b.putInt(if (nanos) 0xa1b23c4d else 0xa1b2c3d4)
    b.putShort(2.toShort).putShort(4.toShort)
    b.putInt(0).putInt(0).putInt(262144).putInt(linktype)
    b.array()
  }

  private def record(le: Boolean, sec: Long, frac: Long, data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(16 + data.length)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    b.putInt(sec.toInt).putInt(frac.toInt).putInt(data.length).putInt(data.length)
    b.put(data)
    b.array()
  }

  private val arpFrame: Array[Byte] = {
    val b = new Array[Byte](42) // eth + minimal arp
    b(12) = 0x08; b(13) = 0x06
    b
  }

  for (le <- Seq(true, false); nanos <- Seq(true, false)) {
    test(s"magic variant le=$le nanos=$nanos round-trips") {
      val frac = if (nanos) 123456789L else 123456L
      val bytes = header(le, nanos) ++ record(le, 1700000000L, frac, arpFrame)
      val recs = PcapFormat.records(new ByteArrayInputStream(bytes)).toList
      assert(recs.length === 1)
      assert(recs.head.tsMicros === 1700000000L * 1000000L + 123456L)
      assert(recs.head.origLen === 42)
    }
  }

  test("zero-packet file yields empty iterator") {
    assert(PcapFormat.records(new ByteArrayInputStream(header(true, false))).isEmpty)
  }

  test("truncated final record is dropped, prior records survive") {
    val good = record(true, 1, 0, arpFrame)
    val bad = record(true, 2, 0, arpFrame).dropRight(10)
    val bytes = header(true, false) ++ good ++ bad
    val recs = PcapFormat.records(new ByteArrayInputStream(bytes)).toList
    assert(recs.map(_.number) === List(1L))
  }

  test("truncated record header (not even 16 bytes) is dropped") {
    val bytes = header(true, false) ++ record(true, 1, 0, arpFrame) ++ Array[Byte](1, 2, 3)
    assert(PcapFormat.records(new ByteArrayInputStream(bytes)).size === 1)
  }

  test("garbage magic rejected") {
    val bad = Array.fill[Byte](24)(0x42)
    intercept[IllegalArgumentException] {
      PcapFormat.records(new ByteArrayInputStream(bad)).toList
    }
  }

  test("maxPackets caps mid-file") {
    val bytes = header(true, false) ++
      (1 to 5).flatMap(i => record(true, i.toLong, 0, arpFrame))
    assert(PcapFormat.records(new ByteArrayInputStream(bytes), maxPackets = 3).size === 3)
  }

  test("ARP frame: tcp/udp fields absent, frame + eth fields populated") {
    val tracker = new Dissect.Tracker
    val rec = PcapFormat.Record(1, 1000000L, arpFrame.length, arpFrame.length, arpFrame)
    val d = Dissect.dissect(rec, 1, tracker)
    assert(d.protocols === "eth:ethertype:arp")
    assert(d.info === "ARP")
    assert(!d.values.contains("tcp.srcport"))
    assert(d.values("eth.type") === 0x0806L)
  }

  test("snaplen-truncated packet keeps orig_len in frame.len") {
    val full = arpFrame ++ new Array[Byte](100)
    val b = ByteBuffer.allocate(16 + 50).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(1).putInt(0).putInt(50).putInt(full.length)
    b.put(full, 0, 50)
    val bytes = header(true, false) ++ b.array()
    val recs = PcapFormat.records(new ByteArrayInputStream(bytes)).toList
    assert(recs.head.inclLen === 50 && recs.head.origLen === 142)
  }
}
