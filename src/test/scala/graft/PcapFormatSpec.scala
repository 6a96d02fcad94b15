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

  private def dissectOne(frame: Array[Byte]): Dissect.Dissected = {
    val rec = PcapFormat.Record(1, 1000000L, frame.length, frame.length, frame)
    Dissect.dissect(rec, 1, new Dissect.Tracker)
  }

  private def ethIpUdp(sp: Int, dp: Int, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(14 + 20 + 8 + payload.length)
    b.put(new Array[Byte](12)).putShort(0x0800.toShort) // eth
    val iplen = 20 + 8 + payload.length
    b.put(0x45.toByte).put(0.toByte).putShort(iplen.toShort)
      .putShort(1.toShort).putShort(0.toShort)
      .put(64.toByte).put(17.toByte).putShort(0.toShort)
      .put(Array[Byte](10, 0, 0, 1)).put(Array[Byte](10, 0, 0, 2))
    b.putShort(sp.toShort).putShort(dp.toShort)
      .putShort((8 + payload.length).toShort).putShort(0.toShort)
    b.put(payload)
    b.array()
  }

  test("ARP request renders Who-has info and fields") {
    val b = java.nio.ByteBuffer.allocate(42)
    b.put(new Array[Byte](12)).putShort(0x0806.toShort)
    b.putShort(1.toShort).putShort(0x0800.toShort).put(6.toByte).put(4.toByte)
      .putShort(1.toShort) // opcode: request
      .put(Array[Byte](0, 0, 0, 0, 0, 1)) // placeholder
    val frame = b.array()
    frame(21) = 1 // ensure some sender mac bytes
    // sender ip at offset 14+14=28, target ip at 14+24=38
    frame(28) = 10; frame(29) = 0; frame(30) = 0; frame(31) = 5
    frame(38) = 10; frame(39) = 0; frame(40) = 0; frame(41) = 9
    val d = dissectOne(frame)
    assert(d.protocols === "eth:ethertype:arp")
    assert(d.info === "Who has 10.0.0.9? Tell 10.0.0.5")
    assert(d.values("arp.opcode") === 1L)
  }

  test("DNS query over UDP/53 dissects name, type, and info") {
    // header: id=0x1234, flags=0x0100 (standard query), qd=1
    val q = java.nio.ByteBuffer.allocate(12 + 13 + 4)
    q.putShort(0x1234.toShort).putShort(0x0100.toShort)
      .putShort(1.toShort).putShort(0.toShort).putShort(0.toShort).putShort(0.toShort)
    q.put(7.toByte).put("example".getBytes).put(3.toByte).put("com".getBytes).put(0.toByte)
    q.putShort(1.toShort).putShort(1.toShort) // qtype=A, qclass=IN
    val d = dissectOne(ethIpUdp(40000, 53, q.array()))
    assert(d.protocols === "eth:ethertype:ip:udp:dns")
    assert(d.values("dns.qry.name") === "example.com")
    assert(d.values("dns.qry.type") === 1L)
    assert(d.values("dns.flags.response") === false)
    assert(d.info === "Standard query 0x1234 A example.com")
  }

  test("ICMP echo request renders ping info") {
    val icmp = java.nio.ByteBuffer.allocate(8)
    icmp.put(8.toByte).put(0.toByte).putShort(0.toShort)
      .putShort(0x42.toShort).putShort(7.toShort)
    val b = java.nio.ByteBuffer.allocate(14 + 20 + 8)
    b.put(new Array[Byte](12)).putShort(0x0800.toShort)
    b.put(0x45.toByte).put(0.toByte).putShort(28.toShort)
      .putShort(1.toShort).putShort(0.toShort)
      .put(64.toByte).put(1.toByte).putShort(0.toShort)
      .put(Array[Byte](10, 0, 0, 1)).put(Array[Byte](10, 0, 0, 2))
    b.put(icmp.array())
    val d = dissectOne(b.array())
    assert(d.protocols === "eth:ethertype:ip:icmp")
    assert(d.info === "Echo (ping) request  id=0x0042, seq=7")
    assert(d.values("icmp.type") === 8L)
  }
}
