package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

/** HPACK dynamic-table decoding across HEADERS frames (RFC 7541 §2.3.2,
  * §6.1–§6.3): literals with incremental indexing populate the SENDING
  * direction's table, indexed references >= 62 resolve against it, a
  * table-size update evicts, and each direction's encoder context is
  * independent — a reference into a table this capture never saw filled
  * stays the opaque `<dynamic>` placeholder, never a wrong value. */
class Http2DynamicTableSpec extends AnyFunSuite {

  private val preface = "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes("ISO-8859-1")

  private def ethIpTcp(payload: Array[Byte], seq: Int,
      rev: Boolean = false): Array[Byte] = {
    val (sp, dp) = if (rev) (80, 49800) else (49800, 80)
    val b = java.nio.ByteBuffer.allocate(14 + 20 + 20 + payload.length)
    b.put(new Array[Byte](12)).putShort(0x0800.toShort)
    b.put(0x45.toByte).put(0.toByte).putShort((40 + payload.length).toShort)
      .putShort(1.toShort).putShort(0.toShort)
      .put(64.toByte).put(6.toByte).putShort(0.toShort)
    if (rev) b.put(Array[Byte](10, 0, 0, 2)).put(Array[Byte](10, 0, 0, 1))
    else b.put(Array[Byte](10, 0, 0, 1)).put(Array[Byte](10, 0, 0, 2))
    b.putShort(sp.toShort).putShort(dp.toShort)
      .putInt(seq).putInt(0)
      .put((5 << 4).toByte).put(0x18.toByte)
      .putShort(8192.toShort).putShort(0.toShort).putShort(0.toShort)
    b.put(payload)
    b.array()
  }

  private def h2Frame(ftype: Int, flags: Int, sid: Int,
      payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(9 + payload.length)
    b.put(((payload.length >> 16) & 0xff).toByte)
      .put(((payload.length >> 8) & 0xff).toByte)
      .put((payload.length & 0xff).toByte)
      .put(ftype.toByte).put(flags.toByte).putInt(sid)
    b.put(payload)
    b.array()
  }

  /** Literal with incremental indexing (01 pattern), static-indexed name,
    * raw (non-Huffman) value — inserts (name, value) into the table. */
  private def litIncr(nameIdx: Int, value: String): Array[Byte] =
    (0x40 | nameIdx).toByte +: (value.length.toByte +: value.getBytes("ISO-8859-1"))

  private def dissectSeq(frames: Array[Byte]*): Seq[Dissect.Dissected] = {
    val tracker = new Dissect.Tracker
    frames.zipWithIndex.map { case (f, i) =>
      val rec = PcapFormat.Record(1 + i, 1000000L * (i + 1), f.length, f.length, f)
      Dissect.dissect(rec, 1, tracker)
    }
  }

  test("indexed refs >= 62 resolve from the sending direction's table") {
    val f1 = ethIpTcp(preface ++ h2Frame(4, 0, 0, Array.emptyByteArray), 1000)
    // first request inserts :path /dyn then :authority dyn.example
    val f2 = ethIpTcp(h2Frame(1, 0x05, 1,
      Array[Byte](0x82.toByte, 0x86.toByte) ++
        litIncr(4, "/dyn") ++ litIncr(1, "dyn.example")), 2000)
    // second request references them: 63 = :path (older), 62 = :authority
    val f3 = ethIpTcp(h2Frame(1, 0x05, 3,
      Array[Byte](0x82.toByte, 0x86.toByte, 0xbf.toByte, 0xbe.toByte)), 3000)
    val ds = dissectSeq(f1, f2, f3)
    assert(ds(0).info === "Magic, SETTINGS[0]")
    assert(ds(1).info === "HEADERS[1]: GET /dyn")
    assert(ds(1).values("http2.headers.authority") === "dyn.example")
    assert(ds(2).info === "HEADERS[3]: GET /dyn")
    assert(ds(2).values("http2.headers.path") === "/dyn")
    assert(ds(2).values("http2.headers.authority") === "dyn.example")
  }

  test("table-size update to zero evicts; later dynamic refs go opaque") {
    val f1 = ethIpTcp(preface ++ h2Frame(4, 0, 0, Array.emptyByteArray), 1000)
    val f2 = ethIpTcp(h2Frame(1, 0x05, 1,
      Array[Byte](0x82.toByte, 0x86.toByte) ++
        litIncr(4, "/dyn") ++ litIncr(1, "dyn.example")), 2000)
    // size update to 0 (0x20) flushes the table; 62 now points past it
    val f3 = ethIpTcp(h2Frame(1, 0x05, 3,
      Array[Byte](0x82.toByte, 0x20.toByte, 0xbe.toByte)), 3000)
    val ds = dissectSeq(f1, f2, f3)
    // the opaque pair's NAME is "<dynamic>": no authority field emitted
    assert(ds(2).values.get("http2.headers.authority").isEmpty)
    assert(ds(2).info === "HEADERS[3]") // no :path — no request info line
  }

  test("each direction owns its own encoder table") {
    val f1 = ethIpTcp(preface ++ h2Frame(4, 0, 0, Array.emptyByteArray), 1000)
    val f2 = ethIpTcp(h2Frame(1, 0x05, 1,
      Array[Byte](0x82.toByte, 0x86.toByte) ++
        litIncr(4, "/dyn") ++ litIncr(1, "dyn.example")), 2000)
    // the SERVER references 62 without ever inserting: the client's
    // entries must not leak into the server's decoder context
    val f3 = ethIpTcp(h2Frame(1, 0x04, 1,
      Array[Byte](0x88.toByte, 0xbe.toByte)), 5000, rev = true)
    val ds = dissectSeq(f1, f2, f3)
    assert(ds(2).info === "HEADERS[1]: 200 OK")
    assert(ds(2).values.get("http2.headers.authority").forall(_ == "<dynamic>"))
  }
}
