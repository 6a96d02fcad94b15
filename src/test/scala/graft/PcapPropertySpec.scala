package graft

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.pcap.PcapFormat

/** ScalaCheck round-trip properties for the container parser (SURVEY §5
  * test plan: "scalacheck property tests for the pcap record parser"). */
class PcapPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(result.passed, result.status.toString)
  }

  private case class GenRecord(sec: Long, frac: Long, payload: Array[Byte])

  private val recordGen: Gen[GenRecord] = for {
    sec <- Gen.chooseNum(0L, 4000000000L)
    frac <- Gen.chooseNum(0L, 999999L)
    n <- Gen.chooseNum(0, 512)
    bytes <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield GenRecord(sec, frac, bytes)

  private def serialize(le: Boolean, nanos: Boolean, recs: Seq[GenRecord]): Array[Byte] = {
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val head = ByteBuffer.allocate(24).order(order)
    head.putInt(if (nanos) 0xa1b23c4d else 0xa1b2c3d4)
    head.putShort(2.toShort).putShort(4.toShort)
    head.putInt(0).putInt(0).putInt(262144).putInt(1)
    val body = recs.flatMap { r =>
      val b = ByteBuffer.allocate(16 + r.payload.length).order(order)
      val frac = if (nanos) r.frac * 1000 else r.frac
      b.putInt(r.sec.toInt).putInt(frac.toInt)
        .putInt(r.payload.length).putInt(r.payload.length)
      b.put(r.payload)
      b.array().toSeq
    }
    head.array() ++ body
  }

  test("round-trip: any record list survives serialize→parse in all 4 magics") {
    check(Prop.forAll(Gen.listOfN(8, recordGen), Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (recs: List[GenRecord], le: Boolean, nanos: Boolean) =>
        val parsed = PcapFormat.records(
          new ByteArrayInputStream(serialize(le, nanos, recs))).toList
        parsed.length == recs.length &&
          parsed.zip(recs).forall { case (p, g) =>
            p.tsMicros == g.sec * 1000000L + g.frac &&
              p.origLen == g.payload.length &&
              p.data.sameElements(g.payload) &&
              p.number == parsed.indexOf(p) + 1
          }
    })
  }

  test("truncation at any byte boundary never throws and never fabricates records") {
    check(Prop.forAll(Gen.listOfN(4, recordGen), Gen.chooseNum(24, 2000)) {
      (recs: List[GenRecord], cut: Int) =>
        val bytes = serialize(le = true, nanos = false, recs)
        val truncated = bytes.take(math.min(cut, bytes.length))
        val parsed = PcapFormat.records(new ByteArrayInputStream(truncated)).toList
        parsed.length <= recs.length &&
          parsed.zip(recs).forall { case (p, g) => p.data.sameElements(g.payload) }
    })
  }

  test("dissector fuzz: random TCP payloads to app-layer ports never throw") {
    import graft.pcap.Dissect
    // ports that trigger the HTTP/TLS/DNS/FIX/FTP/SSH/SIP/SMB2/BGP content sniffers
    val portGen = Gen.oneOf(80, 443, 53, 5001, 40000, 21, 22, 445, 5060, 179,
      1883, 1433, 5672, 5432, 3306, 6379, 139, 3389, 853, 3868, 554, 1080, 135,
      2049, 389, 9092, 9042, 11211, 50051, 102, 20000, 2404, 44818, 4840,
      6667, 5222, 2775, 1723, 49, 8333, 9000, 4369, 3260, 5084, 27017, 873, 4730,
      6653, 5900, 61613, 564, 13400, 4222, 11112, 104, 8583, // openflow/vnc/stomp/9p/doip/nats/dicom/iso8583
      9418, 11210, 1521, 5050, 3632, 6000, // git/couchbase/tns/ymsg/distcc/x11
      61616, 2855, 2600, 10000, 8020, 639) // openwire/msrp/zebra/hpfeeds/hdfs/msdp
    val payloadGen = for {
      n <- Gen.chooseNum(0, 400)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
      // bias some payloads toward protocol-looking prefixes to reach deep paths
      prefix <- Gen.oneOf("", "GET ", "HTTP/1.1 ", "8=FIX.4.2", "",
        "SSH-2.0-x\r\n", "220 ok\r\n", "USER a\r\n",
        "INVITE sip:a SIP/2.0\r\n", "SIP/2.0 200 OK\r\n")
    } yield prefix.getBytes("ISO-8859-1") ++ bytes
    def tcpFrame(sp: Int, dp: Int, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(14 + 20 + 20 + payload.length)
      b.put(new Array[Byte](12)).putShort(0x0800.toShort)
      b.put(0x45.toByte).put(0.toByte).putShort((40 + payload.length).toShort)
        .putShort(1.toShort).putShort(0.toShort)
        .put(64.toByte).put(6.toByte).putShort(0.toShort)
        .put(Array[Byte](10, 0, 0, 1)).put(Array[Byte](10, 0, 0, 2))
      b.putShort(sp.toShort).putShort(dp.toShort).putInt(1).putInt(0)
        .put((5 << 4).toByte).put(0x18.toByte)
        .putShort(8192.toShort).putShort(0.toShort).putShort(0.toShort)
      b.put(payload)
      b.array()
    }
    check(Prop.forAll(portGen, payloadGen, Gen.oneOf(true, false)) {
      (dp: Int, payload: Array[Byte], deseg: Boolean) =>
        val t = new Dissect.Tracker(desegment = deseg)
        val f = tcpFrame(49000, dp, payload)
        val rec = PcapFormat.Record(1, 1000000L, f.length, f.length, f)
        val d = Dissect.dissect(rec, 1, t)
        d.values.contains("tcp.srcport") && d.protocols.startsWith("eth")
    })
  }

  test("dissector fuzz: arbitrary frame bytes never throw") {
    import graft.pcap.Dissect
    val frameGen = for {
      n <- Gen.chooseNum(0, 200)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield bytes
    check(Prop.forAll(frameGen, Gen.oneOf(1, 101, 9999, 0, 105, 113, 127, 276)) {
      (frame: Array[Byte], lt: Int) =>
        val rec = PcapFormat.Record(1, 1000000L, frame.length, frame.length, frame)
        Dissect.dissect(rec, lt, new Dissect.Tracker(desegment = true)) != null
    })
  }


  test("dissector fuzz: random UDP payloads to app-layer ports never throw") {
    import graft.pcap.Dissect
    // ports driving the DNS/mDNS/NTP/QUIC/DHCP/SIP/Kerberos/SNMP/NFS/
    // RADIUS/VXLAN/SSDP/syslog/TFTP/LLMNR/NBNS sniffers
    val portGen = Gen.oneOf(53, 5353, 123, 443, 67, 5060, 88, 161, 2049, 1900,
      1812, 4789, 1900, 514, 69, 5355, 137, 3478, 547, 51820, 2152, 500,
      1701, 5683, 2055, 6343, 3784, 520, 1985,
      6081, 3956, 5351, 138, 6881, 1194, 319, // geneve/gvcp/nat-pmp/nbdgm/dht/openvpn/ptp
      47808, 2427, 2727, 30490, 2123, 8805, 13400, 37008, // bacnet/mgcp/someip/gtpv2/pfcp/doip/tzsp
      3544, 521, 698, 6696, 2048, 427, 2944, // teredo/ripng/olsr/babel/wccp/slp/megaco
      9995, 4739, 7400, 30001, 9300, 3130, // cflow-v9/ipfix/rtps/moldudp64/srt/icp
      1719, 1718, 23000) // h225 ras (incl. the r11 DRQ walk) / gb-over-ip ns
    val payloadGen = for {
      n <- Gen.chooseNum(0, 300)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
      prefix <- Gen.oneOf("", "INVITE sip:a SIP/2.0\r\n", "SIP/2.0 200 OK\r\n", "0",
        "d1:", "d1:ad2:id20:", "B", "")
    } yield prefix.getBytes("ISO-8859-1") ++ bytes
    def udpFrame(sp: Int, dp: Int, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(14 + 20 + 8 + payload.length)
      b.put(new Array[Byte](12)).putShort(0x0800.toShort)
      b.put(0x45.toByte).put(0.toByte).putShort((28 + payload.length).toShort)
        .putShort(1.toShort).putShort(0.toShort)
        .put(64.toByte).put(17.toByte).putShort(0.toShort)
        .put(Array[Byte](10, 0, 0, 1)).put(Array[Byte](10, 0, 0, 2))
      b.putShort(sp.toShort).putShort(dp.toShort)
        .putShort((8 + payload.length).toShort).putShort(0.toShort)
      b.put(payload)
      b.array()
    }
    check(Prop.forAll(portGen, payloadGen, Gen.oneOf(true, false)) {
      (dp: Int, payload: Array[Byte], deseg: Boolean) =>
        val t = new Dissect.Tracker(desegment = deseg)
        val f = udpFrame(49000, dp, payload)
        val rec = PcapFormat.Record(1, 1000000L, f.length, f.length, f)
        val d = Dissect.dissect(rec, 1, t)
        d.values.contains("udp.srcport") && d.protocols.startsWith("eth")
    })
  }

  test("dissector fuzz: random IP protocol numbers with random payloads never throw") {
    import graft.pcap.Dissect
    // exercises the non-TCP/UDP IP-protocol chains: ICMP/IGMP/GRE(+inner
    // ethertypes incl. NHRP 0x2001)/ESP/AH/RSVP/EtherIP/PIM/OSPF/EIGRP/
    // SCTP/VRRP/L2TP-over-IP and the unknown-proto fallback
    val protoGen = Gen.oneOf(1, 2, 46, 47, 50, 51, 88, 89, 97, 103, 112, 132,
      6, 17, 58, 255, 0)
    val payloadGen = for {
      n <- Gen.chooseNum(0, 120)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
      // bias toward valid-looking GRE+NHRP / RSVP / PIM prefixes
      prefix <- Gen.oneOf(Array.emptyByteArray,
        Array[Byte](0, 0, 0x20, 0x01), // GRE proto 0x2001 (NHRP)
        Array[Byte](0x10, 1), // RSVP v1 PATH
        Array[Byte](0x20, 0)) // PIMv2 hello
    } yield prefix ++ bytes
    def ipFrame(proto: Int, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(14 + 20 + payload.length)
      b.put(new Array[Byte](12)).putShort(0x0800.toShort)
      b.put(0x45.toByte).put(0.toByte).putShort((20 + payload.length).toShort)
        .putShort(1.toShort).putShort(0.toShort)
        .put(64.toByte).put(proto.toByte).putShort(0.toShort)
        .put(Array[Byte](10, 0, 0, 1)).put(Array[Byte](10, 0, 0, 2))
      b.put(payload)
      b.array()
    }
    check(Prop.forAll(protoGen, payloadGen) { (proto: Int, payload: Array[Byte]) =>
      val f = ipFrame(proto, payload)
      val rec = PcapFormat.Record(1, 1000000L, f.length, f.length, f)
      val d = Dissect.dissect(rec, 1, new Dissect.Tracker(desegment = true))
      d != null && d.protocols.startsWith("eth")
    })
  }
}
