package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.pcap.TsharkPartitionReader

/** The tshark backend's line/cell semantics (reference SURVEY §1.2),
  * testable without a tshark binary. */
class TsharkBackendSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("n", LongType), StructField("d", DoubleType),
    StructField("b", BooleanType), StructField("t", TimestampType),
    StructField("s", StringType)))

  test("reference cell semantics: typed parse, empty->NULL, bad->NULL") {
    val row = TsharkPartitionReader.parseLine(
      "42\t3.5\t1\t1448733575.877130\thello", schema, compatStrict = false)
    assert(row.getLong(0) === 42L)
    assert(row.getDouble(1) === 3.5)
    assert(row.getBoolean(2) === true)
    assert(row.getLong(3) === 1448733575877130L)
    assert(row.getUTF8String(4).toString === "hello")

    val nulls = TsharkPartitionReader.parseLine("\t\t\t\t", schema, compatStrict = false)
    (0 until 5).foreach(i => assert(nulls.isNullAt(i), s"col $i"))

    val bad = TsharkPartitionReader.parseLine(
      "abc\txyz\t0\tnope\tok", schema, compatStrict = false)
    assert(bad.isNullAt(0) && bad.isNullAt(1))
    assert(bad.getBoolean(2) === false) // anything non-"1" is false (:214)
    assert(bad.isNullAt(3))
  }

  test("stoll prefix semantics and compat truncation") {
    val row = TsharkPartitionReader.parseLine(
      "123abc\t\t\t1448733575.877130\t", schema, compatStrict = true)
    assert(row.getLong(0) === 123L) // std::stoll prefix parse
    assert(row.getLong(3) === 1448733575000000L) // FromEpochSeconds truncation (:217)
  }

  test("missing trailing fields pad with NULL (fixes reference UB)") {
    val row = TsharkPartitionReader.parseLine("7", schema, compatStrict = false)
    assert(row.getLong(0) === 7L)
    (1 until 5).foreach(i => assert(row.isNullAt(i)))
  }

  test("glossary long tail: smb schema carries real typed columns on both backends") {
    val p = getClass.getResource("/fix.pcap").getPath
    val smbN = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("smb"))
    // schema golden for a newly-glossaried protocol: 4 frame defaults, the
    // smb fields in glossary order, then the info column
    assert(smbN.schema.fieldNames.toSeq === Seq(
      "frame.time_epoch", "frame.number", "frame.len", "frame.protocols",
      "smb.server_component", "smb.cmd", "smb.nt_status", "smb.error_class",
      "smb.flags", "smb.flags2", "smb.tid", "smb.pid", "smb.uid", "smb.mid",
      "smb.path", "smb.file", "_ws.col.info"))
    assert(smbN.schema("smb.cmd").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(smbN.schema("smb.path").dataType ===
      org.apache.spark.sql.types.StringType)
    // bind-time schema is backend-independent (reader spawn is lazy, so the
    // tshark backend binds without a tshark binary)
    val smbT = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("smb"),
      backend = Some("tshark"))
    assert(smbT.schema === smbN.schema)
    // rdp long-tail rows resolve too
    val rdp = graft.pcap.Glossary.schemaFor(Seq("rdp"))
    assert(rdp.fieldNames.contains("rdp.negReq.requestedProtocols"))
  }

  test("glossary r7 tranche: someip schema carries real typed columns on both backends") {
    val p = getClass.getResource("/fix.pcap").getPath
    val n = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("someip"))
    // schema golden for an r7-tranche protocol: 4 frame defaults, the
    // someip fields in glossary order, then the info column
    assert(n.schema.fieldNames.toSeq === Seq(
      "frame.time_epoch", "frame.number", "frame.len", "frame.protocols",
      "someip.serviceid", "someip.methodid", "someip.length",
      "someip.clientid", "someip.sessionid", "someip.messagetype",
      "someip.returncode", "_ws.col.info"))
    assert(n.schema("someip.serviceid").dataType ===
      org.apache.spark.sql.types.LongType)
    val t = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("someip"),
      backend = Some("tshark"))
    assert(t.schema === n.schema)
    // spot-resolve a few more r7 rows across families
    val multi = graft.pcap.Glossary.schemaFor(Seq("mpls", "wlan", "gtpv2", "btatt"))
    assert(multi.fieldNames.contains("mpls.label"))
    assert(multi.fieldNames.contains("wlan.ssid"))
    assert(multi.fieldNames.contains("gtpv2.message_type"))
    assert(multi.fieldNames.contains("btatt.opcode"))
  }

  test("glossary r9 tranche: ipmi schema carries real typed columns on both backends") {
    val p = getClass.getResource("/fix.pcap").getPath
    val n = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("ipmi"))
    assert(n.schema.fieldNames.toSeq === Seq(
      "frame.time_epoch", "frame.number", "frame.len", "frame.protocols",
      "ipmi.netfn", "ipmi.cmd", "ipmi.ccode", "_ws.col.info"))
    assert(n.schema("ipmi.netfn").dataType ===
      org.apache.spark.sql.types.LongType)
    val t = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("ipmi"),
      backend = Some("tshark"))
    assert(t.schema === n.schema)
    // spot-resolve rows across the r9 families
    val multi = graft.pcap.Glossary.schemaFor(
      Seq("dicom", "git", "pcep", "zep", "elasticsearch"))
    assert(multi.fieldNames.contains("dicom.pdu.type"))
    assert(multi.fieldNames.contains("git.length"))
    assert(multi.fieldNames.contains("pcep.msg"))
    assert(multi.fieldNames.contains("zep.channel_id"))
    assert(multi.fieldNames.contains("elasticsearch.action"))
    assert(!multi.fieldNames.contains("collectd.val.value")) // not requested
  }

  test("glossary r10 tranche: bitcoin schema carries real typed columns on both backends") {
    val p = getClass.getResource("/fix.pcap").getPath
    val n = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("bitcoin"))
    assert(n.schema.fieldNames.toSeq === Seq(
      "frame.time_epoch", "frame.number", "frame.len", "frame.protocols",
      "bitcoin.magic", "bitcoin.command", "bitcoin.length", "_ws.col.info"))
    assert(n.schema("bitcoin.magic").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(n.schema("bitcoin.command").dataType ===
      org.apache.spark.sql.types.StringType)
    val t = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("bitcoin"),
      backend = Some("tshark"))
    assert(t.schema === n.schema)
    // spot-resolve rows across the r10 families
    val multi = graft.pcap.Glossary.schemaFor(
      Seq("fcgi", "moldudp64", "nvme-tcp", "cops", "giop"))
    assert(multi.fieldNames.contains("fcgi.id"))
    assert(multi.fieldNames.contains("moldudp64.sequence"))
    assert(multi.fieldNames.contains("nvme-tcp.plen"))
    assert(multi.fieldNames.contains("cops.client_type"))
    assert(multi.fieldNames.contains("giop.len"))
  }

  test("glossary r8 tranche: goose schema carries real typed columns on both backends") {
    val p = getClass.getResource("/fix.pcap").getPath
    val n = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("goose"))
    assert(n.schema.fieldNames.toSeq === Seq(
      "frame.time_epoch", "frame.number", "frame.len", "frame.protocols",
      "goose.gocbRef", "goose.stNum", "goose.sqNum", "goose.timeAllowedtoLive",
      "goose.appid",
      "_ws.col.info"))
    assert(n.schema("goose.gocbRef").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(n.schema("goose.stNum").dataType ===
      org.apache.spark.sql.types.LongType)
    val t = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("goose"),
      backend = Some("tshark"))
    assert(t.schema === n.schema)
    // spot-resolve more r8 rows across families
    val multi = graft.pcap.Glossary.schemaFor(Seq("cotp", "sll", "uds", "bthci_cmd", "sdp"))
    assert(multi.fieldNames.contains("cotp.destref"))
    assert(multi.fieldNames.contains("sll.pkttype"))
    assert(multi.fieldNames.contains("uds.sid"))
    assert(multi.fieldNames.contains("bthci_cmd.opcode"))
    assert(multi.fieldNames.contains("sdp.media"))
  }

  test("glossary tranche 13: deepened core-protocol fields resolve with real types") {
    // r8 deepening tranche: high-traffic protocols gain their most-queried
    // public fields (Wireshark display-filter reference names)
    val multi = graft.pcap.Glossary.schemaFor(
      Seq("dns", "http", "tls", "quic", "smb2", "mqtt", "kerberos", "vlan"))
    for (f <- Seq("dns.flags.opcode", "dns.aaaa", "dns.srv.target",
        "http.request.full_uri", "http.cookie", "http.set_cookie",
        "tls.handshake.session_id", "tls.alert_message.desc",
        "quic.packet_number", "smb2.sesid", "smb2.filename",
        "mqtt.qos", "kerberos.realm", "vlan.etype"))
      assert(multi.fieldNames.contains(f), s"tranche-13 field $f missing")
    assert(multi("dns.flags.authoritative").dataType ===
      org.apache.spark.sql.types.BooleanType)
    assert(multi("dns.aaaa").dataType ===
      org.apache.spark.sql.types.StringType) // FT_IPv6 → VARCHAR
    assert(multi("quic.packet_number").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(!multi.fieldNames.contains("ntp.refid")) // ntp not requested
  }

  test("glossary↔golden guard: pinned per-protocol field counts from the TSV") {
    // Every protocol with a hand-written schema golden in this suite is
    // pinned here to its CURRENT field count in glossary_fields.tsv. A
    // glossary tranche that grows one of these protocols fails THIS
    // assertion by protocol name, forcing the matching golden list to be
    // updated in the same commit (the r7 someip golden went stale exactly
    // this way: tier 28 added 4 fields, the 8-column golden kept passing
    // compile but failed at runtime a round later).
    val pinned = Map(
      "udp" -> 27, "smb" -> 12, "someip" -> 7, "goose" -> 5,
      "bitcoin" -> 3, "ipmi" -> 3)
    val counts = graft.pcap.Glossary.fields
      .groupBy(_.protocol_filter_name).map { case (p, fs) => p -> fs.size }
    pinned.foreach { case (p, n) =>
      assert(counts.getOrElse(p, 0) === n,
        s"glossary field count for '$p' drifted from its pin — update the " +
          s"'$p' schema golden in this suite AND this pin in the same commit")
    }
    // Structural invariant for EVERY glossaried protocol: the bound schema
    // is exactly 4 frame defaults + that protocol's TSV fields (glossary
    // order, deduped) + _ws.col.info — so goldens and schemaFor can never
    // disagree on count, only on a stale hand-written list (caught above).
    val defaults = graft.pcap.Glossary.defaultFrameFields.toSet +
      graft.pcap.Glossary.infoField
    counts.keys.foreach { p =>
      val tsvNames = graft.pcap.Glossary.fields
        .filter(_.protocol_filter_name == p).map(_.filter_name)
        .distinct.filterNot(defaults.contains)
      val bound = graft.pcap.Glossary.schemaFor(Seq(p)).fieldNames.toSeq
      assert(bound.size === 4 + tsvNames.size + 1,
        s"schemaFor('$p') column count diverged from the TSV")
      assert(bound.slice(4, bound.size - 1) === tsvNames,
        s"schemaFor('$p') field order diverged from TSV glossary order")
    }
  }

  test("unknown protocol falls back to the 5 defaults identically on both backends") {
    val p = getClass.getResource("/fix.pcap").getPath
    val defaults = Seq("frame.time_epoch", "frame.number", "frame.len",
      "frame.protocols", "_ws.col.info")
    val n = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("nosuchproto"))
    val t = graft.api.Wireduck.readPcap(spark, p, protocols = Seq("nosuchproto"),
      backend = Some("tshark"))
    assert(n.schema.fieldNames.toSeq === defaults)
    assert(t.schema === n.schema)
    // and the native backend still reads rows under the fallback schema
    assert(n.count() === 485)
  }

  test("backend=tshark without tshark fails with an explanatory error") {
    val e = intercept[IllegalArgumentException] {
      new TsharkPartitionReader("/tmp/x.pcap", Long.MaxValue, schema, false, None)
    }
    assert(e.getMessage.contains("tshark"))
  }
}
