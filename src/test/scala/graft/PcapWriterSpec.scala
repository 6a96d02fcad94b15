package graft

import org.apache.spark.sql.functions._

import graft.api.Wireduck

/** Capture-rewrite round trips: scan → (filter) → writePcap → rescan.
  * The re-read must reproduce the original dissection exactly — frame
  * bytes and microsecond timestamps survive the rewrite. */
class PcapWriterSpec extends SparkSpec {

  private val fixPcap = getClass.getResource("/fix.pcap").getPath

  test("full rewrite: rescan reproduces count, bytes, and flagship aggregate") {
    val out = java.nio.file.Files.createTempDirectory("pcapw").toString
    val raw = Wireduck.readPcap(spark, fixPcap, protocols = Seq("frame"))
    Wireduck.writePcap(raw, out)

    val orig = Wireduck.readPcap(spark, fixPcap, protocols = Seq("ip", "tcp"))
      .groupBy(col("`tcp.srcport`"), col("`tcp.dstport`"))
      .agg(count(lit(1)).as("n"), sum(col("`tcp.len`")).as("b"))
      .orderBy(desc("n"), col("`tcp.srcport`"))
      .collect().map(_.toSeq)
    val rewritten = Wireduck.readPcap(spark, out + "/*.pcap", protocols = Seq("ip", "tcp"))
      .groupBy(col("`tcp.srcport`"), col("`tcp.dstport`"))
      .agg(count(lit(1)).as("n"), sum(col("`tcp.len`")).as("b"))
      .orderBy(desc("n"), col("`tcp.srcport`"))
      .collect().map(_.toSeq)
    assert(rewritten.toSeq === orig.toSeq)

    // microsecond timestamps survive exactly
    val ts0 = Wireduck.readPcap(spark, fixPcap)
      .agg(min(col("`frame.time_epoch`")), max(col("`frame.time_epoch`"))).collect()(0)
    val ts1 = Wireduck.readPcap(spark, out + "/*.pcap")
      .agg(min(col("`frame.time_epoch`")), max(col("`frame.time_epoch`"))).collect()(0)
    assert(ts1 === ts0)
  }

  test("filtered rewrite: only matching packets land in the new capture") {
    val out = java.nio.file.Files.createTempDirectory("pcapwf").toString
    // keep only data-bearing segments (reference cfilter semantics)
    val raw = Wireduck.readPcap(spark, fixPcap,
      protocols = Seq("frame", "tcp"), cfilter = Some("tcp.len > 0"))
      .select(col("`frame.time_epoch`"), col("`frame.raw`"))
    Wireduck.writePcap(raw, out)
    val n = Wireduck.readPcap(spark, out + "/*.pcap").count()
    assert(n === 430L) // pinned by the cfilter golden on the original
  }

  test("frame.raw is absent from default schemas and gated by Wanted") {
    val df = Wireduck.readPcap(spark, fixPcap)
    assert(!df.columns.contains("frame.raw"))
    val withRaw = Wireduck.readPcap(spark, fixPcap, protocols = Seq("frame"))
    assert(withRaw.columns.contains("frame.raw"))
    val r = withRaw.select(col("`frame.raw`")).limit(1).collect()(0).getString(0)
    assert(r.matches("([0-9a-f]{2}:)+[0-9a-f]{2}"))
  }
}
