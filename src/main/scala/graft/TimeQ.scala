package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: isolated per-query timing (cache cleared, 2 runs) for
  * attributing regressions without the bench suite's cross-query noise.
  * Usage: runMain graft.TimeQ <query-name>... [-sf <dir>] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.sliding(2).collectFirst { case Array("-sf", d) => d }
      .getOrElse("/root/testdata/sf0.1")
    val names = args.filter(a => a != "-sf" && a != dir)
    val b = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.split("=", 2))
      .foreach {
        case Array(k, v) => b.config(k, v)
        // warn loudly (ADVICE r12): a malformed entry would otherwise make
        // an experiment silently measure the DEFAULT config
        case other => System.err.println(
          s"[timeq] ignoring malformed SPARK_GRAFT_CONF entry: '${other.mkString("=")}'")
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_GROUP_CAP")
      .foreach(v => spark.conf.set("graft.dedup.group_cap", v))
    // stage-metrics attribution (VERDICT r8 #5): shuffle bytes + spill are
    // load-stable evidence; wall-clock under co-tenancy is not
    val metrics = new StageMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    for (name <- names; q <- SparkEntry.registry.find(_.name == name); i <- 1 to 2) {
      spark.catalog.clearCache()
      spark.sparkContext.setJobGroup(s"$name#$i", name, interruptOnCancel = false)
      val t0 = System.nanoTime()
      q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val m = metrics.byQuery.get(s"$name#$i")
      val mm = m.map(a => f" shufW=${a.shuffleWrite / 1e6}%.1fMB" +
        f" shufR=${a.shuffleRead / 1e6}%.1fMB spill=${a.spill / 1e6}%.1fMB" +
        f" taskTime=${a.taskTimeMs / 1e3}%.1fs").getOrElse("")
      println(f"TIME $name run$i: $dt%.2f s$mm")
    }
    spark.stop()
  }
}
