package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): dump `.explain("formatted")` for the
  * named queries to <outDir>/<name><suffix>.txt — the before/after plan
  * evidence the round deliverables require (plans/rN/). Unlike ProfileQ
  * this does not execute the query, only plans it (artifact tables are
  * still built on first touch, as in the bench).
  * Usage: runMain graft.PlanDump <query>... [-sf <dir>] [-out <dir>] [-suffix <s>]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val dir = opt("-sf").getOrElse("/root/testdata/sf0.1")
    val out = opt("-out").getOrElse("target/plans")
    val suffix = opt("-suffix").getOrElse("")
    val flagVals = Set(dir, out, suffix)
    val flags = Set("-sf", "-out", "-suffix")
    val names = args.indices
      .filter(i => !flags(args(i)) && !(i > 0 && flags(args(i - 1))))
      .map(args(_))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(outDir)
    for (name <- names) SparkEntry.registry.find(_.name == name) match {
      case Some(q) =>
        try {
          val df = q.fn(spark, dir)
          java.nio.file.Files.writeString(outDir.resolve(s"$name$suffix.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          println(s"[plandump] wrote $out/$name$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      case None => System.err.println(s"[plandump] unknown query: $name")
    }
    spark.stop()
  }
}
