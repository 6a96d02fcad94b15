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
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; q <- SparkEntry.registry.find(_.name == name); i <- 1 to 2) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIME $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
