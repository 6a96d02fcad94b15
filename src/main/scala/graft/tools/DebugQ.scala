package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch main: print a query's executed plan + row count at a dir. */
object DebugQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_GROUP_CAP")
      .foreach(v => spark.conf.set("graft.dedup.group_cap", v))
    val q = graft.SparkEntry.registry.find(_.name == name).get
    val df = q.fn(spark, dir)
    val t0 = System.nanoTime()
    println("ROWS=" + df.count())
    println(f"COUNT_SEC=${(System.nanoTime()-t0)/1e9}%.2f")
    df.explain("formatted")
    spark.stop()
  }
}
