package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump physical plans for scale review (pushdown, broadcast,
  * codegen, top-k). Not part of the driver contract. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q05_join_topk", "q16_sort_limit", "q01_agg_sum")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString().take(4000))
    }
    spark.stop()
  }
}
