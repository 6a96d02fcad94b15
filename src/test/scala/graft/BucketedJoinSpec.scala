package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both fact tables bucketed+sorted on
  * the join key join with NO shuffle exchange — the layout strategy that
  * turns the repeated lineitem⋈orders shuffle into a local merge at
  * 100 TB (SURVEY build prompt: "bucketing for co-located joins"). */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed+sorted tables sort-merge join without shuffle exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.api.Tables.load(spark, sfDir, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li").mode("overwrite").saveAsTable("li_bucketed")
      graft.api.Tables.load(spark, sfDir, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord").mode("overwrite").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      joined.collect() // execute so AQE finalizes the plan
      val full = joined.queryExecution.executedPlan.toString()
      // AQE repeats the tree under "== Initial Plan =="; judge the final one
      val plan = full.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      // the join itself must not shuffle either side; only the groupBy
      // above it may exchange
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")

      // same answer as the unbucketed join
      val expected = graft.api.Tables.load(spark, sfDir, "lineitem")
        .join(graft.api.Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val actual = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(actual === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
