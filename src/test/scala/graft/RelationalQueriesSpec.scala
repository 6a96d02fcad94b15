package graft

import graft.queries.RelationalQueries

/** Smoke + invariant tests for the relational inventory on sf0.001.
  * Exact value matching is done against the DuckDB oracle by the driver
  * (and by tools/compare_oracle.py in the dev loop); here we pin plan
  * health and hand-computed invariants.
  */
class RelationalQueriesSpec extends SparkSpec {

  test("every registered query runs and declares aligned oracle columns") {
    RelationalQueries.all.foreach { q =>
      val df = q.fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, s"${q.name} failed to execute")
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
    }
  }

  test("q01 aggregates match a hand computation") {
    import org.apache.spark.sql.functions._
    val rows = RelationalQueries.q01AggSum.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val li = graft.api.Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total === li.count())
  }

  test("q12 window rank never exceeds 3 per customer") {
    val df = RelationalQueries.q12WindowRank.fn(spark, sfDir)
    assert(df.groupBy("o_custkey").count().filter("count > 3").count() === 0)
  }

  test("q16 top-k is ordered descending") {
    val prices = RelationalQueries.q16SortLimit.fn(spark, sfDir)
      .collect().map(_.getAs[Double]("l_extendedprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
    assert(prices.length === 15)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("q34 HLL sketch is within its 2% epsilon at this scale") {
    RelationalQueries.q34ApproxDistinct.fn(spark, sfDir).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.1, s"approx=$approx exact=$exact")
    }
  }

  test("q39b approx percentiles track the exact q39 values") {
    val exact = RelationalQueries.q39Percentiles.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    RelationalQueries.q39bApproxPercentiles.fn(spark, sfDir).collect().foreach { r =>
      val (p50, p95) = exact(r.getAs[String]("l_returnflag"))
      // accuracy=10000 → rank error ≤ 1/10000; at sf0.001 the sketch is
      // exact up to value granularity, so a loose 1% value bound is safe
      assert(math.abs(r.getAs[Double]("p50") - p50) / p50 < 0.01)
      assert(math.abs(r.getAs[Double]("p95") - p95) / p95 < 0.01)
    }
  }

  test("hamming_distance expression: eval + codegen agree with bitCount") {
    import spark.implicits._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_distance",
      exprs => graft.functions.HammingDistance(exprs.head, exprs(1)),
      "built-in")
    val rows = Seq((0L, 0L), (1L, 0L), (0xffL, 0x0fL), (Long.MaxValue, 0L))
      .toDF("a", "b")
      .selectExpr("hamming_distance(a, b) AS d")
      .collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(0L, 1L, 4L, 63L))
  }

  test("Wireduck.setup registers the vector functions for SQL users") {
    graft.api.Wireduck.setup(spark)
    val d = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d," +
        " hamming_distance(255L, 15L) AS h," +
        " pq_adc_score(array(1, 0), array(array(0.5D, 1.5D), array(2.5D))) AS a")
      .collect()(0)
    assert(d.getDouble(0) === 11.0)
    assert(d.getLong(1) === 4L)
    assert(d.getDouble(2) === 4.0) // lut[0][1] + lut[1][0]
  }
}
