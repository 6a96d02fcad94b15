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
}
