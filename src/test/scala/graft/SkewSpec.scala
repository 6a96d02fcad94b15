package graft

import org.apache.spark.sql.functions._

/** Skew-handling proof points for the 100 TB design: AQE's runtime
  * skew-join split and the deterministic salted aggregate (the two
  * mechanisms the engine relies on when a key carries a disproportionate
  * share of rows).
  */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one hot key carrying ~all rows vs a uniform dimension
    val facts = spark.range(200000)
      .select(when($"id" % 100 =!= 0, lit(1L)).otherwise($"id" % 50).as("k"),
        $"id".as("payload"))
    val dim = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    // remember Option-al original values: a key that was UNSET must be
    // unset again on restore (SparkSpec.session is shared across suites;
    // leaving e.g. adaptive.autoBroadcastJoinThreshold=-1 behind would
    // order-depend later suites' plan assertions)
    val prev: Map[String, Option[String]] = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // force a sort-merge join (no broadcast) so skew handling is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // lower the skew thresholds so the toy dataset triggers the rule
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")

      val joined = facts.join(dim, "k")
      // execute THIS DataFrame's queryExecution so the adaptive plan
      // finalizes (count() would plan a separate execution)
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n${plan.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted aggregate equals direct aggregate on a skewed key distribution") {
    import spark.implicits._
    val skewed = spark.range(100000)
      .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 100).as("key"),
        ($"id" % 1000).cast("double").as("value"))
    val direct = skewed.groupBy($"key")
      .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = graft.functions.Skew.saltedSumCount(skewed, $"key", $"value", salts = 16)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted === direct)
  }
}
