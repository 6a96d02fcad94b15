package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient two-phase aggregation (SURVEY build prompt: "skewed
  * keys → salting or AQE skew-join").
  *
  * A hot grouping key concentrates its rows in one reduce partition; the
  * salted form splits every key across `salts` sub-keys, partially
  * aggregates (map-side combine still applies within each salt), then
  * finalizes over the tiny per-key×salt intermediate. Results are
  * identical to a direct groupBy for any algebraic aggregate — checked
  * against the plain-SQL oracle.
  */
object Skew {

  /** sum/count per key, shuffled as (key, salt) first. The salt is
    * derived deterministically from row content (no rand(): keeps retries
    * and speculative tasks consistent). */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      salts: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(hash(value, key), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(
        sum(value.cast("decimal(18,2)")).as("_psum"),
        count(lit(1)).as("_pcount"))
    salted
      .groupBy(col("key"))
      .agg(
        sum(col("_psum")).cast("double").as("sum_value"),
        sum(col("_pcount")).as("n"))
  }
}
