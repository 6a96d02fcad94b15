package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named capability of the engine, with an optional DuckDB oracle.
  *
  * `fn` builds the Spark plan against the tables in `sfDir`; `oracle` is
  * ANSI SQL producing the identical result (same column names, same row
  * order, bit-identical values) when run by DuckDB over the same parquet
  * files. `oracleGen` covers queries whose oracle depends on engine-side
  * fitted state (the k-means ANN family): it is invoked at Verify-dump
  * time with the same (session, sfDir) the queries ran under, so it can
  * embed the run's fitted centroids/codebooks as SQL literals
  * ([[graft.queries.AnnOracles]]). Queries with neither (pcap scans,
  * approximate sketches, binary/multimodal ops) get the driver's weaker
  * rows-only check and are instead golden-tested in ScalaTest.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    oracleGen: Option[(SparkSession, String) => String] = None)

object GraftQuery {
  /** Deterministic-exactness rule used across the inventory: money/measure
    * doubles are cast to DECIMAL(18,2) before SUM in BOTH engines, so the
    * aggregate is exact (no float-order nondeterminism) and the final
    * cast-to-double is bit-identical. See SURVEY §7.4 (sum widening). */
  val determinismNote = "decimal-exact aggregates, total ORDER BY everywhere"
}
