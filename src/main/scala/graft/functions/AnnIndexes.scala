package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.Tables

/** Per-session cache of fitted ANN index state (IVF centroids, PQ
  * codebooks) keyed by (session, data dir, params).
  *
  * Two reasons it exists:
  *  - **Oracle exactness**: the DuckDB oracle SQL for the k-means family
  *    embeds the fitted centroids/codebooks as literals
  *    ([[graft.queries.AnnOracles]]). The query plan and the generated
  *    oracle MUST see the *same* fit, so both go through this cache
  *    within a Verify run.
  *  - **The 100 TB shape**: fitting is a one-off batch job
  *    ([[Ivf.persist]] / [[Pq.persist]]); re-fitting k-means inside every
  *    query was only ever a small-scale artifact. Sharing one fit across
  *    the ivf/ivf_batch/pq/ivfpq queries of a run mirrors how the
  *    persisted index is used in production.
  *
  * Per-key `computeIfAbsent` keeps concurrent callers from racing two
  * fits of the same key into existence (they would differ only by
  * reduction order, but the oracle contract wants exactly one) while
  * leaving unrelated keys — and unrelated queries — free to run.
  */
object AnnIndexes {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), (SparkSession, AnyRef)]()

  private def key(spark: SparkSession, rest: String): (Int, String) =
    (System.identityHashCode(spark), rest)

  // the entry carries its session so an identityHashCode reused by a NEW
  // session (old one GC'd) can never serve that session a stale fit whose
  // plans reference the dead one — reference inequality forces a refit
  private def getOrFit[T <: AnyRef](spark: SparkSession, rest: String)(fit: => T): T =
    cache.compute(key(spark, rest), (_, old) =>
      if (old != null && (old._1 eq spark)) old else (spark, fit))._2.asInstanceOf[T]

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** The IVF index every sim_ann_ivf* query (and its oracle) shares. */
  def ivf(spark: SparkSession, dir: String, k: Int = 16): Ivf.Index =
    getOrFit(spark, s"ivf:$dir:$k") {
      Ivf.build(spark, embeddings(spark, dir), k = k)
    }

  /** The PQ codebook every sim_ann_pq/ivfpq query (and its oracle) shares. */
  def pq(spark: SparkSession, dir: String, m: Int = 8, k: Int = 16): Pq.Codebook =
    getOrFit(spark, s"pq:$dir:$m:$k") {
      Pq.fit(spark, embeddings(spark, dir), m = m, k = k)
    }
}
