package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column helpers on the native codegen'd
  * [[VectorDot]] expression (a fused loop inside whole-stage codegen; the
  * earlier `zip_with`/`aggregate` higher-order-function formulation
  * allocated an array per row and interpreted a lambda per element).
  * Summation order is unchanged — index-order left fold — so every
  * oracle stays bit-identical.
  */
object Vectors {

  /** Register `vector_dot` in the active session's function registry
    * (idempotent; needed because a Column can't wrap a custom Expression
    * directly — `call_function` resolves it by name at analysis). */
  private def ensureRegistered(): Unit =
    org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "vector_dot",
        exprs => VectorDot(exprs.head, exprs(1)),
        "built-in")

  def dot(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("vector_dot", a, b)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random ±1 hyperplane component for plane `j`,
    * dimension `i` — md5-derived at PLAN time and embedded as an array
    * literal, so executors do one multiply per element instead of one md5
    * per element per row. */
  private[graft] def planeSigns(j: Int, dim: Int): Array[Double] = {
    val mdAlg = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).toArray.map { i =>
      val hex = mdAlg.digest(s"$j:$i".getBytes("UTF-8"))
      if (((hex(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
    }
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id: one bit per
    * hyperplane = sign of the projection. nPlanes ≤ 16 keeps bucket ids in
    * an int. Buckets co-locate similar vectors so candidate generation is a
    * bucket-equi-join (shuffle on bucket id) instead of a cross join. */
  def lshBucket(emb: Column, nPlanes: Int, dim: Int = 64): Column = {
    val bits = (0 until nPlanes).map { j =>
      val proj = dot(emb, typedLit(planeSigns(j, dim)))
      when(proj > 0, lit(1 << j)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
