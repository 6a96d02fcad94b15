package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column helpers built from codegen'd builtin higher-order
  * functions (`zip_with` / `aggregate` / `transform`) — no UDFs in the hot
  * path, so whole-stage codegen stays intact (SURVEY build prompt:
  * "Functions, not UDFs").
  */
object Vectors {

  /** Sequential left fold — deterministic summation order. */
  private def arraySum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column =
    sqrt(arraySum(transform(a, x => x.cast("double") * x.cast("double"))))

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
      val proj = arraySum(zip_with(emb, typedLit(planeSigns(j, dim)),
        (x, s) => x.cast("double") * s))
      when(proj > 0, lit(1 << j)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
