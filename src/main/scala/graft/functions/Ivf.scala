package graft.functions

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the vector space into cells; a query probes only
  * the `nProbe` nearest cells and runs exact cosine inside them.
  *
  * The Spark-scale story: cell assignment is one `transform` pass,
  * vectors can be written partitioned-by-cell, and a probe touches
  * `nProbe / k` of the data — the IVF counterpart to the LSH bucket path
  * in [[Vectors.lshBucket]]. `nProbe = k` degenerates to exact brute
  * force (used by the spec as the correctness anchor).
  */
object Ivf {

  final case class Index(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Fit the coarse quantizer and tag every row with its cell id. */
  def build(spark: SparkSession, emb: DataFrame, k: Int, seed: Long = 42L): Index = {
    val withVec = emb.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(withVec)
    val assigned = model.transform(withVec)
      .withColumnRenamed("prediction", "cell")
      .drop("features")
    Index(model.clusterCenters.map(_.toArray), assigned)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Top-k by cosine probing the nProbe nearest cells to `query`. */
  def search(
      index: Index,
      query: Array[Float],
      topK: Int,
      nProbe: Int): DataFrame = {
    val q = query.map(_.toDouble)
    val cells = index.centroids.zipWithIndex
      .sortBy { case (c, _) => -cosine(c, q) }
      .take(nProbe).map(_._2)
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val qCol = typedLit(q.map(_.toFloat))
    index.assigned
      .filter($"cell".isInCollection(cells))
      .select($"vec_id", $"label",
        Vectors.cosine($"embedding", qCol).as("cosine"))
      .orderBy($"cosine".desc, $"vec_id")
      .limit(topK)
  }

  /** Batch search: a DataFrame of queries `(query_id, qe)` answered in ONE
    * plan — per-query probe cells come from a broadcast cross join against
    * the (tiny) centroid table, candidates from a broadcast probe-to-cell
    * join against the assigned corpus, per-query top-k from a window. No
    * driver-side loop or collect: wall-clock is one pass over the probed
    * cells regardless of query count. */
  def searchBatch(
      index: Index,
      queries: DataFrame,
      topK: Int,
      nProbe: Int): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid")
    val wq = Window.partitionBy($"query_id").orderBy($"ccos".desc, $"cell")
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("ccos", Vectors.cosine($"qe", $"centroid"))
      .withColumn("prnk", row_number().over(wq))
      .filter($"prnk" <= nProbe)
      .select($"query_id", $"qe", $"cell")
    val wr = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    index.assigned.join(broadcast(probes), Seq("cell"))
      .select($"query_id", $"vec_id", $"label",
        Vectors.cosine($"embedding", $"qe").as("cosine"))
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .filter($"rnk" <= topK)
      .select($"query_id", $"rnk", $"vec_id", $"label", $"cosine")
      .orderBy($"query_id", $"rnk")
  }
}
