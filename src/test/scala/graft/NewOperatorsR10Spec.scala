package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** Property specs for the round-10 operators. Oracle hash-matching is the
  * driver's gate; these pin operator INVARIANTS a hash can't express. */
class NewOperatorsR10Spec extends SparkSpec {

  test("sim_mmr_sharded: 4 queries x 5 diverse picks; rank 1 is each query's argmax") {
    import spark.implicits._
    val rows = SimilarityQueries.simMmrSharded.fn(spark, sfDir).collect()
    assert(rows.length === 20) // 4 queries x 5 MMR steps
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L))
    byQ.foreach { case (qid, rs) =>
      // ranks are exactly 1..5 and picks are distinct corpus vectors
      assert(rs.map(_.getAs[Long]("mmr_rank")).sorted.sameElements(1L to 5L))
      val picks = rs.map(_.getAs[Long]("vec_id"))
      assert(picks.distinct.length === 5, s"query $qid repeated a pick")
      assert(picks.forall(_ >= 4L), s"query $qid picked a held-out query vector")
      // the greedy chain starts at the query's cosine argmax: recompute
      // top-1 brute-force, independently of the sharded candidate path
      val q = graft.api.Tables.load(spark, sfDir, "embeddings")
        .filter($"vec_id" === qid).select($"embedding").head.getSeq[Float](0).toArray
      val top = graft.api.Tables.load(spark, sfDir, "embeddings")
        .filter($"vec_id" >= 4L)
        .as[(Long, Array[Float], String)]
        .map { case (id, e, _) =>
          var num = 0.0; var nrm = 0.0; var qn = 0.0
          var i = 0
          while (i < e.length) {
            num += e(i).toDouble * q(i).toDouble
            nrm += e(i).toDouble * e(i).toDouble
            qn += q(i).toDouble * q(i).toDouble
            i += 1
          }
          (id, num / (math.sqrt(nrm) * math.sqrt(qn)))
        }.collect().maxBy { case (id, c) => (c, -id) }
      val r1 = rs.find(_.getAs[Long]("mmr_rank") == 1L).get
      assert(r1.getAs[Long]("vec_id") === top._1,
        s"query $qid rank-1 must be the cosine argmax")
      // MMR trades relevance for diversity AFTER step 1: every later
      // pick's query-cosine is bounded by the argmax's
      rs.filter(_.getAs[Long]("mmr_rank") > 1L).foreach(r =>
        assert(r.getAs[Double]("qcos") <= r1.getAs[Double]("qcos") + 1e-12))
    }
  }

  test("mm_phash_topk: 3 queries x 5 picks, distances non-decreasing per query") {
    val rows = graft.queries.MultimodalQueries.mmPhashTopk.fn(spark, sfDir).collect()
    assert(rows.length === 15)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size === 3)
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("mm_rank"))
      assert(sorted.map(_.getAs[Long]("mm_rank")).sameElements(1L to 5L))
      // ranking invariant: distance never decreases with rank
      val dists = sorted.map(_.getAs[Long]("dist"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
        s"query $qid distances not monotone: ${dists.mkString(",")}")
      // a query never returns itself
      assert(rs.forall(_.getAs[Long]("cand_id") != qid))
      // Hamming distance over two 32-bit halves is bounded by 64
      assert(dists.forall(d => d >= 0L && d <= 64L))
    }
  }
}
