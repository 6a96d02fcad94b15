package graft

import org.apache.spark.sql.functions._

import graft.queries.{GraphQueries, MultimodalQueries, SimilarityQueries, TextQueries}

/** Property specs for the round-9 operators. Oracle hash-matching is the
  * driver's gate; these pin operator INVARIANTS a hash can't express
  * (component census consistency, Lloyd argmin optimality). */
class NewOperatorsR9Spec extends SparkSpec {

  test("gr_wcc: components partition the node set; census columns consistent") {
    import spark.implicits._
    val rows = GraphQueries.grWcc.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per-component split sums to the component size
    rows.foreach { r =>
      assert(r.getAs[Long]("n_parts") + r.getAs[Long]("n_suppliers")
        === r.getAs[Long]("n_nodes"))
      assert(r.getAs[Long]("n_suppliers") >= 1L,
        "a component of the bipartite graph must touch a supplier")
    }
    // component labels are distinct and the census covers every node of
    // the thresholded projection exactly once
    val comps = rows.map(_.getAs[Long]("component"))
    assert(comps.distinct.length === comps.length)
    val e = graft.api.Tables.load(spark, sfDir, "lineitem")
      .groupBy($"l_partkey".as("p"), ($"l_suppkey" + 1000000L).as("su"))
      .agg(count(lit(1)).as("n")).filter($"n" >= 3L)
    val nNodes = e.select($"p").union(e.select($"su")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum === nNodes)
    // ordering contract: size-desc, then component asc
    val key = rows.map(r => (-r.getAs[Long]("n_nodes"), r.getAs[Long]("component")))
    assert(key.sameElements(key.sorted))
  }

  test("sim_kmeans_iterate: full coverage, argmin-consistent movement report") {
    val rows = SimilarityQueries.simKmeansIterate.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_assigned")).sum
    val corpus = graft.functions.AnnIndexes.embeddings(spark, sfDir).count()
    assert(total === corpus, "every vector lands in exactly one new cell")
    rows.foreach { r =>
      val cell = r.getAs[Int]("cell")
      assert(cell >= 0 && cell < 16)
      assert(r.getAs[Long]("n_moved") >= 0L)
      assert(r.getAs[Long]("n_moved") <= r.getAs[Long]("n_assigned"))
      assert(r.getAs[Long]("inertia") >= 0L)
    }
  }

  test("dd_minhash_topk: per-query cap, agreement ratio, query-set predicate") {
    val rows = TextQueries.ddMinhashTopk.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_doc") % 4 === 0L)
      assert(r.getAs[Long]("query_doc") !== r.getAs[Long]("neighbor"))
      val nm = r.getAs[Long]("n_matching")
      assert(nm >= 0L && nm <= 8L)
      assert(r.getAs[Double]("est_jaccard") === nm.toDouble / 8.0)
    }
    // top-3 cap per query; no duplicate neighbor within a query
    rows.groupBy(_.getAs[Long]("query_doc")).foreach { case (_, g) =>
      assert(g.length <= 3)
      val ns = g.map(_.getAs[Long]("neighbor"))
      assert(ns.distinct.length === ns.length)
    }
  }

  test("tx_heaps_law: cumulative curves monotone; vocab bounded by tokens") {
    import spark.implicits._
    val rows = TextQueries.txHeapsLaw.fn(spark, sfDir).collect()
    assert(rows.length === 10)
    val toks = rows.map(_.getAs[Long]("cum_tokens"))
    val vocab = rows.map(_.getAs[Long]("cum_vocab"))
    assert(toks.sameElements(toks.sorted), "cum_tokens must be non-decreasing")
    assert(vocab.sameElements(vocab.sorted), "cum_vocab must be non-decreasing")
    rows.foreach(r => assert(r.getAs[Long]("cum_vocab") <= r.getAs[Long]("cum_tokens")))
    // final checkpoint accounts for every token of the corpus
    val total = graft.api.Tables.load(spark, sfDir, "documents")
      .select(size(expr("filter(split(text, ' '), x -> x != '')")).cast("long").as("n"))
      .agg(sum($"n")).collect()(0).getLong(0)
    assert(toks.last === total)
  }

  test("tx_cooccur_lift: support floor holds; lift consistent with marginals") {
    val rows = TextQueries.txCooccurLift.fn(spark, sfDir).collect()
    assert(rows.length === 20)
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.sameElements(lifts.sortBy(-_)), "rows ranked by lift desc")
    rows.foreach { r =>
      val nab = r.getAs[Long]("n_ab")
      assert(nab >= 5L)
      // an adjacent pair occurrence consumes one occurrence of each word
      assert(nab <= r.getAs[Long]("n_a") && nab <= r.getAs[Long]("n_b"))
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("mm_luma_bands: dominant-band census covers every decodable image") {
    val rows = MultimodalQueries.mmLumaBands.fn(spark, sfDir).collect()
    val nImages = rows.map(_.getAs[Long]("n_images")).sum
    val corpus = graft.api.Tables.load(spark, sfDir, "documents").count()
    assert(nImages === corpus, "every synthesized PNG must decode")
    rows.foreach { r =>
      val band = r.getAs[Long]("dominant_band")
      assert(band >= 0L && band <= 15L)
      // smallest generated image is 8x8 = 64 px
      assert(r.getAs[Long]("total_px") >= 64L * r.getAs[Long]("n_images"))
    }
  }
}
