package graft

import org.apache.spark.sql.functions._

import graft.queries.{GraphQueries, RelationalQueries, SimilarityQueries, TextQueries}

/** Property specs for the round-8 operators (gaps-and-islands, k-core,
  * Bloom dedup pre-filter, bitext margin mining). Oracle hash-matching is
  * the driver's gate; these pin the operator INVARIANTS that a hash can't
  * express (no-false-negative Bloom, ≥k surviving degrees, margin ≥ 1). */
class NewOperatorsR8Spec extends SparkSpec {

  test("q66_islands: islands partition each user's events; intra-island gaps ≤ 30 min") {
    import spark.implicits._
    val islands = RelationalQueries.q66Islands.fn(spark, sfDir).cache()
    val events = graft.api.Tables.load(spark, sfDir, "events")
    // every event lands in exactly one island
    val nEvents = events.count()
    val covered = islands.agg(sum($"n_events")).collect()(0).getLong(0)
    assert(covered === nEvents)
    // islands of one user never overlap: next island starts after prev ends
    val overlaps = islands.as("a").join(islands.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.island") + 1 === col("b.island") &&
        col("b.ts_start") <= col("a.ts_end")).count()
    assert(overlaps === 0L)
    // a >30-minute quiet period really separates islands
    val tooClose = islands.as("a").join(islands.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.island") + 1 === col("b.island") &&
        unix_micros(col("b.ts_start")) - unix_micros(col("a.ts_end"))
          <= 1800000000L).count()
    assert(tooClose === 0L)
    islands.unpersist()
  }

  test("gr_kcore: surviving degrees all ≥ k after the fixed peel") {
    // sf0.01: at sf0.001 every node's degree is < k and the core is
    // legitimately empty — the invariant needs a surviving core to bite
    val rows = GraphQueries.grKcore.fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    // output is (node, deg) sorted by deg desc — every survivor that the
    // 4-round peel kept still meets the core threshold in round 4's count
    val degs = rows.map(_.getAs[Long]("deg"))
    assert(degs.forall(_ >= 35L))
    assert(degs.sameElements(degs.sortBy(-_)))
  }

  test("dd_bloom_filter: Bloom never false-negatives; words replay in SQL") {
    val rows = TextQueries.ddBloomFilter.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hit = r.getAs[Boolean]("bloom_hit")
      val exact = r.getAs[Boolean]("exact_dup")
      val fp = r.getAs[Boolean]("false_positive")
      assert(!exact || hit, s"false negative for doc ${r.get(0)}")
      assert(fp === (hit && !exact))
    }
  }

  test("sim_bitext_margin: margin ≥ 1, best_cos bounded, one row per source") {
    val rows = SimilarityQueries.simBitextMargin.fn(spark, sfDir).collect()
    // margin = best / mean(top-4) ≥ 1 by construction; cosine ∈ [-1, 1]
    rows.foreach { r =>
      assert(r.getAs[Double]("margin") >= 1.0 - 1e-12)
      assert(math.abs(r.getAs[Double]("best_cos")) <= 1.0 + 1e-12)
    }
    val qids = rows.map(_.getAs[Long]("query_id"))
    assert(qids.distinct.length === qids.length)
  }

  test("dd_substring_dup: span union bounded by doc length; covered docs ≥ one window") {
    val rows = TextQueries.ddSubstringDup.fn(spark, sfDir).collect()
    val docs = graft.api.Tables.load(spark, sfDir, "documents")
    assert(rows.length.toLong === docs.count()) // every doc accounted for
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val d = r.getAs[Long]("dup_tokens")
      assert(d >= 0L && d <= n, s"doc ${r.get(0)}: dup $d outside [0, $n]")
      // a doc with any duplicated window covers at least the window (k=5)
      assert(d == 0L || d >= 5L)
      assert(math.abs(r.getAs[Double]("dup_frac") - d.toDouble / n) < 1e-15)
    }
    // the synthetic corpus repeats shingles across replicas — spans exist
    assert(rows.exists(_.getAs[Long]("dup_tokens") > 0L))
  }

  test("tx_bigram_lm: one row per ≥2-token doc; pair count = tokens − 1; bits positive") {
    import spark.implicits._
    val rows = graft.queries.ScoringQueries.txBigramLm.fn(spark, sfDir).cache()
    val docs = graft.api.Tables.load(spark, sfDir, "documents")
      .select($"doc_id",
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long").as("n_tok"))
    // n_pairs is exactly n_tokens − 1, and docs with <2 tokens are absent
    val joined = rows.join(docs, "doc_id")
      .select($"doc_id", $"n_pairs", $"n_tok").collect()
    assert(joined.length === rows.count().toInt)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_tok") >= 2L)
      assert(r.getAs[Long]("n_pairs") === r.getAs[Long]("n_tok") - 1L)
    }
    rows.collect().foreach { r =>
      val bpp = r.getAs[Double]("bits_per_pair")
      // alphabet is 33 symbols: per-pair bits ∈ (0, log2 denom_max]; the
      // add-one floor keeps every pair strictly positive
      assert(bpp > 0.0 && bpp < 64.0)
    }
    rows.unpersist()
  }

  test("gr_ppr: seeds dominate their neighborhood; ranks positive and sorted") {
    val rows = GraphQueries.grPpr.fn(spark, sfDir).collect()
    assert(rows.length > 0 && rows.length <= 20)
    val ranks = rows.map(_.getAs[Long]("rank"))
    assert(ranks.forall(_ > 0L))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    // teleport returns all restart mass to the seeds — at least one seed
    // node must survive into the global top-20
    val nodes = rows.map(_.getAs[Long]("node")).toSet
    assert((1000001L to 1000005L).exists(nodes.contains))
    // total mass never exceeds the injected 10¹² (truncating division
    // only ever LOSES mass; nothing is created)
    assert(ranks.sum <= 1000000000000L)
  }

  test("sim_ann_multiprobe: candidates dominate single-probe LSH; recall ≥ LSH vs brute") {
    val brute = SimilarityQueries.simAnnBrute.fn(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val lsh = SimilarityQueries.simAnnLsh.fn(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val mp = SimilarityQueries.simAnnMultiprobe.fn(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    // the probe set strictly contains the query bucket, so every LSH
    // result survives into the multiprobe candidate pool; with ≤10 total
    // results the top-10 can only improve toward brute force
    val mpRecall = (mp & brute).size
    val lshRecall = (lsh & brute).size
    assert(mpRecall >= lshRecall,
      s"multiprobe recall $mpRecall < single-probe $lshRecall")
    assert(mp.size >= lsh.size)
  }

  test("gr_hits: normalized scores peak at exactly 10⁶; hubs are suppliers, auths customers") {
    val rows = GraphQueries.grHits.fn(spark, sfDir).collect()
    val (auths, hubs) = rows.partition(_.getAs[String]("role") == "auth")
    assert(auths.length === 10 && hubs.length === 10)
    // max-normalization pins each half's top score to exactly 10⁶
    assert(auths.map(_.getAs[Long]("score")).max === 1000000L)
    assert(hubs.map(_.getAs[Long]("score")).max === 1000000L)
    assert(rows.map(_.getAs[Long]("score")).forall(x => x > 0L && x <= 1000000L))
    // node-id space: suppliers offset by 10⁶ (keys are 0-based), customers below it
    assert(hubs.map(_.getAs[Long]("node")).forall(_ >= 1000000L))
    assert(auths.map(_.getAs[Long]("node")).forall(_ < 1000000L))
  }

  test("tx_ngram_novelty: fractions in [0,1]; novel counts sum to the distinct-shingle total") {
    import spark.implicits._
    val rows = graft.queries.TextQueries.txNgramNovelty.fn(spark, sfDir).cache()
    rows.collect().foreach { r =>
      val f = r.getAs[Double]("novelty_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
    // every distinct corpus shingle is novel in exactly one doc (its first)
    val novelSum = rows.agg(sum($"n_novel")).collect()(0).getLong(0)
    val docs = graft.api.Tables.load(spark, sfDir, "documents")
      .withColumn("tokens", split($"text", " "))
      .filter(size($"tokens") >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(tokens) - 2), i -> concat_ws(' ', slice(tokens, i, 3)))"))
        .as("shingle"))
    assert(novelSum === docs.distinct().count())
    rows.unpersist()
  }

  test("mm_scene_cut: cuts bounded by transitions; one row per video doc") {
    val rows = graft.queries.MultimodalQueries.mmSceneCut.fn(spark, sfDir).collect()
    val nVideos = graft.api.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 === 2).count()
    assert(rows.length.toLong === nVideos)
    rows.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      val nc = r.getAs[Long]("n_cuts")
      assert(nf >= 1L && nc >= 0L && nc <= nf - 1,
        s"doc ${r.get(0)}: $nc cuts for $nf frames")
      if (nf > 1) {
        val mh = r.getAs[Double]("mean_hamming")
        assert(mh >= 0.0 && mh <= 60.0) // 60-bit signatures
      } else assert(r.isNullAt(r.fieldIndex("mean_hamming")))
    }
  }

  test("tx_cms_topk: the CMS guarantee — estimates never undercount") {
    val rows = TextQueries.txCmsTopk.fn(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val over = r.getAs[Long]("overestimate")
      assert(over >= 0L,
        s"word ${r.get(0)}: CMS estimate undercounts by ${-over}")
      assert(r.getAs[Long]("cms_estimate") ===
        r.getAs[Long]("true_cnt") + over)
    }
  }

  test("dd_dedup_report: fractions bounded; per-family counts bounded by totals") {
    val r = TextQueries.ddDedupReport.fn(spark, sfDir).collect()(0)
    val nDocs = r.getAs[Long]("n_docs")
    val nToks = r.getAs[Long]("n_tokens")
    assert(r.getAs[Long]("exact_dup_docs") <= nDocs)
    assert(r.getAs[Long]("near_dup_docs") <= nDocs)
    assert(r.getAs[Long]("substring_dup_tokens") <= nToks)
    // exact dups are near dups too (identical text shares every shingle)
    assert(r.getAs[Long]("exact_dup_docs") <= r.getAs[Long]("near_dup_docs"))
    for (c <- Seq("exact_frac", "near_frac", "substring_token_frac")) {
      val f = r.getAs[Double](c)
      assert(f >= 0.0 && f <= 1.0, s"$c = $f")
    }
  }

  test("tx_bpe_train: merge frequencies are non-increasing across rounds") {
    val rows = TextQueries.txBpeTrain.fn(spark, sfDir).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getAs[Long]("round")).toSeq === (1L to 6L))
    val freqs = rows.sortBy(_.getAs[Long]("round")).map(_.getAs[Long]("pair_freq"))
    // a merge can only remove occurrences of existing pairs, and any pair
    // the new symbol creates is bounded by the merged pair's count — the
    // classic BPE monotonicity
    freqs.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    rows.foreach { r =>
      assert(r.getAs[String]("left").nonEmpty && r.getAs[String]("right").nonEmpty)
    }
  }

  test("gr_modularity: Q within bounds; integer totals consistent") {
    val r = GraphQueries.grModularity.fn(spark, sfDir).collect()(0)
    val q = r.getAs[Double]("modularity")
    // Newman modularity is bounded in [-1/2, 1) for any partition
    assert(q > -0.5 - 1e-12 && q < 1.0)
    val m2 = r.getAs[Long]("m2")
    assert(r.getAs[Long]("intra_total") <= m2)
    assert(r.getAs[Long]("sum_deg_sq") <= m2 * m2)
    assert(r.getAs[Long]("n_communities") >= 1L)
  }

  test("sim_ann_matryoshka: sorted exact-cosine top-10 from the prefix-tier candidates") {
    val rows = SimilarityQueries.simAnnMatryoshka.fn(spark, sfDir).collect()
    assert(rows.length === 10)
    val cos = rows.map(_.getAs[Double]("cosine"))
    assert(cos.forall(c => c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12))
    assert(cos.sameElements(cos.sortBy(-_)))
    // the rerank tier is EXACT full-dimension cosine: every returned pair
    // must agree with an independent brute-force recompute
    val brute = SimilarityQueries.simAnnBrute.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      brute.get(id).foreach(b => assert(b === r.getAs[Double]("cosine")))
    }
  }

  test("dd_semdedup_ivf: verdict per vector; survivors are the lowest id of each group") {
    val rows = SimilarityQueries.ddSemdedupIvf.fn(spark, sfDir).collect()
    val nVecs = graft.api.Tables.load(spark, sfDir, "embeddings").count()
    assert(rows.length.toLong === nVecs)
    rows.foreach { r =>
      val isDup = r.getAs[Boolean]("is_dup")
      val nDups = r.getAs[Long]("n_dups")
      if (isDup) {
        // the surviving representative always has a smaller id
        assert(r.getAs[Long]("dup_of") < r.getAs[Long]("vec_id"))
        assert(nDups >= 1L)
      } else {
        assert(r.isNullAt(r.fieldIndex("dup_of")))
        assert(nDups === 0L)
      }
    }
  }
}
