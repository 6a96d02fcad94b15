package graft

import graft.queries.ScoringQueries

/** Semantic sanity for the model-based scoring family (the oracle gate
  * proves bit-exactness; these pin the MEANING of the scores). */
class ScoringSpec extends SparkSpec {

  test("tx_dsir_weights tilts toward the en target slice") {
    val rows = ScoringQueries.txDsirWeights.fn(spark, sfDir).collect()
    assert(rows.length === 500)
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_bigrams"), r.getAs[Double]("dsir_logw"))).toMap
    assert(byId.values.forall(_._1 >= 0))
    // importance weights are per-bigram log ratios: en (target) docs must
    // average higher NORMALIZED weight than the non-en rest of the corpus
    val langs = graft.api.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    def avgNorm(p: String => Boolean): Double = {
      val xs = byId.collect { case (id, (n, w)) if p(langs(id)) && n > 0 => w / n }
      xs.sum / xs.size
    }
    assert(avgNorm(_ == "en") > avgNorm(_ != "en"),
      "en docs should carry higher average DSIR weight than non-en")
  }

  test("tx_lm_score bits/token separates in-vocab from noise text") {
    val rows = ScoringQueries.txLmScore.fn(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val bt = r.getAs[Double]("bits_per_token")
      assert(bt > 0.0 && bt.isFinite)
      // ceiling: nothing can cost more than the UNK code length, and the
      // corpus-fitted model must compress its own corpus below ~raw entropy
      assert(bt < 25.0)
    }
    val avg = rows.map(_.getAs[Double]("bits_per_token")).sum / rows.length
    assert(avg < 12.0, s"corpus-average bits/token $avg — model not fitted?")
  }

  test("tx_resample_to_mix flattens the language distribution (alpha=0.7)") {
    val rows = ScoringQueries.txResampleToMix.fn(spark, sfDir).collect()
    val quotas = rows.map(r =>
      r.getAs[String]("lang") -> r.getAs[Long]("quota")).toMap
    val kept = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    // every language fills its quota exactly (hash-rank is total)
    kept.foreach { case (l, n) => assert(n.toLong === quotas(l)) }
    // temperature smoothing: the majority language is DOWN-sampled below
    // its raw share, minorities upsampled above theirs
    val docsByLang = graft.api.Tables.load(spark, sfDir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val n = docsByLang.values.sum.toDouble
    val budget = quotas.values.sum.toDouble
    assert(quotas("en") / budget < docsByLang("en") / n,
      "en should be down-sampled by the temperature")
    quotas.collect { case (l, q) if l != "en" =>
      assert(q / budget > docsByLang(l) / n, s"$l should be upsampled")
    }
  }
}
