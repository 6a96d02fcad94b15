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
}
