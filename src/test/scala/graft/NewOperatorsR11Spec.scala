package graft

import graft.multimodal.Media
import graft.queries.MultimodalQueries

/** Property specs for the round-11 operators. Oracle hash-matching is the
  * driver's gate; these pin operator INVARIANTS a hash can't express. */
class NewOperatorsR11Spec extends SparkSpec {

  test("audio fingerprint: bands are the PCM energy of the exact quarter spans") {
    import spark.implicits._
    // a WAV long enough that every band holds full + partial periods
    val dur = 403L
    val media = Seq(Media.MediaRecord(1L, "audio", Media.wavBytes(dur))).toDF(
      "doc_id", "media_type", "payload")
    val fp = Media.audioFingerprints(spark, media).collect()
    assert(fp.length === 1)
    // independent replay of the generation formula over each band span
    val expected = (0 until 4).map { k =>
      val from = dur * k / 4
      val to = dur * (k + 1) / 4
      (from until to).map { i =>
        val dev = (64 + (dur * 11 + i * 37) % 97) - 128
        dev * dev
      }.sum % 65536L
    }
    assert(Seq(fp(0).b0, fp(0).b1, fp(0).b2, fp(0).b3) === expected)
    assert(fp(0).fp === expected.map(b => f"$b%04x").mkString)
  }

  test("audio fingerprint: non-WAV and sub-4-sample payloads yield no row") {
    import spark.implicits._
    val media = Seq(
      Media.MediaRecord(1L, "audio", Media.mp3Bytes(100L)), // not WAV
      Media.MediaRecord(2L, "audio", Media.wavBytes(3L)), // < 4 samples
      Media.MediaRecord(3L, "audio", Media.wavBytes(4L))
    ).toDF("doc_id", "media_type", "payload")
    val fp = Media.audioFingerprints(spark, media).collect()
    assert(fp.map(_.doc_id).toSeq === Seq(3L))
  }

  test("mm_audio_fingerprint: pigeonhole band join has no false negatives vs all-pairs") {
    import spark.implicits._
    // ground truth: brute-force all-pairs Hamming <= 3 over the fingerprints
    val media = Media.synthesize(graft.api.Tables.load(spark, sfDir, "documents"))
    val fps = Media.audioFingerprints(spark, media).collect()
    val truth = (for {
      a <- fps; b <- fps
      if a.doc_id < b.doc_id
      d = java.lang.Long.bitCount(a.b0 ^ b.b0) + java.lang.Long.bitCount(a.b1 ^ b.b1) +
        java.lang.Long.bitCount(a.b2 ^ b.b2) + java.lang.Long.bitCount(a.b3 ^ b.b3)
      if d <= 3
    } yield (a.doc_id, b.doc_id, d.toLong)).sortBy(p => (p._1, p._2))
    val got = MultimodalQueries.mmAudioFingerprint.fn(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === truth.toSeq)
    assert(truth.nonEmpty) // the sf0.001 corpus has at least one near-dup pair
  }
}
