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

  test("video signature: bands are essence byte sums; a 2-bit-near pair survives the band join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two AVI essences differing in ONE byte: band sums 1625 vs 1626 in
    // band 3 (xor = 0x3, 2 bits) — a genuine near-dup the pigeonhole
    // band join must find; a third, far essence must not pair
    val e1 = "A" * 100
    val e2 = "A" * 99 + "B"
    val e3 = "z" * 100
    val media = Seq(
      (1L, e1), (2L, e2), (3L, e3)
    ).map { case (id, t) =>
      Media.MediaRecord(id, "video", Media.aviBytes(4, 4, 10, t.getBytes("UTF-8")))
    }.toDF("doc_id", "media_type", "payload")
    val fps = Media.videoSignatures(spark, media).collect().sortBy(_.doc_id)
    assert(fps.map(_.doc_id).toSeq === Seq(1L, 2L, 3L))
    assert(fps(0).b0 === 25L * 65 % 65536)
    assert(fps(1).b3 === (24L * 65 + 66) % 65536)
    // replicate mm_video_neardup's banded join on this tiny set
    val fpDf = fps.toSeq.toDF()
    val banded = fpDf.select($"doc_id", $"b0", $"b1", $"b2", $"b3",
      posexplode(array($"b0", $"b1", $"b2", $"b3")).as(Seq("blk", "key")))
    val a = banded.select($"blk", $"key", $"doc_id".as("doc_a"),
      $"b0".as("a0"), $"b1".as("a1"), $"b2".as("a2"), $"b3".as("a3"))
    val b = banded.select($"blk", $"key", $"doc_id".as("doc_b"),
      $"b0".as("c0"), $"b1".as("c1"), $"b2".as("c2"), $"b3".as("c3"))
    val pairs = a.join(b, Seq("blk", "key")).filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        expr("CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)").as("dist"))
      .distinct().filter($"dist" <= 3L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 2L)))
  }

  test("pcap ingest admission: streaming capture directory equals the batch gate") {
    import graft.queries.PcapQueries
    import org.apache.spark.sql.functions._
    val fixPcap = PcapQueries.fixturePath
    val dir = java.nio.file.Files.createTempDirectory("pcapadm")
    val ck = java.nio.file.Files.createTempDirectory("pcapadmck").toString
    java.nio.file.Files.copy(java.nio.file.Paths.get(fixPcap), dir.resolve("cap-001.pcap"))

    // static artifact fitted ONCE (the production posture): the Bloom
    // word map over the corpus lane of the known capture
    val bloomMap = graft.functions.BloomDedup.fitMapRow(
      graft.functions.BloomDedup.fit(
        PcapQueries.packetDocs(spark, fixPcap)
          .filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"), md5(col("text")).as("h")))).cache()

    val acc = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val q = spark.readStream.format("pcap").load(dir.toString)
      .select(col("`frame.number`").as("doc_id"), col("`_ws.col.info`").as("text"))
      .filter(col("doc_id") % 10 === 7)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val res = PcapQueries.packetAdmission(b, bloomMap, minTokens = 5L).collect()
        acc.synchronized { acc ++= res.map(_.toSeq) }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(acc.length === 48) // lane-7 frames of the 485-frame capture
      // a rotated second capture file lands -> next micro-batch runs the
      // SAME gate over its arriving frames
      java.nio.file.Files.copy(java.nio.file.Paths.get(fixPcap), dir.resolve("cap-002.pcap"))
      q.processAllAvailable()
    } finally q.stop()

    // batch twin: the registered query's gate over one capture, doubled
    // (both stream files are copies, and the Bloom bit_or is idempotent
    // under duplicate corpus rows)
    val batch = graft.queries.PcapQueries.pcapIngestAdmission
      .fn(spark, sfDir).collect().map(_.toSeq).toSeq
    def key(r: Seq[Any]) = r.head.asInstanceOf[Long]
    assert(acc.sortBy(key).toSeq === (batch ++ batch).sortBy(key))
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
