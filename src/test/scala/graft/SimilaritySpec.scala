package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.multimodal.Media
import graft.queries.{MultimodalQueries, SimilarityQueries, TextQueries}

class SimilaritySpec extends SparkSpec {

  test("vector_dot SQL function: mixed float/double arrays, null semantics") {
    val r = spark.sql("""
      SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                        array(3.0D, 4.0D)) AS d,
             vector_dot(array(CAST(1.0 AS FLOAT)), array(1.0D, 2.0D)) AS len_mismatch,
             vector_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
                        array(1.0D, 2.0D)) AS null_elem
    """).collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("cosine helper: hand-checked values") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical → 1
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal → 0
      (3L, Array(1.0f, 1.0f), Array(-1.0f, -1.0f))) // opposite → -1
      .toDF("id", "a", "b")
      .select($"id", Vectors.cosine($"a", $"b").as("c"))
      .orderBy($"id").collect()
    assert(math.abs(df(0).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(df(1).getDouble(1)) < 1e-12)
    assert(math.abs(df(2).getDouble(1) + 1.0) < 1e-12)
  }

  test("brute-force ANN returns 10 ordered neighbors") {
    val rows = SimilarityQueries.simAnnBrute.fn(spark, sfDir).collect()
    assert(rows.length === 10)
    val cosines = rows.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sortBy(-_)))
    assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  test("LSH bucket is deterministic and bounded") {
    import spark.implicits._
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
      .withColumn("bucket", Vectors.lshBucket($"embedding", 8))
    val b1 = emb.select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b2 = emb.select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(b1 === b2)
    assert(b1.values.forall(b => b >= 0 && b < 256))
    // buckets actually partition the space (not everything in one bucket)
    assert(b1.values.toSet.size > 4)
  }

  test("LSH ANN finds the query's bucket-mates including near-identical vectors") {
    import spark.implicits._
    // plant: vector 0 and a tiny perturbation must share a bucket
    val base = graft.api.Tables.load(spark, sfDir, "embeddings")
      .filter($"vec_id" === 0).select($"embedding").collect()(0)
      .getSeq[Float](0).toArray
    val perturbed = base.map(x => x + 1e-6f)
    val planted = Seq((9999L, perturbed, 0)).toDF("vec_id", "embedding", "label")
    val two = planted.union(
      graft.api.Tables.load(spark, sfDir, "embeddings").filter($"vec_id" === 0)
        .select($"vec_id", $"embedding", $"label"))
    val buckets = two.withColumn("b", Vectors.lshBucket($"embedding", 8))
      .select("b").collect().map(_.getInt(0))
    assert(buckets(0) === buckets(1))
  }

  test("media pipeline: real headers round-trip through the decoder") {
    val meta = MultimodalQueries.mmMediaMeta.fn(spark, sfDir).collect()
    assert(meta.nonEmpty)
    meta.foreach { r =>
      val tpe = r.getAs[String]("media_type")
      assert(Set("image", "audio", "video").contains(tpe))
      assert(r.getAs[Long]("n_bytes") > 0)
      if (tpe == "audio") {
        assert(r.getAs[Long]("width") === 0L)
        assert(r.getAs[Long]("duration_ms") >= 0L)
      } else {
        assert(r.getAs[Long]("width") >= 1 && r.getAs[Long]("width") <= 512)
      }
    }
  }

  test("codec decode goldens: PNG/JPEG/GIF/WAV/AVI headers parse byte-exactly") {
    val data = "payload body".getBytes("UTF-8")
    // PNG: IHDR big-endian dimensions, 57-byte container overhead
    val png = Media.pngBytes(640, 480, data)
    assert(png.length === 57 + data.length)
    assert(Media.decode(png) === ((640L, 480L, 0L)))
    // JPEG: SOF0 found via marker scan (APP0 skipped by its length)
    val jpg = Media.jpegBytes(1920, 1080, data)
    assert(jpg.length === 41 + data.length)
    assert(Media.decode(jpg) === ((1920L, 1080L, 0L)))
    // GIF: little-endian logical screen descriptor
    val gif = Media.gifBytes(320, 200, data)
    assert(gif.length === 14 + data.length)
    assert(Media.decode(gif) === ((320L, 200L, 0L)))
    // WAV: duration = data bytes * 1000 / byte rate (1000 Hz mono 8-bit)
    val wav = Media.wavBytes(1234)
    assert(wav.length === 44 + 1234)
    assert(Media.decode(wav) === ((0L, 0L, 1234L)))
    // AVI: avih main header carries µs/frame, frames, dimensions
    val avi = Media.aviBytes(720, 576, 5000, data)
    assert(avi.length === 100 + data.length)
    assert(Media.decode(avi) === ((720L, 576L, 5000L)))
    // movi essence round-trips for the frame fingerprint
    assert(Media.aviMoviData(avi).toSeq === data.toSeq)
    // MP4 / ISO BMFF: mvhd duration at timescale 1000, tkhd 16.16 dims
    val mp4 = Media.mp4Bytes(1280, 720, 9000, data)
    assert(mp4.length === 244 + data.length)
    assert(Media.decode(mp4) === ((1280L, 720L, 9000L)))
    assert(Media.essenceOf(mp4).toSeq === data.toSeq)
    assert(Media.codecOf(mp4) === "mp4")
    // MP3 / ID3v2: TLEN text frame declares the duration
    val mp3 = Media.mp3Bytes(12345)
    assert(mp3.length === 121 + "12345".length)
    assert(Media.decode(mp3) === ((0L, 0L, 12345L)))
    assert(Media.codecOf(mp3) === "mp3")
    // FLAC STREAMINFO: duration from the packed sample-rate/total-samples
    val flac = Media.flacBytes(43210)
    assert(flac.length === 42)
    assert(Media.decode(flac) === ((0L, 0L, 43210L)))
    assert(Media.codecOf(flac) === "flac")
    // JPEG EXIF APP1: orientation tag parses (LE TIFF), dims unaffected
    val jex = Media.jpegBytes(800, 600, 6, data)
    assert(jex.length === 77 + data.length)
    assert(Media.decode(jex) === ((800L, 600L, 0L)))
    assert(Media.exifOrientation(jex) === 6L)
    assert(Media.exifOrientation(jpg) === 0L) // no APP1 → absent
    // TIFF: II IFD0 tags 256/257, 38-byte fixed header
    val tif = Media.tiffBytes(1024, 768, data)
    assert(tif.length === 38 + data.length)
    assert(Media.decode(tif) === ((1024L, 768L, 0L)))
    assert(Media.codecOf(tif) === "tiff")
    // WebP: VP8X canvas minus-one 24-bit fields, RIFF word alignment
    val webp = Media.webpBytes(2048, 1024, data)
    assert(webp.length === 38 + data.length + (data.length & 1))
    assert(Media.decode(webp) === ((2048L, 1024L, 0L)))
    assert(Media.codecOf(webp) === "webp")
    // Ogg: BOS Vorbis id header rate + EOS page granule → duration
    val ogg = Media.oggBytes(7777)
    assert(ogg.length === 106)
    assert(Media.decode(ogg) === ((0L, 0L, 7777L)))
    assert(Media.codecOf(ogg) === "ogg")
    // unknown magic: digest fallback, deterministic, never throws
    val junk = "not a media file".getBytes("UTF-8")
    assert(Media.decode(junk) === Media.digestMeta(junk))
    // malformed inputs must not throw or loop
    assert(Media.decode(Array.empty[Byte]) === Media.digestMeta(Array.empty[Byte]))
    val evilWav = Media.wavBytes(8)
    evilWav(19) = 0x80.toByte // fmt chunk size becomes huge/negative-as-int
    Media.decode(evilWav) // must terminate (size guard), not loop
    val truncated = java.util.Arrays.copyOf(png, 20)
    Media.decode(truncated) // must not throw
  }

  test("audio features: RIFF walk + PCM fold match a hand-computed reference") {
    import spark.implicits._
    val dur = 200L
    val wav = Media.wavBytes(dur)
    // reference: replay the generation waveform directly
    val samples = (0 until dur.toInt).map(i => 64 + ((dur * 11 + i * 37) % 97).toInt)
    val devs = samples.map(_ - 128)
    val expPeak = devs.map(math.abs).max.toLong
    val expCross = devs.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)).toLong
    val expRms = math.sqrt(devs.map(d => d.toLong * d).sum.toDouble / dur)
    val media = Seq((7L, "audio", wav)).toDF("doc_id", "media_type", "payload")
    val got = Media.audioFeatures(spark, media).collect()
    assert(got.length === 1)
    assert(got(0) === Media.AudioStats(7L, dur, expPeak, expCross, expRms))
    // non-wav rows produce no stats; malformed wav terminates and yields none
    val mp3row = Seq((8L, "audio", Media.mp3Bytes(5))).toDF("doc_id", "media_type", "payload")
    assert(Media.audioFeatures(spark, mp3row).count() === 0L)
    val evil = Media.wavBytes(8)
    evil(19) = 0x80.toByte // fmt chunk length lies — the walk must still end
    Media.audioFeatures(spark, Seq((9L, "audio", evil)).toDF("doc_id", "media_type", "payload")).count()
  }

  test("exact dedup groups duplicate texts") {
    import spark.implicits._
    // plant duplicates in a local frame and run the same plan shape
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "unique text here"))
      .toDF("doc_id", "text")
    val out = docs.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n"))).toSet
    assert(out === Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH surfaces a planted near-duplicate pair") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again and again"
    val docs = Seq(
      (1L, text),
      (2L, text + " tail"), // near-dup: shares almost all 3-shingles
      (3L, "completely different words that share nothing at all with others one two three"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents_planted")
    // run the same shingle→minhash→band pipeline inline
    val sh = docs.withColumn("tokens", split($"text", " "))
      .select($"doc_id", explode(
        expr("transform(sequence(1, size(tokens) - 2), i -> concat_ws(' ', slice(tokens, i, 3)))"))
        .as("shingle")).distinct()
    val aggs = (0 until 8).map(h => min(md5(concat(lit(s"$h|"), col("shingle")))).as(s"mh$h"))
    val sig = sh.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
    val bands = (0 until 8 by 2).map { h =>
      sig.select($"doc_id", lit(h / 2).as("band"), concat(col(s"mh$h"), col(s"mh${h + 1}")).as("bucket"))
    }.reduce(_ union _)
    val pairs = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("text quality + langid + simhash run and agree on row counts") {
    val n = graft.api.Tables.load(spark, sfDir, "documents").count()
    assert(TextQueries.txQuality.fn(spark, sfDir).count() === n)
    assert(TextQueries.txLangId.fn(spark, sfDir).count() === n)
    assert(TextQueries.ddSimhash.fn(spark, sfDir).count() === n)
  }

  test("IVF with all cells probed equals brute force; partial probe is a subset") {
    import spark.implicits._
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    val index = graft.functions.Ivf.build(spark, emb, k = 8)
    val query = emb.filter($"vec_id" === 0)
      .select($"embedding").collect()(0).getSeq[Float](0).toArray

    val exhaustive = graft.functions.Ivf.search(index, query, 11, nProbe = 8)
      .collect().map(_.getAs[Long]("vec_id"))
    val brute = SimilarityQueries.simAnnBrute.fn(spark, sfDir)
      .collect().map(_.getAs[Long]("vec_id"))
    // drop the query vector itself (cosine 1.0 tops the exhaustive list)
    assert(exhaustive.filterNot(_ == 0L).take(10).toSeq === brute.toSeq)

    val probed = graft.functions.Ivf.search(index, query, 10, nProbe = 2)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(probed.nonEmpty && probed.length <= 10)
    // the query's own cell is always probed first, so vec 0 is found
    assert(probed.contains(0L))
  }

  test("PQ: codes deterministic, reconstruction beats mean quantizer, dup found") {
    import spark.implicits._
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    val cb = graft.functions.Pq.fit(spark, emb, m = 8, k = 16)
    val enc = graft.functions.Pq.encode(emb, cb).cache()

    // determinism + code-space sanity
    val c1 = enc.select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val c2 = graft.functions.Pq.encode(emb, cb).select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(c1 === c2)
    assert(c1.values.forall(cs => cs.length === 8 && cs.forall(c => c >= 0 && c < 16)))

    // an exact duplicate of vec 0 encodes to identical codes and is found
    // as its query's top hit with exact cosine 1.0 after rerank
    val dupe = emb.filter($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"), $"embedding", $"label")
    val enc2 = graft.functions.Pq.encode(emb.unionByName(dupe), cb)
    val codes0 = enc2.filter($"vec_id" === 0).select($"codes").head().getSeq[Int](0)
    val codes9 = enc2.filter($"vec_id" === 9999).select($"codes").head().getSeq[Int](0)
    assert(codes0 === codes9)
    val q = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val top = graft.functions.Pq.searchBatch(enc2, cb, q, topK = 2).collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSet.contains(9999L))
    assert(top.find(_.getAs[Long]("vec_id") == 9999L).get.getAs[Double]("cosine") > 0.999999)

    // reconstruction error must beat the trivial quantize-to-global-mean
    val dim = 64
    val meanVec = emb.select(
      (1 to dim).map(i => avg(element_at($"embedding", i).cast("double")).as(s"m$i")): _*)
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val errs = enc.select($"embedding", $"codes").collect().map { r =>
      val e = r.getSeq[Float](0)
      val cs = r.getSeq[Int](1)
      var pq = 0.0
      var mean = 0.0
      for (j <- 0 until 8; i <- 0 until 8) {
        val x = e(j * 8 + i).toDouble
        val dpq = x - cb.centroids(j)(cs(j))(i)
        val dm = x - meanVec(j * 8 + i)
        pq += dpq * dpq
        mean += dm * dm
      }
      (pq, mean)
    }
    val (pqMse, meanMse) = (errs.map(_._1).sum / errs.length, errs.map(_._2).sum / errs.length)
    assert(pqMse < meanMse, s"PQ MSE $pqMse must beat mean-quantizer MSE $meanMse")
    enc.unpersist()
  }

  test("pq_adc_score SQL function: table scoring + null semantics") {
    val r = spark.sql("""
      SELECT pq_adc_score(array(1, 0), array(array(1.0D, 2.0D), array(3.0D, 4.0D))) AS ok,
             pq_adc_score(array(1), array(array(1.0D), array(2.0D))) AS len_mismatch,
             pq_adc_score(array(5, 0), array(array(1.0D, 2.0D), array(3.0D, 4.0D))) AS oob,
             pq_adc_score(CAST(NULL AS ARRAY<INT>),
                          array(array(1.0D))) AS null_in
    """).collect()(0)
    assert(r.getDouble(0) === 5.0) // lut[0][1] + lut[1][0] = 2 + 3
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("ADC table scoring pins to reconstruction scoring; identical candidate pick") {
    import spark.implicits._
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    val cb = graft.functions.Pq.fit(spark, emb, m = 8, k = 16)
    val enc = graft.functions.Pq.encode(emb, cb)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val qprep = queries.select($"query_id", $"qe",
      graft.functions.Pq.lutDotCol(cb).as("lut_dot"),
      Vectors.norm($"qe").as("qnorm"))
    // the production search path scores via adcCosCol; reconstructionCos is
    // the literal decode + flat-fold cosine it replaced. The two differ only
    // in fp association (subspace-grouped vs flat summation), so they must
    // agree to ~1 ulp per add — pinned at 1e-9 — and pick identical
    // rerank candidate sets.
    val both = enc.crossJoin(broadcast(qprep))
      .select($"query_id", $"vec_id",
        graft.functions.Pq.adcCosCol(cb).as("adc"),
        graft.functions.Pq.reconstructionCos(cb).as("recon"))
      .collect()
    assert(both.length > 1000)
    both.foreach { r =>
      val a = r.getDouble(2); val rc = r.getDouble(3)
      assert(math.abs(a - rc) < 1e-9,
        s"ADC $a vs reconstruction $rc at q=${r.getLong(0)} v=${r.getLong(1)}")
    }
    def top50(byAdc: Boolean) = both.groupBy(_.getLong(0)).view.mapValues { rows =>
      rows.sortBy(r => (-(if (byAdc) r.getDouble(2) else r.getDouble(3)), r.getLong(1)))
        .take(50).map(_.getLong(1)).toSet
    }.toMap
    assert(top50(byAdc = true) === top50(byAdc = false))
  }

  test("sample-bounded IVF fit (stride > 1): probe-all still equals brute force") {
    import spark.implicits._
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    // fitSample = n/5 forces stride > 1: the coarse quantizer fits on ~100
    // of 500 rows. The probe-all anchor is partition-independent, so it
    // must still reproduce brute force exactly.
    val index = graft.functions.Ivf.build(spark, emb, k = 8, fitSample = n / 5)
    val query = emb.filter($"vec_id" === 0)
      .select($"embedding").collect()(0).getSeq[Float](0).toArray
    val exhaustive = graft.functions.Ivf.search(index, query, 11, nProbe = 8)
      .collect().map(_.getAs[Long]("vec_id"))
    val brute = SimilarityQueries.simAnnBrute.fn(spark, sfDir)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(exhaustive.filterNot(_ == 0L).take(10).toSeq === brute.toSeq)
  }

  test("IVF-PQ with all cells probed and full rerank equals brute force") {
    import spark.implicits._
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count().toInt
    val index = graft.functions.Ivf.build(spark, emb, k = 8)
    val cb = graft.functions.Pq.fit(spark, emb, m = 8, k = 16)
    val encoded = graft.functions.Pq.encode(index.assigned, cb)
    val queries = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    // exhaustive probes + rerank >= corpus => the approximate stage cannot
    // drop anything; the exact rerank must reproduce brute force
    val full = graft.functions.Pq.searchIvfPq(encoded, cb, index, queries,
      topK = 11, nProbe = 8, rerank = n + 1)
      .collect().map(_.getAs[Long]("vec_id")).filterNot(_ == 0L).take(10)
    val brute = SimilarityQueries.simAnnBrute.fn(spark, sfDir)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(full.toSeq === brute.toSeq)

    // partial probe stays plausible: results non-empty, self-cell found
    val part = graft.functions.Pq.searchIvfPq(encoded, cb, index, queries,
      topK = 5, nProbe = 2).collect()
    assert(part.nonEmpty && part.map(_.getAs[Long]("vec_id")).contains(0L))
  }

  test("persisted IVF index reused without re-fitting k-means; recall preserved") {
    import spark.implicits._
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    val index = graft.functions.Ivf.build(spark, emb, k = 8)
    graft.functions.Ivf.persist(index, "ivf_spec_idx", buckets = 8)
    // load path involves no KMeans fit by construction — centroids come
    // from the catalog table, assignments stay a lazy bucketed scan
    val loaded = graft.functions.Ivf.loadIndex(spark, "ivf_spec_idx")
    assert(loaded.centroids.map(_.toSeq).toSeq === index.centroids.map(_.toSeq).toSeq)

    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    def results(ix: graft.functions.Ivf.Index) =
      graft.functions.Ivf.searchBatch(ix, queries, topK = 5, nProbe = 4)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
          r.getAs[Long]("vec_id"))).toSeq
    assert(results(loaded) === results(index)) // recall == the fresh index's

    // the assigned table really is bucketed (co-located cell joins)
    val desc = spark.sql("DESCRIBE EXTENDED ivf_spec_idx_assigned")
      .collect().map(r => s"${r.getString(0)} ${r.getString(1)}").mkString("\n")
    assert(desc.contains("Num Buckets") && desc.contains("8"))
    assert(desc.toLowerCase.contains("cell"))
    spark.sql("DROP TABLE IF EXISTS ivf_spec_idx_centroids")
    spark.sql("DROP TABLE IF EXISTS ivf_spec_idx_assigned")
  }

  test("persisted PQ / IVF-PQ index searches without re-fitting k-means") {
    import spark.implicits._
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    val index = graft.functions.Ivf.build(spark, emb, k = 8)
    val cb = graft.functions.Pq.fit(spark, emb, m = 8, k = 16)
    val encoded = graft.functions.Pq.encode(index.assigned, cb)
    graft.functions.Pq.persist(cb, encoded, "pq_spec_idx", buckets = 8)
    graft.functions.Ivf.persist(index, "pqivf_spec_idx", buckets = 8)

    // the load path involves no KMeans fit by construction — the codebook
    // and centroids come from catalog tables, codes stay a lazy bucketed
    // scan — and must reproduce the fresh index bit-for-bit
    val (lcb, lcodes) = graft.functions.Pq.loadIndex(spark, "pq_spec_idx")
    assert(lcb.m === cb.m && lcb.dsub === cb.dsub)
    assert(lcb.centroids.map(_.map(_.toSeq).toSeq).toSeq ===
      cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    val lix = graft.functions.Ivf.loadIndex(spark, "pqivf_spec_idx")

    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("vec_id"))).toSeq
    assert(rows(graft.functions.Pq.searchBatch(lcodes, lcb, queries, topK = 5)) ===
      rows(graft.functions.Pq.searchBatch(encoded, cb, queries, topK = 5)))
    assert(rows(graft.functions.Pq.searchIvfPq(lcodes, lcb, lix, queries,
        topK = 5, nProbe = 4)) ===
      rows(graft.functions.Pq.searchIvfPq(encoded, cb, index, queries,
        topK = 5, nProbe = 4)))

    // codes really are bucketed (co-located probe joins at scale)
    val desc = spark.sql("DESCRIBE EXTENDED pq_spec_idx_codes")
      .collect().map(r => s"${r.getString(0)} ${r.getString(1)}").mkString("\n")
    assert(desc.contains("Num Buckets") && desc.contains("8"))
    assert(desc.toLowerCase.contains("cell"))
    Seq("pq_spec_idx_codebook", "pq_spec_idx_codes",
      "pqivf_spec_idx_centroids", "pqivf_spec_idx_assigned")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    // combined persist: THREE tables, corpus stored once, search equal
    graft.functions.Pq.persistIvfPq(index, cb, encoded, "ivfpq_spec_idx", buckets = 8)
    val (cix, ccb, ccodes) = graft.functions.Pq.loadIvfPq(spark, "ivfpq_spec_idx")
    assert(!spark.catalog.tableExists("ivfpq_spec_idx_assigned"),
      "combined persist must not duplicate the corpus")
    assert(rows(graft.functions.Pq.searchIvfPq(ccodes, ccb, cix, queries,
        topK = 5, nProbe = 4)) ===
      rows(graft.functions.Pq.searchIvfPq(encoded, cb, index, queries,
        topK = 5, nProbe = 4)))
    Seq("ivfpq_spec_idx_centroids", "ivfpq_spec_idx_codebook", "ivfpq_spec_idx_codes")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("PQ range search: exact radius respected; wide margin recovers exhaustive recall") {
    import org.apache.spark.sql.functions._
    val emb = graft.functions.AnnIndexes.embeddings(spark, sfDir)
    val cb = graft.functions.AnnIndexes.pq(spark, sfDir, m = 8, k = 16)
    val encoded = graft.functions.Pq.encode(emb, cb)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    def ids(margin: Double): Set[(Long, Long)] =
      graft.functions.Pq.rangeSearch(encoded, cb, queries,
        minCosine = 0.2, margin = margin).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every returned row satisfies the exact radius regardless of margin
    graft.functions.Pq.rangeSearch(encoded, cb, queries, 0.2, 0.05).collect()
      .foreach(r => assert(r.getAs[Double]("cosine") >= 0.2))
    // margin=2 exceeds any possible ADC error on cosines in [-1,1]: the
    // prefilter passes everything, so the result IS the exhaustive radius
    val exhaustive = ids(2.0)
    val tight = ids(0.05)
    val wide = ids(0.25)
    // recall grows monotonically with margin and stays radius-sound
    assert(tight.subsetOf(wide) && wide.subsetOf(exhaustive))
    // the query's production margin keeps a usable fraction at this
    // (deliberately coarse: m=8, k=16 on sf0.001) codebook
    assert(tight.size >= (exhaustive.size * 0.4).toInt,
      s"recall collapsed: ${tight.size}/${exhaustive.size}")
  }

  test("int8 ADC search tracks exact-cosine ranking closely") {
    import org.apache.spark.sql.functions._
    val rows = SimilarityQueries.simAnnInt8.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // dequantized-bin-center cosine is within the scalar-quantization
    // error envelope of the true cosine for each returned neighbor
    val emb = graft.functions.AnnIndexes.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.foreach { r =>
      val exact = cos(emb(r.getAs[Long]("query_id")), emb(r.getAs[Long]("vec_id")))
      assert(math.abs(r.getAs[Double]("approx_cos") - exact) < 0.05,
        s"int8 approx drifted: ${r.getAs[Double]("approx_cos")} vs $exact")
    }
  }

  test("sim_ann_ivf_persisted answers identically to the in-memory sim_ann_ivf") {
    val mem = SimilarityQueries.simAnnIvf.fn(spark, sfDir).collect()
    val per = SimilarityQueries.simAnnIvfPersisted.fn(spark, sfDir).collect()
    assert(per.toSeq === mem.toSeq)
    // and a second call serves from the already-persisted tables
    val again = SimilarityQueries.simAnnIvfPersisted.fn(spark, sfDir).collect()
    assert(again.toSeq === mem.toSeq)
  }

  test("OPQ rotation: exact in float, orthogonal (cosines preserved to fold-order ulps)") {
    import spark.implicits._
    val perm = Vectors.opqPerm(64)
    // a signed permutation must be a bijection on dims
    assert(perm.sorted.toSeq === (0 until 64))
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings").limit(50)
    val rot = emb.select($"vec_id", Vectors.opqRotate($"embedding").as("re"),
      $"embedding")
    val both = rot.as("a").crossJoin(rot.as("b"))
      .where(col("a.vec_id") < col("b.vec_id")).limit(100)
      .select(
        Vectors.cosine(col("a.embedding"), col("b.embedding")).as("orig"),
        Vectors.cosine(col("a.re"), col("b.re")).as("rotated"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"rotation changed a cosine beyond fold-order noise: $r")
    }
  }

  test("sim_ann_opq returns ranked neighbors for every query") {
    val rows = SimilarityQueries.simAnnOpq.fn(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      val rnks = rs.map(_.getAs[Long]("rnk")).toSeq
      assert(rnks.distinct.size === rnks.size)
      assert(rnks.forall(r => r >= 1L && r <= 5L))
      assert(rs.forall(_.getAs[Double]("cosine") <= 1.0 + 1e-12))
    }
  }

  test("sim_ann_int8_persisted: byte-typed codes table, answers == in-query int8 search") {
    val inQuery = SimilarityQueries.simAnnInt8.fn(spark, sfDir).collect()
    val persisted = SimilarityQueries.simAnnInt8Persisted.fn(spark, sfDir).collect()
    assert(persisted.toSeq === inQuery.toSeq)
    val (codes, stats) = graft.functions.AnnIndexes.int8Persisted(spark, sfDir)
    val codesField = codes.schema("codes").dataType
    assert(codesField ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false) ||
      codesField ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true))
    assert(stats.length === 64)
    assert(stats.forall { case (mn, mx) => mn < mx })
  }

  test("batch IVF with all cells probed equals per-query exhaustive search") {
    import spark.implicits._
    val emb = graft.api.Tables.load(spark, sfDir, "embeddings")
    val index = graft.functions.Ivf.build(spark, emb, k = 8)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val batch = graft.functions.Ivf.searchBatch(index, queries, topK = 5, nProbe = 8)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("vec_id")).toSeq)
      .toMap
    for (qid <- 0L until 3L) {
      val q = emb.filter($"vec_id" === qid)
        .select($"embedding").collect()(0).getSeq[Float](0).toArray
      val single = graft.functions.Ivf.search(index, q, 5, nProbe = 8)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(batch(qid) === single, s"query $qid: batch != single-query search")
    }
  }
}
