package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mm.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: binary schema, stub decode determinism, frame
  * slicing arithmetic. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media =
    Multimodal.mediaTable(Tables.load(spark, TestSpark.sf("sf0.001"), "documents"))

  test("media table: binary payload with prunable metadata") {
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("media") == "binary")
    assert(schema("n_bytes") == "bigint")
    assert(media.where($"n_bytes" <= 0).count() == 0)
  }

  test("stub decode: deterministic, L1-normalized 16-bin features") {
    val feats = Multimodal.extractFeatures(spark, media.limit(50)).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, "histogram not normalized")
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, media.limit(50)).collect()
    assert(feats.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("histogram count recovery is integer-exact for long docs (>2000 chars)") {
    // mm_features recovers bin COUNTS via round(f * n_bytes); that must be
    // exact for documents far beyond the current fixture's max length
    // (float32 error cnt*2^-23 < 0.5 up to ~4M chars). Pin with a 5000-char
    // doc so a fixture/SF growth can never silently break oracle parity.
    val text = (0 until 5000).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val docs = Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
    val feats = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs)).collect()
    assert(feats.length == 1 && feats.head.n_bytes == 5000L)
    val recovered = feats.head.features.map(f => math.round(f * 5000L))
    val expected = new Array[Long](16)
    text.foreach(c => expected(c.toInt % 16) += 1L)
    assert(recovered.toSeq == expected.toSeq)
    assert(recovered.sum == 5000L)
  }

  test("phash: 63-bit, deterministic, and degenerate payloads hash to 0") {
    val ph = Multimodal.perceptualHashes(spark, media)
      .as[(Long, Long)].collect().toMap
    assert(ph.values.forall(h => h >= 0L), "phash must stay a positive BIGINT")
    val again = Multimodal.perceptualHashes(spark, media)
      .as[(Long, Long)].collect().toMap
    assert(ph == again)
    val tiny = Seq((1L, "x", "en"), (2L, "", "en")).toDF("doc_id", "text", "lang")
    // sub-bigram payloads define to 0 on both engine and oracle
    val th = Multimodal.perceptualHashes(spark, Multimodal.mediaTable(tiny))
      .as[(Long, Long)].collect().toMap
    assert(th.values.toSet == Set(0L))
  }

  test("phash banded LSH finds exactly the brute-force hamming pairs") {
    val banded = Multimodal.phashNearDupPairs(spark, media, maxHamming = 2)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    val ph = Multimodal.perceptualHashes(spark, media)
      .as[(Long, Long)].collect()
    val brute = (for {
      (ida, pa) <- ph; (idb, pb) <- ph
      if ida < idb && java.lang.Long.bitCount(pa ^ pb) <= 2
    } yield (ida, idb)).toSet
    assert(banded == brute, "bit-sampling LSH must be lossless at its hamming budget")
    assert(brute.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("incremental phash equals the full pipeline restricted to the delta") {
    val full = Multimodal.phashNearDupPairs(spark, media, maxHamming = 2)
      .select("media_a", "media_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val expected = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    val incr = Multimodal.phashNearDupPairsIncremental(spark,
        history = media.where($"media_id" % 2 === 0),
        delta = media.where($"media_id" % 2 === 1),
        maxHamming = 2)
      .select("media_a", "media_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(incr == expected)
    // a precomputed history hash table gives the identical result
    val stored = Multimodal.perceptualHashes(
      spark, media.where($"media_id" % 2 === 0))
    val viaStored = Multimodal.phashNearDupPairsIncremental(spark,
        history = media.limit(0),
        delta = media.where($"media_id" % 2 === 1),
        maxHamming = 2, historyHashes = Some(stored))
      .select("media_a", "media_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(viaStored == expected)
  }

  test("PNG roundtrip is lossless and the real decode kernel matches driver math") {
    import graft.mm.ImagePhash
    // losslessness is what lets the SQL oracle replay a REAL decoder
    (0L until 50L).foreach { id =>
      val grid = ImagePhash.pixelGrid(id)
      assert(ImagePhash.decodeGray(ImagePhash.encodePng(grid)).sameElements(grid),
        s"PNG roundtrip not exact for id $id")
    }
    // the engine pipeline (generate → binary column → decode → DCT) must
    // equal the driver-side pure computation on the grid
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
    val png = Multimodal.pngMediaTable(spark, docs)
    assert(png.select("format").distinct().as[String].collect().toSeq == Seq("image/png"))
    // payloads are genuine PNG containers (magic bytes)
    val magic = png.limit(5).select("media").as[Array[Byte]].collect()
    magic.foreach(b => assert(
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G',
      "payload is not a PNG container"))
    val engine = Multimodal.perceptualHashes(spark, png)
      .as[(Long, Long)].collect().toMap
    engine.foreach { case (id, h) =>
      assert(h == ImagePhash.phash(ImagePhash.pixelGrid(id)),
        s"decoded-pixel phash diverges from grid phash for id $id")
      assert(h >= 0L)
    }
  }

  test("pixel formula domain: exact at MaxId's worst corner, rejected beyond") {
    import graft.mm.ImagePhash
    // the bound must cover the largest x/y addends too — the pert
    // polynomial at (MaxId, 31, 31) stays in Long range (a wrap would
    // make pert negative and silently drop inversions)
    val corner = ImagePhash.MaxId * 1315423911L +
      31L * 2654435741L + 31L * 2246822519L
    assert(corner > 0, "pert polynomial overflowed inside the guarded domain")
    val px = ImagePhash.pixel(ImagePhash.MaxId, 31, 31)
    assert(px >= 0 && px <= 254)
    val e = intercept[IllegalArgumentException] {
      ImagePhash.pixel(ImagePhash.MaxId + 1, 0, 0)
    }
    assert(e.getMessage.contains("outside the pixel formula's exact domain"))
  }

  test("real-image banded LSH is lossless and features histogram the decoded pixels") {
    import graft.mm.ImagePhash
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
    val png = Multimodal.pngMediaTable(spark, docs)
    val banded = Multimodal.phashNearDupPairs(spark, png, maxHamming = 2)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    val ph = Multimodal.perceptualHashes(spark, png).as[(Long, Long)].collect()
    val brute = (for {
      (ida, pa) <- ph; (idb, pb) <- ph
      if ida < idb && java.lang.Long.bitCount(pa ^ pb) <= 2
    } yield (ida, idb)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty,
      "planted same-family PNG renditions should yield near-dup pairs")
    // features: decoded-pixel histogram, counts exactly recoverable
    // (1024 = 2^10 so cnt/1024 is float32-exact)
    val feats = Multimodal.extractFeatures(spark, png.limit(20)).collect()
    feats.foreach { f =>
      val expected = new Array[Long](16)
      ImagePhash.pixelGrid(f.media_id).foreach(p => expected(p / 16) += 1L)
      assert(f.features.map(x => math.round(x * 1024f).toLong).toSeq == expected.toSeq)
    }
  }

  test("real resize pools exactly and the re-encoded 16x16 PNG holds the intended raster") {
    import graft.mm.ImagePhash
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents").limit(30)
    val resized = Multimodal.resize(
      spark, Multimodal.pngMediaTable(spark, docs), factor = 2)
    val stats = Multimodal.imageStats(spark, resized)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 30)
    stats.foreach { case (id, side, s, mn, mx) =>
      assert(side == 16L)
      val pooled = ImagePhash.downsample(ImagePhash.pixelGrid(id), 32, 2)
      assert(s == pooled.foldLeft(0L)(_ + _), s"pixel sum diverges for id $id")
      assert(mn == pooled.min && mx == pooled.max)
    }
    // the resized payloads are genuine standalone PNG containers
    val bytes = resized.limit(3).select("media").as[Array[Byte]].collect()
    bytes.foreach(b => assert((b(0) & 0xff) == 0x89 && b(1) == 'P'))
  }

  test("kernels dispatch per row on a mixed-format media table") {
    import graft.mm.ImagePhash
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents").limit(20)
    val mixed = Multimodal.pngMediaTable(spark, docs.where($"doc_id" % 2 === 0))
      .unionByName(Multimodal.mediaTable(docs.where($"doc_id" % 2 === 1)))
    val ph = Multimodal.perceptualHashes(spark, mixed)
      .as[(Long, Long)].collect().toMap
    // fallback reference: the all-fake table routes every row to the stub
    val stubRef = Multimodal.perceptualHashes(
        spark, Multimodal.mediaTable(docs.where($"doc_id" % 2 === 1)))
      .as[(Long, Long)].collect().toMap
    ph.foreach { case (id, h) =>
      if (id % 2 == 0)
        assert(h == ImagePhash.phash(ImagePhash.pixelGrid(id)),
          s"even id $id should take the real PNG path")
      else
        assert(h == stubRef(id), s"odd id $id should take the byte-stub fallback")
    }
  }

  test("WAV roundtrip is lossless and the real decode kernel matches driver math") {
    import graft.mm.AudioFingerprint
    // losslessness is what lets the SQL oracle replay a REAL audio decoder
    (0L until 50L).foreach { id =>
      val s = AudioFingerprint.pcm(id)
      assert(AudioFingerprint.decodePcm(AudioFingerprint.encodeWav(s)).sameElements(s),
        s"WAV roundtrip not exact for id $id")
    }
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
    val wav = Multimodal.wavMediaTable(spark, docs)
    assert(wav.select("format").distinct().as[String].collect().toSeq == Seq("audio/wav"))
    // payloads are genuine RIFF/WAVE containers (magic bytes)
    val magic = wav.limit(5).select("media").as[Array[Byte]].collect()
    magic.foreach { b =>
      assert(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F',
        "payload is not a RIFF container")
      assert(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
        "RIFF payload is not WAVE")
    }
    // the engine pipeline (generate → binary column → decode → fingerprint)
    // must equal the driver-side pure computation on the samples
    val engine = Multimodal.perceptualHashes(spark, wav)
      .as[(Long, Long)].collect().toMap
    engine.foreach { case (id, h) =>
      assert(h == AudioFingerprint.fingerprint(AudioFingerprint.pcm(id)),
        s"decoded-sample fingerprint diverges from pcm fingerprint for id $id")
      assert(h >= 0L, "fingerprint must stay a positive BIGINT")
    }
  }

  test("audio banded LSH is lossless and features histogram the decoded samples") {
    import graft.mm.AudioFingerprint
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
    val wav = Multimodal.wavMediaTable(spark, docs)
    val banded = Multimodal.phashNearDupPairs(spark, wav, maxHamming = 2)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    val fp = Multimodal.perceptualHashes(spark, wav).as[(Long, Long)].collect()
    val brute = (for {
      (ida, pa) <- fp; (idb, pb) <- fp
      if ida < idb && java.lang.Long.bitCount(pa ^ pb) <= 2
    } yield (ida, idb)).toSet
    assert(banded == brute, "bit-sampling LSH must be lossless at its hamming budget")
    assert(brute.nonEmpty,
      "planted same-family WAV renditions should yield near-dup pairs")
    // features: decoded-sample histogram, counts exactly recoverable via
    // round(f * 1280) (float32 error 1280*2^-24 << 0.5)
    val feats = Multimodal.extractFeatures(spark, wav.limit(20)).collect()
    feats.foreach { f =>
      val expected = new Array[Long](16)
      AudioFingerprint.pcm(f.media_id).foreach(s => expected((s + 32768) / 4096) += 1L)
      assert(f.features.map(x =>
        math.round(x * AudioFingerprint.Samples.toFloat).toLong).toSeq == expected.toSeq)
    }
  }

  test("sample formula domain: exact at MaxId's worst corner, rejected beyond") {
    import graft.mm.AudioFingerprint
    val corner = AudioFingerprint.MaxId * 1315423911L +
      (AudioFingerprint.Samples - 1).toLong * 2654435741L
    assert(corner > 0, "pert polynomial overflowed inside the guarded domain")
    val s = AudioFingerprint.sample(AudioFingerprint.MaxId, AudioFingerprint.Samples - 1)
    assert(s >= -32768 && s <= 32767, "sample left the int16 range")
    val e = intercept[IllegalArgumentException] {
      AudioFingerprint.sample(AudioFingerprint.MaxId + 1, 0)
    }
    assert(e.getMessage.contains("outside the sample formula's exact domain"))
    // the xor-0xFFF perturbation is closed over int16 at the extremes
    assert((-32768L ^ 0xFFFL) >= -32768L && (-32768L ^ 0xFFFL) <= 32767L)
    assert((32767L ^ 0xFFFL) >= -32768L && (32767L ^ 0xFFFL) <= 32767L)
  }

  test("GIF roundtrip is lossless per frame and the real decode kernel matches driver math") {
    import graft.mm.VideoFingerprint
    // palette-GIF losslessness (identity gray ramp + color-value readback)
    // is what lets the SQL oracle replay a REAL multi-frame decoder
    (0L until 50L).foreach { id =>
      val c = VideoFingerprint.clip(id)
      val back = VideoFingerprint.decodeFrames(VideoFingerprint.encodeGif(c))
      assert(back.length == VideoFingerprint.Frames,
        s"frame count lost for id $id")
      assert(c.zip(back).forall { case (a, b) => a.sameElements(b) },
        s"GIF roundtrip not lossless for id $id")
    }
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
    val gif = Multimodal.gifMediaTable(spark, docs)
    assert(gif.select("format").distinct().as[String].collect().toSeq == Seq("video/gif"))
    // payloads are genuine GIF containers (magic bytes)
    val magic = gif.limit(5).select("media").as[Array[Byte]].collect()
    magic.foreach(b => assert(new String(b.take(6), "US-ASCII").startsWith("GIF8"),
      "payload is not a GIF container"))
    // engine pipeline (generate → binary column → decode → fingerprint)
    // equals the driver-side pure computation on the frames
    val engine = Multimodal.perceptualHashes(spark, gif)
      .as[(Long, Long)].collect().toMap
    engine.foreach { case (id, h) =>
      assert(h == VideoFingerprint.fingerprint(VideoFingerprint.clip(id)),
        s"decoded-frame fingerprint diverges from clip fingerprint for id $id")
      assert(h >= 0L, "fingerprint must stay a positive BIGINT")
    }
  }

  test("video banded LSH is lossless; frame stats and features read the decoded frames") {
    import graft.mm.VideoFingerprint
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
    val gif = Multimodal.gifMediaTable(spark, docs)
    val banded = Multimodal.phashNearDupPairs(spark, gif, maxHamming = 2)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    val fp = Multimodal.perceptualHashes(spark, gif).as[(Long, Long)].collect()
    val brute = (for {
      (ida, pa) <- fp; (idb, pb) <- fp
      if ida < idb && java.lang.Long.bitCount(pa ^ pb) <= 2
    } yield (ida, idb)).toSet
    assert(banded == brute, "bit-sampling LSH must be lossless at its hamming budget")
    assert(brute.nonEmpty,
      "planted same-family GIF renditions should yield near-dup pairs")
    // frame extraction: one row per decoded frame with exact pixel stats
    val stats = Multimodal.videoFrameStats(spark, gif.limit(10))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 10 * VideoFingerprint.Frames)
    stats.foreach { case (id, f, s, mn, mx) =>
      val grid = VideoFingerprint.frameGrid(id, f.toInt)
      assert(s == grid.foldLeft(0L)(_ + _), s"frame sum diverges for ($id, $f)")
      assert(mn == grid.min && mx == grid.max)
    }
    // features: all-frame pixel histogram, counts exactly recoverable
    val nPx = VideoFingerprint.Frames * VideoFingerprint.Side * VideoFingerprint.Side
    val feats = Multimodal.extractFeatures(spark, gif.limit(10)).collect()
    feats.foreach { ft =>
      val expected = new Array[Long](16)
      (0 until VideoFingerprint.Frames).foreach(f =>
        VideoFingerprint.frameGrid(ft.media_id, f).foreach(p => expected(p / 16) += 1L))
      assert(ft.features.map(x => math.round(x * nPx).toLong).toSeq == expected.toSeq)
    }
  }

  test("frame sampling: n frames per item, within payload bounds") {
    val frames = Multimodal.sampleFrames(media, n = 4, frameBytes = 16)
    val counts = frames.groupBy("media_id").count().select("count").distinct()
      .as[Long].collect().toSeq
    assert(counts == Seq(4L))
    val bad = frames
      .withColumn("flen", octet_length($"frame"))
      .where($"flen" <= 0 || $"flen" > 16)
    assert(bad.count() == 0)
  }

  test("encode-stage parallelism matches the measured per-modality decision") {
    // The generator corpora come from a one-split parquet scan; the GIF
    // and PNG encode kernels are expensive enough that Multimodal spreads
    // the ids across defaultParallelism first, while the cheap WAV
    // encoder stays on the scan's own splits (the exchange costs more
    // than it saves — measured A/B in spreadIds' scaladoc). Pin the plan
    // shape so a refactor can't silently serialize the expensive kernels
    // or re-tax the cheap one.
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
    val par = spark.sparkContext.defaultParallelism
    assert(Multimodal.gifMediaTable(spark, docs).rdd.getNumPartitions == par,
      "GIF encode stage must run at full parallelism")
    assert(Multimodal.pngMediaTable(spark, docs).rdd.getNumPartitions == par,
      "PNG encode stage must run at full parallelism")
    val wavPlan = Multimodal.wavMediaTable(spark, docs)
      .queryExecution.executedPlan.toString
    assert(!wavPlan.contains("Exchange"),
      s"WAV encode stage must stay exchange-free (scan splits only):\n$wavPlan")
  }

  test("_incr media splits filter ids below the encode kernel") {
    // The _incr registry queries split the corpus into history/delta by
    // filtering doc_ids BEFORE the media builders. A media_id filter
    // placed ABOVE the builder cannot push below the opaque mapPartitions
    // kernel, so each branch would encode the FULL corpus and discard
    // half — doubling exactly the most expensive stage (GIF ~1.5 ms/clip).
    // Pin the shape ON THE REGISTRY QUERIES THEMSELVES: no Filter node may
    // sit above a MapPartitions kernel anywhere in their plans, including
    // inside the incremental pipeline's persisted (cached) subplans —
    // which is exactly where a reverted post-builder filter would hide.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, MapPartitions => LMapPartitions}
    import org.apache.spark.sql.execution.{FilterExec, MapPartitionsExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    def badPhysical(p: SparkPlan): Boolean =
      p.collect {
        case a: AdaptiveSparkPlanExec => badPhysical(a.inputPlan)
        case s: InMemoryTableScanExec => badPhysical(s.relation.cachedPlan)
        case f: FilterExec if f.find(_.isInstanceOf[MapPartitionsExec]).isDefined => true
      }.contains(true)
    def badLogical(p: LogicalPlan): Boolean =
      p.collect {
        case f: LFilter if f.find(_.isInstanceOf[LMapPartitions]).isDefined => true
        case imr: InMemoryRelation => badPhysical(imr.cachedPlan)
      }.contains(true)
    def filterAboveKernel(df: org.apache.spark.sql.DataFrame): Boolean =
      badLogical(df.queryExecution.optimizedPlan)
    try {
      Seq("mm_phash_incr", "mm_audio_incr", "mm_video_incr").foreach { q =>
        val df = SparkEntry.queries(q)(spark, TestSpark.sf("sf0.001"))
        assert(!filterAboveKernel(df),
          s"$q must split the corpus before the encode kernel")
      }
      val real = Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
      // builder halves stay clean and correctly restricted
      val builders = Seq[(org.apache.spark.sql.SparkSession, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame](
        Multimodal.pngMediaTable _, Multimodal.wavMediaTable _, Multimodal.gifMediaTable _)
      builders.foreach { build =>
        val half = build(spark, real.where($"doc_id" % 2 === 0))
        assert(!filterAboveKernel(half),
          "pre-builder doc_id split must keep the encode kernel half-sized")
        assert(half.where($"media_id" % 2 =!= 0).count() == 0)
      }
      // the detector detects the bad shapes it guards against: a bare
      // post-builder filter, and the same shape buried under persist()
      assert(filterAboveKernel(
        Multimodal.gifMediaTable(spark, real).where($"media_id" % 2 === 0)))
      val cachedBad = Multimodal.wavMediaTable(spark, real)
        .where($"media_id" % 2 === 1).persist()
      try assert(filterAboveKernel(cachedBad.select("media_id")))
      finally cachedBad.unpersist()
    } finally spark.catalog.clearCache()
  }

  test("thread-local codec state is safe under concurrent encode/decode") {
    // The codecs reuse per-thread writers/readers/scratch buffers
    // (registry lookups and allocations once per task, not once per row).
    // Prove reuse can't bleed state across rows or threads: many threads
    // encoding+decoding DIFFERENT ids concurrently, repeatedly, must
    // reproduce the serial results bit-for-bit for all three modalities.
    import graft.mm.{AudioFingerprint, ImagePhash, VideoFingerprint}
    val ids = (0L until 64L).toVector
    val serialPng = ids.map(id => ImagePhash.phashImage(
      ImagePhash.encodePng(ImagePhash.pixelGrid(id))))
    val serialWav = ids.map(id => AudioFingerprint.fingerprintWav(
      AudioFingerprint.encodeWav(AudioFingerprint.pcm(id))))
    val serialGif = ids.map(id => VideoFingerprint.fingerprintGif(
      VideoFingerprint.encodeGif(VideoFingerprint.clip(id))))
    val firstFailure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    (1 to 3).foreach { _ =>
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          // a thread assertion would otherwise die silently — capture it
          try {
            // each thread walks the ids at a different offset so distinct
            // threads hit distinct ids at the same instant
            ids.indices.foreach { i =>
              val id = ids((i + t * 7) % ids.size)
              assert(ImagePhash.phashImage(ImagePhash.encodePng(
                ImagePhash.pixelGrid(id))) == serialPng(id.toInt))
              assert(AudioFingerprint.fingerprintWav(AudioFingerprint.encodeWav(
                AudioFingerprint.pcm(id))) == serialWav(id.toInt))
              assert(VideoFingerprint.fingerprintGif(VideoFingerprint.encodeGif(
                VideoFingerprint.clip(id))) == serialGif(id.toInt))
            }
          } catch { case e: Throwable => firstFailure.compareAndSet(null, e) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      if (firstFailure.get() != null) throw firstFailure.get()
    }
  }
}
