package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.streaming.StreamingFreshness

class MultimodalStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media table: binary payload, deterministic kind rotation") {
    val media = Multimodal.mediaTable(
      Tables.documents(spark, TestSpark.sf), "doc_id", "text", "source")
    assert(media.schema("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    val k0 = media.filter($"media_id" === 0).select("kind").as[String].head()
    assert(k0 == "image")
  }

  test("decodeFeatures: batched mapPartitions plumbing, deterministic stub fallback") {
    val media = Multimodal.mediaTable(
      Tables.documents(spark, TestSpark.sf), "doc_id", "text", "source")
    val feats = Multimodal.decodeFeatures(spark, media, partitions = 4, batchSize = 32)
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(f => f.n_bytes > 0 && f.sha256.length == 64))
    assert(rows.forall(f => f.width >= 64 && f.height >= 64))
    assert(rows.filter(_.kind == "image").forall(_.duration_ms == 0L))
    // text payloads match no imageio reader → every row is stub-derived
    assert(rows.forall(_.format == "synthetic"))
    // determinism: second run identical
    val again = Multimodal.decodeFeatures(spark, media, 4, 32).collect()
    assert(rows.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("imageio codec: real PNG/JPEG payloads yield true dimensions and format") {
    val png = {
      val in = getClass.getResourceAsStream("/graft/fixture_1x1.png")
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1024)
        Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
          .foreach(n => out.write(buf, 0, n))
        out.toByteArray
      } finally in.close()
    }
    val jpg = { // 5×3 JPEG rendered in memory by the JDK encoder
      val img = new java.awt.image.BufferedImage(
        5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaItem(1L, "image", png, "fixture"),
      Multimodal.MediaItem(2L, "image", jpg, "fixture"),
      Multimodal.MediaItem(3L, "image", "not an image".getBytes("UTF-8"), "fixture"),
      Multimodal.MediaItem(4L, "audio", png, "fixture")) // audio kind: never probed
    val feats = Multimodal.decodeImageIO(media).map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 1 && feats(1L).height == 1 && feats(1L).format == "png")
    assert(feats(2L).width == 5 && feats(2L).height == 3 && feats(2L).format == "jpeg")
    assert(feats(3L).format == "synthetic") // unrecognized → stub fallback
    assert(feats(4L).format == "synthetic")
    // the same codec through the distributed batched path
    val dist = Multimodal.decodeFeatures(spark, media.toDS().toDF(),
        partitions = 2, batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(dist(1L).width == 1 && dist(1L).format == "png")
    assert(dist(2L).width == 5 && dist(2L).height == 3 && dist(2L).format == "jpeg")
  }

  test("patchTokens: ceil(w/P)*ceil(h/P)+1, exact at boundaries and odd patch sizes") {
    val rows = Seq(
      (224, 224), // canonical ViT-B input: 14*14+1 = 197
      (225, 224), // one pixel over -> 15*14+1
      (16, 16),   // exactly one patch
      (1, 1),     // sub-patch image still costs one patch
      (1023, 65)) // larger dims
      .toDF("w", "h")
    val got = rows.select(
      Multimodal.patchTokens($"w", $"h").as("t16"),
      Multimodal.patchTokens($"w", $"h", 14).as("t14"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def expect(w: Int, h: Int, p: Int) =
      ((w + p - 1) / p).toLong * ((h + p - 1) / p) + 1
    val want = Seq((224, 224), (225, 224), (16, 16), (1, 1), (1023, 65))
      .map { case (w, h) => (expect(w, h, 16), expect(w, h, 14)) }
    assert(got.toSeq == want)
    assert(got.head._1 == 197L, "224x224 at P=16 is the canonical 197 tokens")
    // composes with the real decode path's dimension columns
    val media = Multimodal.mediaTable(
      Seq((0L, "payload bytes", "s")).toDF("id", "text", "src"),
      "id", "text", "src")
    val feat = Multimodal.decodeFeatures(spark, media, partitions = 1)
      .select(Multimodal.patchTokens($"width", $"height").as("t")).head()
    assert(feat.getLong(0) >= 2L)
  }

  test("audioTokens/videoTokens: ceil(ms*R/1000) and frames*patches, exact at boundaries") {
    val rows = Seq(
      (1000L, 224, 224),  // exactly 1 s -> 50 tokens at R=50
      (1001L, 224, 224),  // one ms over -> 51
      (20L, 16, 16),      // one acoustic frame
      (0L, 1, 1))         // zero duration -> zero tokens
      .toDF("ms", "w", "h")
    val got = rows.select(
      Multimodal.audioTokens($"ms").as("a50"),
      Multimodal.audioTokens($"ms", 25).as("a25"),
      Multimodal.videoTokens($"w", $"h").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def ceilDiv(x: Long, d: Long) = (x + d - 1) / d
    val want = Seq((1000L, 224, 224), (1001L, 224, 224), (20L, 16, 16), (0L, 1, 1))
      .map { case (ms, w, h) =>
        (ceilDiv(ms * 50, 1000), ceilDiv(ms * 25, 1000),
          8L * (ceilDiv(w, 16) * ceilDiv(h, 16) + 1)) }
    assert(got.toSeq == want)
    assert(got.head._1 == 50L && got(1)._1 == 51L)
    assert(got.head._3 == 8L * 197L, "8 frames of the canonical 197-token image")
    // corrupt probes (negative dims/duration) NULL out instead of
    // producing positive-looking nonsense that would skew a budget
    val bad = Seq((-200, 224, -5L)).toDF("w", "h", "ms")
      .select(Multimodal.patchTokens($"w", $"h"),
        Multimodal.videoTokens($"w", $"h"),
        Multimodal.audioTokens($"ms")).head()
    assert(bad.isNullAt(0) && bad.isNullAt(1) && bad.isNullAt(2))
    // exactness at the extremes of the floor'd-double-division domain
    // (scaladoc: exact for every numerator ms*R+999 <= 2^53, not only
    // multiples of 1000). Probe the guard extremes (60 s cap), the
    // worst-case r=1 and r=999 remainders near the domain ceiling, and
    // the ceiling itself for both shipped rates.
    val twoP53 = 1L << 53
    for (r <- Seq(25, 50)) {
      val ceilMs = (twoP53 - 999L) / r
      val probes = Seq(60000L, 60001L, ceilMs, ceilMs - 1,
        // remainders 1 and 999 mod 1000 at large magnitude
        (ceilMs / 1000) * 1000 / r * r + 1, ceilMs - 999)
        .filter(ms => ms >= 0 && ms * r + 999 <= twoP53)
      val gotX = probes.toDF("ms")
        .select($"ms", Multimodal.audioTokens($"ms", r).as("t"))
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      probes.foreach { ms =>
        val want = (BigInt(ms) * r + 999) / 1000
        assert(BigInt(gotX(ms)) == want,
          s"audioTokens($ms, $r) = ${gotX(ms)}, want $want")
      }
    }
  }

  test("synthesizeWav/probeWav: exact duration round-trip; malformed payloads fall back, never throw") {
    import graft.operators.Multimodal
    // exact recovery across the stand-in duration domain incl. the
    // guard extremes and a non-multiple-of-1000 value
    Seq(0L, 1L, 999L, 1000L, 1001L, 60999L, 3600000L).foreach { ms =>
      val bytes = Multimodal.synthesizeWav(ms)
      assert(Multimodal.probeWav(bytes).contains(ms),
        s"WAV round-trip must be exact at $ms ms")
    }
    // malformed inputs: None (stub fallback), never an exception
    assert(Multimodal.probeWav(Array.emptyByteArray).isEmpty)
    assert(Multimodal.probeWav("not a riff header at all........................"
      .getBytes("US-ASCII")).isEmpty)
    val truncated = Multimodal.synthesizeWav(5000L).take(20)
    assert(Multimodal.probeWav(truncated).isEmpty)
    // a RIFF header with a lying chunk size must not loop or throw
    val lying = Multimodal.synthesizeWav(10L)
    val bb = java.nio.ByteBuffer.wrap(lying)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue - 2) // data chunk size absurdly large
    assert(Multimodal.probeWav(lying).contains(
      ((Int.MaxValue - 2).toLong * 1000L) / 8000L)
      || Multimodal.probeWav(lying).isEmpty)
    // the default codec routes audio through the probe: real WAV
    // payloads decode with format 'wav' and the TRUE duration; text
    // bytes fall back to the stub
    val items = Seq(
      Multimodal.MediaItem(1L, "audio", Multimodal.synthesizeWav(2500L), "s"),
      Multimodal.MediaItem(2L, "audio", "plain text bytes".getBytes("UTF-8"), "s"))
    val feats = Multimodal.decodeImageIO(items).map(f => f.media_id -> f).toMap
    assert(feats(1L).format == "wav" && feats(1L).duration_ms == 2500L)
    assert(feats(2L).format == "synthetic")
  }

  test("synthesizeMp4/probeMp4: exact (w, h, duration) round-trip; malformed boxes fall back") {
    import graft.operators.Multimodal
    // round-trip across the generator domain incl. corner dims and
    // durations (timescale 1000 makes ms exact)
    for ((w, h, ms) <- Seq((16, 16, 1L), (271, 16, 59999L),
        (1920, 1080, 3600000L), (1, 1, 0L), (0x7fff, 0x7fff, 123L))) {
      val got = Multimodal.probeMp4(Multimodal.synthesizeMp4(w, h, ms))
      assert(got.contains((w, h, ms)),
        s"mp4 round-trip at ${w}x$h, $ms ms: $got")
    }
    // malformed inputs: None, never an exception
    assert(Multimodal.probeMp4(Array.emptyByteArray).isEmpty)
    assert(Multimodal.probeMp4(
      Multimodal.synthesizeAvi(8, 8, 4)).isEmpty, "an AVI is not an mp4")
    assert(Multimodal.probeMp4(
      Multimodal.synthesizeWav(100L)).isEmpty, "a WAV is not an mp4")
    assert(Multimodal.probeMp4(
      Multimodal.synthesizeMp4(8, 8, 40L).take(30)).isEmpty, "truncated moov")
    assert(Multimodal.probeMp4(
      "ftypnot really a box layout at all.............".getBytes("US-ASCII"))
      .isEmpty, "ftyp text but no box sizes")
    // a lying box size (0xffffffff) must not wrap or throw
    val lying = Multimodal.synthesizeMp4(8, 8, 40L)
    java.nio.ByteBuffer.wrap(lying).putInt(20, -1) // moov size -> 4294967295
    assert(Multimodal.probeMp4(lying).isEmpty, "lying moov size")
    // largesize spelling (size == 1 + 64-bit size) parses: rewrite
    // the ftyp box as a largesize box and keep the rest intact
    val base = Multimodal.synthesizeMp4(64, 48, 2500L)
    val large = new Array[Byte](base.length + 8)
    System.arraycopy(base, 0, large, 0, 8)          // size+type of ftyp
    System.arraycopy(base, 8, large, 16, base.length - 8)
    val lb2 = java.nio.ByteBuffer.wrap(large)
    lb2.putInt(0, 1)        // size = 1 -> largesize follows type
    lb2.putLong(8, 28L)     // 20-byte ftyp + 8 for the largesize field
    assert(Multimodal.probeMp4(large).contains((64, 48, 2500L)),
      "largesize ftyp box")
    // a zero-dim (audio-style) first tkhd is skipped, not returned:
    // forge width=0 -> probe must refuse (single-trak payload)
    val forged = Multimodal.synthesizeMp4(8, 8, 40L)
    // tkhd width offset: 20 (ftyp) + 8 (moov hdr) + 108 (mvhd) +
    // 8 (trak hdr) + 8 (tkhd hdr) + 76 = 228
    java.nio.ByteBuffer.wrap(forged).putInt(228, 0)
    assert(Multimodal.probeMp4(forged).isEmpty, "zero-width video track")
    // the default codec prefers AVI, then mp4, then the stub
    val items = Seq(
      Multimodal.MediaItem(1L, "video", Multimodal.synthesizeMp4(320, 240, 1500L), "s"),
      Multimodal.MediaItem(2L, "video", "plain text bytes".getBytes("UTF-8"), "s"))
    val feats = Multimodal.decodeImageIO(items).map(f => f.media_id -> f).toMap
    assert(feats(1L).format == "mp4" && feats(1L).width == 320
      && feats(1L).height == 240 && feats(1L).duration_ms == 1500L)
    assert(feats(2L).format == "synthetic")
  }

  test("synthesizeM4a/probeBmffAudio: exact duration round-trip; probeMp4 refuses audio-only; dispatch routes wav/m4a/stub") {
    import graft.operators.Multimodal
    for (ms <- Seq(0L, 1L, 1000L, 59999L, 3600000L, Int.MaxValue.toLong)) {
      val m4a = Multimodal.synthesizeM4a(ms)
      assert(Multimodal.probeBmffAudio(m4a).contains(ms),
        s"m4a duration round-trip at $ms ms")
      // no video track -> the VIDEO probe must refuse the same bytes
      assert(Multimodal.probeMp4(m4a).isEmpty,
        s"probeMp4 must refuse an audio-only BMFF ($ms ms)")
    }
    // a video mp4's mvhd also yields a duration (a/v containers share
    // the movie header), and the WAV walk refuses BMFF bytes
    assert(Multimodal.probeBmffAudio(
      Multimodal.synthesizeMp4(64, 48, 2500L)).contains(2500L))
    assert(Multimodal.probeWav(Multimodal.synthesizeM4a(100L)).isEmpty)
    // malformed inputs: None, never an exception (shared-walk totality)
    assert(Multimodal.probeBmffAudio(Array.emptyByteArray).isEmpty)
    assert(Multimodal.probeBmffAudio(
      Multimodal.synthesizeWav(100L)).isEmpty, "a WAV is not BMFF")
    assert(Multimodal.probeBmffAudio(
      Multimodal.synthesizeM4a(40L).take(30)).isEmpty, "truncated moov")
    val lying = Multimodal.synthesizeM4a(40L)
    java.nio.ByteBuffer.wrap(lying).putInt(20, -1) // moov size -> 4294967295
    assert(Multimodal.probeBmffAudio(lying).isEmpty, "lying moov size")
    // the default codec's audio dispatch: WAV walk first, then the
    // BMFF mvhd walk, stub last
    val items = Seq(
      Multimodal.MediaItem(1L, "audio", Multimodal.synthesizeWav(2500L), "s"),
      Multimodal.MediaItem(2L, "audio", Multimodal.synthesizeM4a(1500L), "s"),
      Multimodal.MediaItem(3L, "audio", "plain text bytes".getBytes("UTF-8"), "s"))
    val feats = Multimodal.decodeImageIO(items).map(f => f.media_id -> f).toMap
    assert(feats(1L).format == "wav" && feats(1L).duration_ms == 2500L)
    assert(feats(2L).format == "m4a" && feats(2L).duration_ms == 1500L
      && feats(2L).width == 0 && feats(2L).height == 0)
    assert(feats(3L).format == "synthetic")
  }

  test("streamed media census: per-batch partials fold to exactly the batch census (seventh maintained surface)") {
    import graft.operators.Multimodal
    import graft.streaming.StreamingCuration
    val dir = java.nio.file.Files.createTempDirectory("media_census").toString
    val log = s"$dir/log"; val ckpt = s"$dir/ckpt"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Multimodal.MediaItem]
    val sq = StreamingCuration.mediaCensusSink(
      stream.toDF(), log, ckpt, partitions = 4)
    // all three real-container modalities + a stub-fallback payload,
    // across two sources, split across two micro-batches
    val batch1 = Seq(
      Multimodal.MediaItem(1L, "image", Multimodal.synthesizePng(64, 48), "web"),
      Multimodal.MediaItem(2L, "audio", Multimodal.synthesizeWav(2500L), "web"),
      Multimodal.MediaItem(3L, "video", Multimodal.synthesizeAvi(320, 240, 30), "books"),
      Multimodal.MediaItem(4L, "video", "not a container".getBytes("UTF-8"), "web"))
    val batch2 = Seq(
      Multimodal.MediaItem(5L, "video", Multimodal.synthesizeMp4(640, 480, 1500L), "web"),
      Multimodal.MediaItem(6L, "audio", Multimodal.synthesizeWav(750L), "books"),
      Multimodal.MediaItem(7L, "image", Multimodal.synthesizePng(17, 33), "web"))
    stream.addData(batch1); sq.processAllAvailable()
    stream.addData(batch2); sq.processAllAvailable()
    sq.stop()
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val streamed = keyed(StreamingCuration.readMediaCensus(spark, log))
    val batch = keyed(Multimodal.mediaTokenCensus(
      spark, (batch1 ++ batch2).toDF(), partitions = 4))
    assert(streamed == batch,
      s"folded per-batch media-census partials must equal the " +
        s"single-pass census: $streamed vs $batch")
    // the log really is per-batch partials: 2 batches appended
    // (kind, source) rows independently — web/video appears in both
    assert(spark.read.parquet(log)
      .filter(col("kind") === "video" && col("source") === "web")
      .count() == 2L, "each micro-batch appends its own partial row")
    // decode reality check rode through the stream: every real
    // container probed (only the text-bytes video row is synthetic)
    assert(streamed(("video", "web"))._2 == 1L
      && streamed(("video", "books"))._2 == 1L
      && streamed(("audio", "web"))._2 == 1L
      && streamed(("image", "web"))._2 == 2L)
  }

  test("synthesizeAvi/probeAvi: exact (w, h, duration) round-trip; malformed headers fall back") {
    import graft.operators.Multimodal
    // round-trip across the generator domain incl. corner dims and
    // the 1-frame / max-frame ends of the q208 convention
    for ((w, h, f, us) <- Seq((16, 16, 1, 33333), (271, 16, 240, 33333),
        (1920, 1080, 54000, 16667), (1, 1, 1, 1))) {
      val got = Multimodal.probeAvi(Multimodal.synthesizeAvi(w, h, f, us))
      assert(got.contains((w, h, us.toLong * f / 1000L)),
        s"AVI round-trip at ${w}x$h, $f frames @ $us us: $got")
    }
    // malformed inputs: None, never an exception
    assert(Multimodal.probeAvi(Array.emptyByteArray).isEmpty)
    assert(Multimodal.probeAvi(
      Multimodal.synthesizeWav(100L)).isEmpty, "a WAV is not an AVI")
    assert(Multimodal.probeAvi(
      Multimodal.synthesizeAvi(8, 8, 4).take(30)).isEmpty, "truncated header")
    // a lying top-level chunk size just under the Int.MaxValue-16
    // size check must not wrap the walk offset negative and re-enter
    // (the probeWav totality guard, mirrored): big-but-valid size,
    // offset 20 + size overflows Int
    val lyingTop = Multimodal.synthesizeAvi(8, 8, 4)
    java.nio.ByteBuffer.wrap(lyingTop)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue - 17) // hdrl LIST claims ~2GB
      .put(20, 'j'.toByte)           // ...and is not hdrl, so the walk skips it
    assert(Multimodal.probeAvi(lyingTop).isEmpty, "lying top-level chunk size")
    // same hole in the hdrl sub-walk: a non-avih sub chunk with a
    // near-max size wraps `sub` negative
    val lyingSub = Multimodal.synthesizeAvi(8, 8, 4)
    val lb = java.nio.ByteBuffer.wrap(lyingSub)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    lb.put(24, 'j'.toByte)             // avih -> jvih (skipped, walk continues)
    lb.putInt(28, Int.MaxValue - 17)   // sub-chunk claims ~2GB
    assert(Multimodal.probeAvi(lyingSub).isEmpty, "lying hdrl sub-chunk size")
    // zero/negative dims in a forged header are refused (stub wins)
    val forged = Multimodal.synthesizeAvi(8, 8, 4)
    java.nio.ByteBuffer.wrap(forged)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(24 + 8 + 32, 0)
    assert(Multimodal.probeAvi(forged).isEmpty)
    // the default codec routes video rows through the probe; text
    // bytes fall back to the stub
    val items = Seq(
      Multimodal.MediaItem(1L, "video", Multimodal.synthesizeAvi(64, 48, 30), "s"),
      Multimodal.MediaItem(2L, "video", "plain text bytes".getBytes("UTF-8"), "s"))
    val feats = Multimodal.decodeImageIO(items).map(f => f.media_id -> f).toMap
    assert(feats(1L).format == "avi" && feats(1L).width == 64
      && feats(1L).height == 48
      && feats(1L).duration_ms == 33333L * 30 / 1000)
    assert(feats(2L).format == "synthetic")
  }

  test("frame sampling: n rows per video") {
    val media = Multimodal.mediaTable(
      Tables.documents(spark, TestSpark.sf), "doc_id", "text", "source")
    val nVideos = media.filter($"kind" === "video").count()
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    assert(frames.count() == nVideos * 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_fingerprint"))
  }

  test("stateful freshness monitor: state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val sq = StreamingFreshness.freshnessMonitor(spark,
        stream.toDF().toDF("ts", "event_type", "user_id"))
      .writeStream.outputMode("update").format("memory").queryName("monitor_out")
      .start()

    stream.addData(Seq((t("2024-01-01 10:00:00"), "click", 1L),
      (t("2024-01-01 11:00:00"), "click", 2L), (t("2024-01-01 09:00:00"), "view", 3L)))
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 12:00:00"), "click", 1L)))
    sq.processAllAvailable()
    sq.stop()

    // latest state per key: counts accumulated, max advanced
    val latest = spark.table("monitor_out")
      .groupBy("event_type")
      .agg(max("total_count").as("n"), max("max_ts_micros").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(latest("click")._1 == 3L)
    assert(latest("click")._2 ==
      t("2024-01-01 12:00:00").getTime * 1000L)
    assert(latest("view")._1 == 1L)
  }

  test("streaming dedup: duplicate keys within the horizon are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val sq = StreamingFreshness.dedupStream(
        stream.toDF().toDF("ts", "doc_key"), Seq("doc_key"), "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .start()
    stream.addData(Seq(
      (t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:00:00"), 1L), // dup in batch
      (t("2024-01-01 10:05:00"), 2L)))
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 10:00:00"), 1L))) // dup across batches
    sq.processAllAvailable()
    sq.stop()
    assert(spark.table("dedup_out").count() == 2) // keys 1 and 2, once each
  }

  test("streaming sessionization: session_window closes on gap, emits on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val sq = StreamingFreshness.sessionizedCounts(
        stream.toDF().toDF("ts", "user_id"), "user_id", "30 minutes", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess_out")
      .start()
    stream.addData(Seq(
      (t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:10:00"), 1L),  // one session
      (t("2024-01-01 12:00:00"), 1L)))                                  // second session
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 15:00:00"), 2L)))  // advance watermark → close both
    sq.processAllAvailable()
    sq.stop()
    val rows = spark.table("sess_out")
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(rows.contains((1L, 2L)), "first session has 2 events")
    assert(rows.contains((1L, 1L)), "second session has 1 event")
  }

  test("streaming drift: watermarked census closes windows; scored drift equals batch categoricalDrift per window") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDrift
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val sq = StreamingDrift.windowedCategoryCensus(
        stream.toDF().toDF("ts", "cat"),
        "cat", "ts", windowLength = "1 hour", watermarkDelay = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("drift_census")
      .start()
    // window 10:00: a-heavy; window 11:00: b appears, c vanishes
    stream.addData(Seq(
      (t("2024-01-01 10:00:10"), "a"), (t("2024-01-01 10:10:00"), "a"),
      (t("2024-01-01 10:20:00"), "a"), (t("2024-01-01 10:30:00"), "c"),
      (t("2024-01-01 11:05:00"), "a"), (t("2024-01-01 11:15:00"), "b"),
      (t("2024-01-01 11:25:00"), "b")))
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 13:00:00"), "a"))) // advance watermark: close both
    sq.processAllAvailable()
    sq.stop()
    val census = spark.table("drift_census")
      .filter($"window_start" < t("2024-01-01 12:00:00"))
    assert(census.count() == 4, "two windows x their observed categories")
    // baseline: equal a/b/c mass
    val baseline = (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(10)("c"))
      .toDF("cat")
    val scored = StreamingDrift.scoreDrift(census, baseline, "cat")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    // spine covers every (window, baseline category): the vanished
    // 'b' in window 10 and 'c' in window 11 still contribute
    assert(scored.keySet.map(_._2) == Set("a", "b", "c"))
    assert(scored.size == 6)
    // per-window equality with the batch operator, cell by cell
    for (w <- Seq(t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"))) {
      val windowRows = census.filter($"window_start" === w)
        .select($"cat", $"n_current")
      // rebuild the current batch as raw rows for the batch operator
      val current = windowRows.collect()
        .flatMap(r => Seq.fill(r.getLong(1).toInt)(r.getString(0))).toSeq.toDF("cat")
      val batch = graft.operators.Checks.categoricalDrift(current, baseline, "cat")
        .collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
      batch.foreach { case (cat, chi) =>
        assert(scored((w, cat))._3 == chi,
          s"window $w cat $cat: streaming-scored $chi must equal batch")
      }
    }
  }

  test("streaming calibration: late data folds into its window; scored census equals batch calibrationReport") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCalibration
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, Double, Boolean)]
    val sq = StreamingCalibration.windowedBandCensus(
        stream.toDF().toDF("ts", "score", "label"),
        "score", "label", lo = 0.0, hi = 1.0, bins = 4,
        tsCol = "ts", windowLength = "1 hour", watermarkDelay = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("cal_census")
      .start()
    // window 10:00 — band 0: (0.1,T), band 3: (0.9,T),(0.95,F) and a clamp (1.7->band 3)
    stream.addData(Seq(
      (t("2024-01-01 10:05:00"), 0.1, true),
      (t("2024-01-01 10:10:00"), 0.9, true),
      (t("2024-01-01 10:20:00"), 0.95, false),
      (t("2024-01-01 10:25:00"), 1.7, true),
      (t("2024-01-01 11:01:00"), 0.5, false))) // watermark -> 10:31, window 10 still open
    sq.processAllAvailable()
    // LATE but within the watermark: event-time 10:40 arrives after the
    // 11:01 row — must still fold into window 10:00's census
    stream.addData(Seq((t("2024-01-01 10:40:00"), 0.2, false)))
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 12:30:00"), 0.5, true))) // close both windows
    sq.processAllAvailable()
    sq.stop()
    val census = spark.table("cal_census")
      .filter($"window_start" === t("2024-01-01 10:00:00"))
    val bands = census.collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(bands == Map(0L -> (2L, 1L), 3L -> (3L, 2L)),
      s"late 10:40 row must fold into band 0 of window 10, got $bands")
    // batch parity: the window census equals calibrationReport's counts
    // over the same raw rows (on the n>0 bands)
    val raw = Seq((0.1, true), (0.9, true), (0.95, false), (1.7, true), (0.2, false))
      .toDF("score", "label")
    val batch = graft.operators.Evaluation.calibrationReport(
        raw, $"score", $"label", lo = 0.0, hi = 1.0, bins = 4)
      .filter($"n" > 0).collect()
      .map(r => r.getAs[Long]("band") -> (r.getAs[Long]("n"), r.getAs[Long]("n_pos"))).toMap
    assert(bands == batch)
    // scoring: baseline = the same distribution -> zero gap everywhere;
    // all 4 bands present per window including empty ones
    val baseline = graft.operators.Evaluation.calibrationReport(
      raw, $"score", $"label", lo = 0.0, hi = 1.0, bins = 4)
    val scored = StreamingCalibration.scoreCalibration(census, baseline).collect()
    assert(scored.length == 4, "every window reports all bands")
    scored.foreach { r =>
      if (r.getAs[Long]("n") > 0) {
        assert(r.getAs[Double]("rate_gap") == 0.0)
        assert(r.getAs[Double]("ece_contribution") == 0.0)
      } else {
        assert(r.isNullAt(r.fieldIndex("pos_rate")))
        assert(r.isNullAt(r.fieldIndex("ece_contribution")))
      }
      // baseline covers every live band here — nothing uncovered
      assert(r.getAs[Double]("uncovered_mass") == 0.0)
    }
    // drift into baseline-uncovered territory: a baseline that never
    // populated band 0 leaves window-10's 2 band-0 rows (of 5) outside
    // the conditional ECE — uncovered_mass must surface exactly 2/5
    val sparseBaseline = Seq((0.9, true), (0.95, false))
      .toDF("score", "label")
    val sparseScored = StreamingCalibration.scoreCalibration(
        census,
        graft.operators.Evaluation.calibrationReport(
          sparseBaseline, $"score", $"label", lo = 0.0, hi = 1.0, bins = 4))
      .collect()
      .map(r => r.getAs[Long]("band") ->
        (r.getAs[Double]("uncovered_mass"),
         Option(r.getAs[Any]("ece_contribution")))).toMap
    assert(sparseScored(0L) == (0.4, None),
      "live mass in a baseline-empty band is uncovered, not silently dropped")
    assert(sparseScored(3L)._1 == 0.0 && sparseScored(3L)._2.isDefined)
    assert(sparseScored(1L) == (0.0, None), "empty live + empty baseline band is 0 mass")
  }

  test("streaming band-AUC: windowed discrimination equals batch band-AUC and exact AUC on band scores, late data folded") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCalibration
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, Double, Boolean)]
    val sq = StreamingCalibration.windowedBandCensus(
        stream.toDF().toDF("ts", "score", "label"),
        "score", "label", lo = 0.0, hi = 1.0, bins = 4,
        tsCol = "ts", windowLength = "1 hour", watermarkDelay = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("auc_census")
      .start()
    // window 10: mixed discrimination across bands 0/1/3
    stream.addData(Seq(
      (t("2024-01-01 10:05:00"), 0.1, false),
      (t("2024-01-01 10:10:00"), 0.3, true),
      (t("2024-01-01 10:15:00"), 0.8, true),
      (t("2024-01-01 10:20:00"), 0.9, false),
      (t("2024-01-01 11:01:00"), 0.5, true)))  // keeps window 10 open
    sq.processAllAvailable()
    // late but within watermark: a negative folding into band 0
    stream.addData(Seq((t("2024-01-01 10:40:00"), 0.2, false)))
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 12:30:00"), 0.5, true)))  // close both
    sq.processAllAvailable()
    sq.stop()
    val census = spark.table("auc_census")
    val w10 = t("2024-01-01 10:00:00")
    val scored = StreamingCalibration.scoreBandAuc(census).collect()
      .map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), Option(r.getAs[java.lang.Double]("band_auc"))))
      .toMap
    // window 10 (incl. the late row): pos in bands {1,3}, neg in {0,0,3}
    assert(scored(w10)._1 == 2L && scored(w10)._2 == 3L)
    // batch parity: same function over calibrationReport's census of
    // the same raw rows
    val raw = Seq((0.1, false), (0.3, true), (0.8, true), (0.9, false), (0.2, false))
      .toDF("score", "label")
    val batchCensus = graft.operators.Evaluation.calibrationReport(
        raw, $"score", $"label", lo = 0.0, hi = 1.0, bins = 4)
      .select(lit(w10).as("window_start"), $"band", $"n", $"n_pos")
    val batchAuc = StreamingCalibration.scoreBandAuc(batchCensus)
      .head().getAs[java.lang.Double]("band_auc")
    assert(scored(w10)._3 == Option(batchAuc),
      "windowed band-AUC must equal the batch band-AUC on the same rows")
    // band-AUC == EXACT AUC when the score IS the band index: pins the
    // formula to the aucExact machinery (midrank ties at band level)
    val bandScores = raw.select(
      least(lit(3.0), greatest(lit(0.0), floor($"score" / 0.25))).as("s"), $"label")
    val exact = graft.operators.Evaluation.aucExact(bandScores, $"s", $"label")
      .head().getAs[java.lang.Double]("auc")
    assert(Option(batchAuc) == Option(exact),
      "band-AUC must be the exact AUC of band-granular scores")
    // single-class window 11 (both rows positive): AUC undefined -> NULL
    assert(scored(t("2024-01-01 11:00:00"))._3.isEmpty,
      "single-class window must report NULL, not 0.5")
  }

  test("streamed gate maintenance: folded band census -> sweep == batch thresholdSweepBy; applied points == the q130 decision table") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCalibration
    import graft.operators.Evaluation
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, String, Double, Boolean)]
    val sq = StreamingCalibration.windowedBandCensusBy(
        stream.toDF().toDF("ts", "src", "score", "label"),
        "src", "score", "label", lo = 0.0, hi = 1.0, bins = 4,
        tsCol = "ts", windowLength = "1 hour", watermarkDelay = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sweep_census")
      .start()
    // two sources across two windows, with a clamp (1.3 -> band 3), a
    // late row, and a NULL-group row that must be excluded
    val raw = Seq(
      (t("2024-01-01 10:05:00"), "a", 0.1, false),
      (t("2024-01-01 10:10:00"), "a", 0.3, true),
      (t("2024-01-01 10:15:00"), "b", 0.8, true),
      (t("2024-01-01 10:20:00"), "b", 1.3, false),
      (t("2024-01-01 11:02:00"), "a", 0.9, true),
      (t("2024-01-01 11:10:00"), "b", 0.2, false))
    stream.addData(raw.take(4) :+ ((t("2024-01-01 11:02:00"), "a", 0.9, true)))
    sq.processAllAvailable()
    stream.addData(Seq(
      (t("2024-01-01 10:40:00"), "b", 0.6, true),     // late, in watermark
      (t("2024-01-01 11:20:00"), null.asInstanceOf[String], 0.5, true), // null group: dropped
      (t("2024-01-01 11:10:00"), "b", 0.2, false)))
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 13:00:00"), "a", 0.5, true))) // close all
    sq.processAllAvailable()
    sq.stop()
    // the partials log: fold EVERYTHING the stream emitted (any
    // granularity folds the same — integer partials)
    val log = spark.table("sweep_census")
      .select($"group_key", $"band", $"n", $"n_pos")
    val streamed = Evaluation.sweepFromBandCensus(log, lo = 0.0, hi = 1.0, bins = 4)
    // batch truth over the same raw rows: the late one counts, the
    // null-group one is dropped by the batch raw filter too, and the
    // 13:00 watermark-advancer is excluded — its own window never
    // closed, so the log (correctly) does not carry it yet
    val rawDf = (raw :+ ((t("2024-01-01 10:40:00"), "b", 0.6, true)))
      .toDF("ts", "src", "score", "label")
    val batch = Evaluation.thresholdSweepBy(
      rawDf, $"src", $"score", $"label", lo = 0.0, hi = 1.0, bins = 4)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[String]("group_key"), r.getAs[Long]("band")) ->
        (r.getAs[Double]("threshold"), r.getAs[Long]("tp"), r.getAs[Long]("fp"),
         r.getAs[Long]("fn"), r.getAs[Long]("tn"),
         Option(r.getAs[java.lang.Double]("precision")),
         Option(r.getAs[java.lang.Double]("recall")),
         Option(r.getAs[java.lang.Double]("f1")))
    }.toMap
    val (sm, bm) = (key(streamed), key(batch))
    assert(sm == bm, "the folded sweep must equal the batch sweep cell-for-cell")
    assert(sm.size == 8, "2 sources x 4 bands")
    // and the decision table: operating points elected from the
    // MAINTAINED sweep, applied to the corpus == elected from the
    // batch sweep (the q130 composition)
    val applyStreamed = Evaluation.applyOperatingPoints(
      rawDf, $"src", $"score", streamed).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val applyBatch = Evaluation.applyOperatingPoints(
      rawDf, $"src", $"score", batch).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(applyStreamed == applyBatch,
      "streamed-maintained operating points must yield the batch decision table")
    // config-mismatch guard: a census built at different banding fails
    // loudly instead of silently mis-thresholding
    val bad = intercept[IllegalArgumentException] {
      Evaluation.sweepFromBandCensus(log, lo = 0.0, hi = 1.0, bins = 2).collect()
    }
    assert(bad.getMessage.contains("different lo/hi/bins"))
  }

  test("streamed token census: folded windows == the batch temperature mixture plan") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCuration
    import graft.operators.Sampling
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, String, String)]
    val sq = StreamingCuration.windowedTokenCensus(
        stream.toDF().toDF("ts", "src", "text"),
        "src", "text",
        tsCol = "ts", windowLength = "1 hour", watermarkDelay = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("tok_census")
      .start()
    val raw = Seq(
      (t("2024-01-01 10:05:00"), "a", "the fast table scan"),
      (t("2024-01-01 10:10:00"), "a", "slow merge join"),
      (t("2024-01-01 10:20:00"), "b", "spark query vector window"),
      (t("2024-01-01 11:02:00"), "b", "group by key"),
      (t("2024-01-01 11:10:00"), "a", "hash hash hash"))
    stream.addData(raw.take(3) :+ raw(3))
    sq.processAllAvailable()
    stream.addData(Seq(
      (t("2024-01-01 10:40:00"), "a", "sort order line"),   // late, in watermark
      (t("2024-01-01 11:20:00"), null.asInstanceOf[String], "dropped"),
      raw(4)))
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 13:00:00"), "a", "closer"))) // close all
    sq.processAllAvailable()
    sq.stop()
    val log = spark.table("tok_census")
      .select($"group_key", $"n_docs", $"total_tokens")
    val streamed = Sampling.mixturePlanFromTokenCensus(log, 1000L)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // batch truth: the same rows (late included, null-source and the
    // unclosed 13:00 watermark-advancer excluded) through the raw-row
    // batch plan, tokens = the same BPE expression
    val rawDf = (raw :+ ((t("2024-01-01 10:40:00"), "a", "sort order line")))
      .toDF("ts", "src", "text")
      .select($"src", graft.functions.Bpe.bpeTokenCount($"text").as("tk"))
    val batch = Sampling.temperatureMixturePlan(rawDf, $"src", $"tk", 1000L)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(streamed == batch,
      "the folded token census must yield the batch mixture plan exactly")
    assert(streamed.keySet == Set("a", "b"))
    // fourth maintained token surface: the same log carries byte
    // totals, so the q202 compression ratio folds from it — streamed
    // == a one-pass batch aggregate over the same rows
    val comp = graft.operators.TextAnalysis.compressionFromCensus(
        spark.table("tok_census"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val compBatch = (raw :+ ((t("2024-01-01 10:40:00"), "a", "sort order line")))
      .toDF("ts", "src", "text")
      .select($"src", graft.functions.Bpe.bpeTokenCount($"text")
        .cast("long").as("tk"), octet_length($"text").cast("long").as("nb"))
      .groupBy($"src").agg(count(lit(1)).as("n_docs"),
        sum($"nb").as("total_bytes"), sum($"tk").as("total_bpe_tokens"),
        (sum($"nb").cast("double") / sum($"tk").cast("double"))
          .as("bytes_per_token"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(comp == compBatch,
      "the folded census must yield the batch compression ratio exactly")
  }

  test("streamed vocab census: folded windows == the batch token-entropy table") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCuration
    import graft.operators.TextAnalysis
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, String, String)]
    val sq = StreamingCuration.windowedVocabCensus(
        stream.toDF().toDF("ts", "src", "text"),
        "src", "text",
        tsCol = "ts", windowLength = "1 hour", watermarkDelay = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("vocab_census")
      .start()
    val raw = Seq(
      (t("2024-01-01 10:05:00"), "a", "scan scan table"),
      (t("2024-01-01 10:10:00"), "a", "table join"),
      (t("2024-01-01 10:20:00"), "b", "hash hash hash"),
      (t("2024-01-01 11:02:00"), "a", "scan merge"))
    stream.addData(raw)
    sq.processAllAvailable()
    stream.addData(Seq(
      (t("2024-01-01 10:40:00"), "b", "sort sort"),  // late, in watermark
      (t("2024-01-01 11:20:00"), null.asInstanceOf[String], "dropped")))
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 13:00:00"), "a", "closer"))) // close all
    sq.processAllAvailable()
    sq.stop()
    val log = spark.table("vocab_census")
      .select($"group_key", $"token", $"n")
    val streamed = TextAnalysis.tokenEntropyFromCensus(log)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val batch = TextAnalysis.tokenEntropyBy(
        (raw :+ ((t("2024-01-01 10:40:00"), "b", "sort sort")))
          .toDF("ts", "src", "text"), $"src", $"text")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(streamed == batch,
      "the folded vocabulary census must yield the batch entropy table exactly")
    assert(streamed.keySet == Set("a", "b"))
  }

  test("streaming banded KS: per-window drift equals the batch two-sample KS on band scores, late data folded") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCalibration
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, Double, Boolean)]
    val sq = StreamingCalibration.windowedBandCensus(
        stream.toDF().toDF("ts", "score", "label"),
        "score", "label", lo = 0.0, hi = 1.0, bins = 4,
        tsCol = "ts", windowLength = "1 hour", watermarkDelay = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("ks_census")
      .start()
    // window 10: mass concentrated low (bands 0,0,1,3 after late fold);
    // window 11: a single high row (band 2)
    stream.addData(Seq(
      (t("2024-01-01 10:05:00"), 0.1, false),
      (t("2024-01-01 10:10:00"), 0.15, true),
      (t("2024-01-01 10:20:00"), 0.9, false),
      (t("2024-01-01 11:01:00"), 0.6, true)))   // keeps window 10 open
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 10:40:00"), 0.3, false)))  // late, in watermark
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 12:30:00"), 0.6, true)))   // close both
    sq.processAllAvailable()
    sq.stop()
    val census = spark.table("ks_census")
    // baseline: uniform-ish reference corpus over the same domain
    val baseRaw = Seq(0.05, 0.3, 0.55, 0.8, 0.95, 0.6)
      .map(v => (v, true)).toDF("score", "label")
    val baseline = graft.operators.Evaluation.calibrationReport(
      baseRaw, $"score", $"label", lo = 0.0, hi = 1.0, bins = 4)
    val scored = StreamingCalibration.scoreBandKs(census, baseline).collect()
      .map(r => r.getTimestamp(0) -> r).toMap
    val w10 = t("2024-01-01 10:00:00")
    assert(scored(w10).getAs[Long]("n_live") == 4L,
      "late row must fold into window 10 before scoring")
    assert(scored(w10).getAs[Long]("n_base") == 6L)
    // batch parity: exact two-sample KS on band-index values, live
    // window-10 rows (incl. the late one) vs the baseline corpus
    def bands(vs: Seq[Double], a: Boolean) =
      vs.map(v => (math.min(3.0, math.floor(v / 0.25)), a))
    val combined =
      (bands(Seq(0.1, 0.15, 0.9, 0.3), a = true) ++
       bands(Seq(0.05, 0.3, 0.55, 0.8, 0.95, 0.6), a = false))
        .toDF("v", "a")
    val solo = graft.operators.StatTests.ksTwoSample(combined, $"v", $"a").head()
    assert(scored(w10).getAs[Double]("band_ks") == solo.getAs[Double]("ks_stat"),
      "banded streaming KS must equal the exact KS of band-granular scores")
    assert(scored(w10).getAs[Long]("ks_at_band").toDouble == solo.getAs[Double]("ks_at"))
    assert(scored(w10).getAs[Double]("ks_z") == solo.getAs[Double]("ks_z"))
    // window 11 (one live row in band 2): D = max(|1-cumBase|, ...)
    val w11 = scored(t("2024-01-01 11:00:00"))
    assert(w11.getAs[Long]("n_live") == 1L)
    assert(w11.getAs[Double]("band_ks") > 0.0)
  }

  test("streamed source-overlap maintenance: merged group-sketch log equals the single-pass sketches and matrix") {
    // r10 verdict item 8: the q141 matrix maintained per ingest batch
    // — append each batch's per-group MinHash sketches, merge at read
    // by elementwise min + doc-count add. Merged == single-pass over
    // everything arrived, BIT FOR BIT (min distributes over union).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSketch
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_gsk").toString
    val (log, ckpt) = (s"$scratch/gsk", s"$scratch/ckpt")
    val (nGram, hashes) = (3, 16)

    val stream = MemoryStream[(Long, String, String)]
    val sq = StreamingSketch.groupSketchSink(
      stream.toDF().toDF("doc_id", "text", "source"),
      "text", "source", log, ckpt, n = nGram, numHashes = hashes)
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "pack my box with five dozen liquor jugs", "web"),
      (3L, "the quick brown fox jumps over the lazy dog", "books"))
    val batch2 = Seq(
      (4L, "sphinx of black quartz judge my vow", "web"),
      (5L, "pack my box with five dozen liquor jugs", "news"),
      (6L, "sphinx of black quartz judge my vow", "books"))
    stream.addData(batch1); sq.processAllAvailable()
    stream.addData(batch2); sq.processAllAvailable()
    sq.stop()

    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    val all = (batch1 ++ batch2).toDF("doc_id", "text", "source")
    val merged = keyed(StreamingSketch.readGroupSketches(spark, log, hashes))
    val single = keyed(Dedup.groupSketches(all, "text", "source", nGram, hashes))
    assert(merged == single,
      "merged per-batch sketch log must equal the single-pass group sketches bit for bit")
    assert(merged.keySet == Set("web", "books", "news"))

    // and the maintained matrix equals the batch q141 surface
    def mkey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val mStream = mkey(StreamingSketch.readOverlapMatrix(spark, log, hashes))
    val mBatch = mkey(Dedup.sourceOverlapMatrix(all, "text", "source", nGram, hashes))
    assert(mStream == mBatch,
      "the maintained overlap matrix must equal the from-scratch q141 matrix")
    // sanity: books shares a doc-universe with web (duplicated texts)
    assert(mStream(("books", "web"))._3 > 0.0)
  }

  test("banded KS monitor: live bands outside the baseline spine still step the live CDF (union spine)") {
    // r10 advice: the old implementation evaluated the live CDF only on
    // the BASELINE's band spine, so a live band absent from the
    // baseline (a bins/lo/hi mismatch between census and baseline) was
    // silently dropped from the cumulative while still counted in the
    // total. Disjoint spines are the sharpest pin: all live mass in
    // band 0, all baseline mass in band 5 — true banded KS is 1.0; the
    // old spine-restricted evaluation reported 0.0.
    import graft.streaming.StreamingCalibration
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val w10 = t("2024-01-01 10:00:00")
    val live = Seq((w10, 0L, 4L)).toDF("window_start", "band", "n")
    val baseline = Seq((5L, 4L)).toDF("band", "n")
    val r = StreamingCalibration.scoreBandKs(live, baseline).head()
    assert(r.getAs[Long]("n_live") == 4L)
    assert(r.getAs[Long]("n_base") == 4L)
    assert(r.getAs[Double]("band_ks") == 1.0,
      "disjoint live/baseline spines must score KS 1.0, not drop the live-only band")
    assert(r.getAs[Long]("ks_at_band") == 0L)
    assert(r.getAs[Double]("ks_z") == math.sqrt(4.0 * 4.0 / 8.0) * 1.0)
  }

  test("streaming window-over-window banded KS: each window vs its predecessor equals the batch two-sample KS on band scores") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCalibration
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(java.sql.Timestamp, Double, Boolean)]
    val sq = StreamingCalibration.windowedBandCensus(
        stream.toDF().toDF("ts", "score", "label"),
        "score", "label", lo = 0.0, hi = 1.0, bins = 4,
        tsCol = "ts", windowLength = "1 hour", watermarkDelay = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("adj_census")
      .start()
    // window 10 low-heavy, window 11 high-heavy, window 13 (12 silent)
    val w10 = Seq(0.1, 0.2, 0.3, 0.6).map((_, "10:10:00"))
    val w11 = Seq(0.7, 0.8, 0.9).map((_, "11:10:00"))
    val w13 = Seq(0.1, 0.9).map((_, "13:10:00"))
    stream.addData((w10 ++ w11 ++ w13).map { case (v, hm) =>
      (t(s"2024-01-01 $hm"), v, true) })
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 15:30:00"), 0.5, true))) // close all
    sq.processAllAvailable()
    sq.stop()
    val out = StreamingCalibration
      .scoreBandKsAdjacent(spark.table("adj_census"))
      .collect().map(r => r.getTimestamp(0) -> r).toMap
    // windows 11 and 13 report (vs 10 and vs 11); 10 and 15 have no
    // predecessor-with-successor pairing in the output keys we check
    def bands(vs: Seq[Double], a: Boolean) =
      vs.map(v => (math.min(3.0, math.floor(v / 0.25)), a))
    val k11 = out(t("2024-01-01 11:00:00"))
    assert(k11.getTimestamp(k11.fieldIndex("prev_start")) == t("2024-01-01 10:00:00"))
    assert(k11.getAs[Long]("n_live") == 3L && k11.getAs[Long]("n_prev") == 4L)
    val solo11 = graft.operators.StatTests.ksTwoSample(
      (bands(w11.map(_._1), a = true) ++ bands(w10.map(_._1), a = false))
        .toDF("v", "a"), $"v", $"a").head()
    assert(k11.getAs[Double]("band_ks") == solo11.getAs[Double]("ks_stat"))
    assert(k11.getAs[Double]("ks_z") == solo11.getAs[Double]("ks_z"))
    // the silent-gap window 13 pairs with the last OBSERVED window 11
    val k13 = out(t("2024-01-01 13:00:00"))
    assert(k13.getTimestamp(k13.fieldIndex("prev_start")) == t("2024-01-01 11:00:00"))
    val solo13 = graft.operators.StatTests.ksTwoSample(
      (bands(w13.map(_._1), a = true) ++ bands(w11.map(_._1), a = false))
        .toDF("v", "a"), $"v", $"a").head()
    assert(k13.getAs[Double]("band_ks") == solo13.getAs[Double]("ks_stat"))
    // the first window never reports (no predecessor)
    assert(!out.contains(t("2024-01-01 10:00:00")))
  }

  test("streaming curation front-end: gates + TTL content-dedup, batch-identical admission") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val good = "the quick brown fox jumps over the lazy dog again and again"
      val short = "too short"                                  // fails minTokens
      val punct = "a b c d e f g h i j !!!!!!!!!!!!!!!!!!!!!"  // fails punct ratio
      val stream = MemoryStream[(Long, String)]
      val sq = graft.streaming.StreamingCuration.gatedDedupedStream(
          spark, stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
          dedupTtl = java.time.Duration.ofHours(1))
        .writeStream.outputMode("append").format("memory").queryName("cur_stream")
        .start()
      stream.addData(Seq((1L, good), (2L, short), (3L, punct), (4L, good)))
      sq.processAllAvailable()
      stream.addData(Seq((5L, good), (6L, good + " fresh")))
      sq.processAllAvailable()
      sq.stop()
      val out = spark.table("cur_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.keySet === Set(1L, 6L),
        s"gates drop 2/3, dedup keeps first of 1/4/5, got ${out.keySet}")
      // admission must equal the batch predicate exactly
      val batchAdmitted = Seq((1L, good), (2L, short), (3L, punct))
        .toDF("doc_id", "text")
        .filter(graft.Curation.qualityPredicate(
          org.apache.spark.sql.functions.col("text"), graft.Curation.CurationConfig()))
        .select("doc_id").as[Long].collect().toSet
      assert(batchAdmitted === Set(1L))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevNoData match {
        case Some(v) => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming LSH near-dedup: near-dups collide across batches, distinct docs don't") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val base = "the quick brown fox jumps over the lazy dog while the calm " +
        "river flows past the old stone bridge and the quiet village sleeps " +
        "under a wide summer sky full of slow white clouds drifting to the hills"
      val nearDup = base + " tail"    // high-Jaccard variant of base
      val distinct = "a completely different account of steel production " +
        "quotas in the northern factories during the long cold winter months " +
        "of the planning year with entirely disjoint vocabulary and phrasing"
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
      val sq = graft.streaming.StreamingNearDedup.bandCollisions(
          spark, stream.toDF().toDF("doc_id", "text", "ts"),
          "doc_id", "text", "ts",
          ttl = java.time.Duration.ofHours(1))
        .writeStream.outputMode("append").format("memory").queryName("lsh_stream")
        .start()
      stream.addData(Seq((1L, base, t("2024-01-01 10:00:00"))))
      sq.processAllAvailable()
      assert(spark.table("lsh_stream").isEmpty,
        "the first document claims its buckets silently")
      stream.addData(Seq(
        (2L, nearDup, t("2024-01-01 10:05:00")),
        (3L, distinct, t("2024-01-01 10:06:00"))))
      sq.processAllAvailable()
      sq.stop()
      val byDoc = spark.table("lsh_stream")
        .groupBy("doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byDoc.contains(2L) && byDoc(2L) >= 8,
        s"a near-dup must collide in most of its 16 bands: $byDoc")
      assert(!byDoc.contains(3L),
        s"a distinct doc must not collide in any band: $byDoc")
      // drop decision = distinct colliding doc ids
      assert(byDoc.keySet == Set(2L))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevNoData match {
        case Some(v) => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("timer-based sessions: event-time timers close sessions, late extension re-arms") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val stream = MemoryStream[(Long, java.sql.Timestamp)]
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      val sq = StreamingFreshness.sessionsWithTimers(
          spark, stream.toDF().toDF("user_id", "ts"),
          gap = java.time.Duration.ofMinutes(30), watermarkDelay = "10 minutes")
        .writeStream.outputMode("append").format("memory").queryName("timer_sess")
        .start()
      // batch 1: user 1 has two events 10 min apart; user 2 has one.
      // Watermark after this batch: 10:10 − 10 min = 10:00 → no timer
      // (earliest expiry 10:40) fires yet.
      stream.addData(Seq(
        (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00")),
        (2L, t("2024-01-01 10:05:00"))))
      sq.processAllAvailable()
      assert(spark.table("timer_sess").isEmpty, "no session closes before its gap")
      // batch 2: user 1 extends its session (10:30 < 10:10 + gap);
      // the pending 10:40 timer must be REPLACED by 11:00, not fire.
      // Watermark advances to 10:20 — still nothing emits.
      stream.addData(Seq((1L, t("2024-01-01 10:30:00"))))
      sq.processAllAvailable()
      assert(spark.table("timer_sess").isEmpty, "extension must re-arm, not close")
      // batch 3: far-future event pushes the watermark past every
      // pending timer → both open sessions emit, exactly once each.
      stream.addData(Seq((9L, t("2024-01-01 15:00:00"))))
      sq.processAllAvailable()
      val out = spark.table("timer_sess")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(out.contains((1L,
        t("2024-01-01 10:00:00").getTime, t("2024-01-01 10:30:00").getTime, 3L)),
        s"user 1: one merged 3-event session, got $out")
      assert(out.contains((2L,
        t("2024-01-01 10:05:00").getTime, t("2024-01-01 10:05:00").getTime, 1L)))
      assert(out.size == 2, s"no duplicate emission: $out")
      sq.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("volume alerts fire exactly once per key on threshold crossing (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val sq = StreamingFreshness.volumeAlerts(
        spark, stream.toDF().toDF("event_type"), threshold = 3L)
      .writeStream.outputMode("append").format("memory").queryName("alert_out")
      .start()
    stream.addData(Seq("click", "click", "view"))      // click=2, view=1: no alert
    sq.processAllAvailable()
    assert(spark.table("alert_out").count() == 0)
    stream.addData(Seq("click", "view"))               // click crosses 3 → one alert
    sq.processAllAvailable()
    val a1 = spark.table("alert_out").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a1.toSeq == Seq(("click", 3L)))
    stream.addData(Seq("click", "click"))              // already alerted: silent
    sq.processAllAvailable()
    sq.stop()
    assert(spark.table("alert_out").count() == 1, "alert must not re-fire")
  }

  test("transformWithState TTL dedup: first occurrence emitted, repeats suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // state partition count binds from this conf at query start; each
    // RocksDB instance checkpoints through Hadoop's shell-exec'd
    // chmod per file, so 32 instances make a toy query take minutes
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    // processing-time TTL otherwise schedules no-data micro-batches
    // forever (to advance time for eviction), so processAllAvailable
    // never settles; TTL stays enforced lazily on state reads
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val stream = MemoryStream[Long]
      val sq = StreamingFreshness.dedupStreamTtl(
          spark, stream.toDF().toDF("doc_key"), "doc_key",
          java.time.Duration.ofHours(1))
        .writeStream.outputMode("append").format("memory").queryName("ttl_out")
        .start()
      stream.addData(Seq(1L, 1L, 2L))  // dup within batch
      sq.processAllAvailable()
      stream.addData(Seq(1L, 3L))      // dup across batches + new key
      sq.processAllAvailable()
      sq.stop()
      val out = spark.table("ttl_out").as[Long].collect().sorted.toSeq
      assert(out == Seq(1L, 2L, 3L), s"each key exactly once, got $out")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevNoData match {
        case Some(v) => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state portability: TTL dedup and timer sessions survive a restart under a different shuffle-partition count") {
    // The state-store partition count binds from the CHECKPOINT at
    // first start, not from the session conf — a cluster restart with
    // retuned spark.sql.shuffle.partitions must rebind state to the
    // checkpointed layout (keys land on their old partitions) instead
    // of silently splitting state across a new count. This is the
    // streaming-surface failure mode the per-operator specs don't
    // cover: dedup forgetting keys / timers losing sessions after a
    // restart.
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // no-data micro-batches off ONLY for the TTL phase (processing-time
    // TTL schedules them forever); the timer phase NEEDS the no-data
    // batch after a watermark advance to fire its event-time timers
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val ttlCkpt = java.nio.file.Files.createTempDirectory("graft_ttl_ckpt").toString
    val sessCkpt = java.nio.file.Files.createTempDirectory("graft_sess_ckpt").toString
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // the memory sink cannot recover from a checkpoint — collect
      // through foreachBatch into a per-phase buffer instead
      // --- TTL dedup across the restart ---
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val keys = MemoryStream[Long]
      def startTtl(buf: java.util.concurrent.ConcurrentLinkedQueue[Long]) =
        StreamingFreshness.dedupStreamTtl(
            spark, keys.toDF().toDF("doc_key"), "doc_key",
            java.time.Duration.ofHours(1))
          .writeStream.outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.Dataset[Long], _: Long) =>
            df.collect().foreach(k => buf.add(k))
          }
          .option("checkpointLocation", ttlCkpt).start()
      val buf1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val ttl1 = startTtl(buf1)
      keys.addData(Seq(1L, 2L)); ttl1.processAllAvailable(); ttl1.stop()
      assert(buf1.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
        == Seq(1L, 2L))
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val buf2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val ttl2 = startTtl(buf2)
      keys.addData(Seq(1L, 2L, 3L)); ttl2.processAllAvailable(); ttl2.stop()
      val out2 = buf2.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
      assert(out2 == Seq(3L),
        s"restored state must still suppress keys 1 and 2, got $out2")

      // --- timer sessions across the restart ---
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val events = MemoryStream[(Long, java.sql.Timestamp)]
      val sessBuf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
      def startSess() = StreamingFreshness.sessionsWithTimers(
          spark, events.toDF().toDF("user_id", "ts"),
          gap = java.time.Duration.ofMinutes(30), watermarkDelay = "10 minutes")
        .writeStream.outputMode("append")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[StreamingFreshness.SessionOut], _: Long) =>
            df.collect().foreach(s => sessBuf.add(
              (s.user_id, s.session_start_ms, s.session_end_ms, s.n_events)))
        }
        .option("checkpointLocation", sessCkpt).start()
      val sess1 = startSess()
      events.addData(Seq(
        (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00"))))
      sess1.processAllAvailable(); sess1.stop()
      assert(sessBuf.isEmpty, "session still open at shutdown")
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val sess2 = startSess()
      // far-future event: the RESTORED timer must fire and close the
      // session built from RESTORED state (2 events, old bounds)
      events.addData(Seq((9L, t("2024-01-01 15:00:00"))))
      sess2.processAllAvailable(); sess2.stop()
      val sessions = sessBuf.toArray(
        Array.empty[(Long, Long, Long, Long)]).toSet
      assert(sessions.contains((1L,
        t("2024-01-01 10:00:00").getTime, t("2024-01-01 10:10:00").getTime, 2L)),
        s"restored timer must close the pre-restart session intact, got $sessions")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevNoData match {
        case Some(v) => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join: clicks attribute to in-window views only") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val sq = StreamingFreshness.attributedClicks(
        stream.toDF().toDF("ts", "event_type", "user_id"), "30 minutes", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("attr_out")
      .start()
    stream.addData(Seq(
      (t("2024-01-01 10:00:00"), "view",  1L),
      (t("2024-01-01 10:10:00"), "click", 1L),   // in window → attributed
      (t("2024-01-01 11:30:00"), "click", 1L),   // 90 min later → not attributed
      (t("2024-01-01 10:05:00"), "click", 2L)))  // other user → no view
    sq.processAllAvailable()
    sq.stop()
    val rows = spark.table("attr_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(2))).toSet
    assert(rows == Set((1L, t("2024-01-01 10:10:00"))),
      "exactly the in-window same-user click attributes")
  }

  test("streaming freshness: memory-stream run matches batch run (unified API)") {
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables.events(spark, TestSpark.sf)
      .select($"ts", $"event_type", $"user_id")
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    stream.addData(batch.as[(java.sql.Timestamp, String, Long)].collect().toSeq)

    val sq = StreamingFreshness.windowedFreshness(
        stream.toDF().toDF("ts", "event_type", "user_id"), "1 hour", "1 hour")
      .writeStream.outputMode("complete").format("memory").queryName("fresh_out")
      .start()
    sq.processAllAvailable(); sq.stop()

    val streamed = spark.table("fresh_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batched = StreamingFreshness.windowedFreshness(batch, "1 hour", "1 hour")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batched)
    assert(streamed.nonEmpty)
  }

  test("anomalous windows: spike flagged against static baseline, unprofiled group null") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val baseline = Seq(("click", 3.0, 1.0)).toDF("group", "mean", "std")
    val sq = StreamingFreshness.anomalousWindows(
        stream.toDF().toDF("ts", "event_type"), baseline,
        windowLength = "1 hour", watermarkDelay = "1 minute", threshold = 2.0)
      .writeStream.outputMode("append").format("memory").queryName("anom_out")
      .start()
    // hour 10: 8 clicks (z=5, anomalous) + 2 "mystery" (no baseline);
    // hour 11: 3 clicks (z=0, normal)
    stream.addData(
      (1 to 8).map(i => (t(f"2024-01-01 10:${i}%02d:00"), "click")) ++
        Seq((t("2024-01-01 10:30:00"), "mystery"), (t("2024-01-01 10:31:00"), "mystery")))
    sq.processAllAvailable()
    stream.addData(Seq((t("2024-01-01 11:10:00"), "click"),
      (t("2024-01-01 11:20:00"), "click"), (t("2024-01-01 11:30:00"), "click")))
    sq.processAllAvailable()
    // advance the watermark past hour 11 so both windows finalize
    stream.addData(Seq((t("2024-01-01 13:00:00"), "click")))
    sq.processAllAvailable()
    sq.stop()
    val rows = spark.table("anom_out")
      .collect().map(r => (r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3)))).toSet
    assert(rows.contains(("click", 8L, Some(true))))     // spike flagged
    assert(rows.contains(("click", 3L, Some(false))))    // normal window not
    assert(rows.contains(("mystery", 2L, None)))         // unknown feed: null
  }

  test("streaming keep-list maintenance: foreachBatch folds arriving batches; final state equals from-scratch") {
    // The q129 maintenance operator driven the way production drives
    // it: document batches arrive on a stream, foreachBatch folds each
    // into the MATERIALIZED decision + signature tables (parquet,
    // versioned per batch — write-new, never overwrite-while-reading),
    // and after any number of batches the maintained table equals the
    // from-scratch run over everything seen. No corpus rescan ever
    // happens inside the loop — each fold touches the increment plus
    // the touched clusters only.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text", $"n_chars").persist()
    // the maintained score table (production: a materialized q112 run)
    val scores = docs.select($"doc_id", $"n_chars".cast("double").as("score"))
    val dir = java.nio.file.Files.createTempDirectory("stream_keeplist").toString
    val w = Window.partitionBy($"cluster_id").orderBy($"score".desc, $"doc_id".asc)
    // initial state from the first third, batch-style
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val (p0, s0) = Dedup.lshNearDupPairsWithSignatures(
      b0, "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.8)
    Dedup.duplicateClusters(p0, "id_a", "id_b")
      .select($"id".as("doc_id"), $"cluster_id", $"cluster_size")
      .join(scores, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "cluster_size", "score", "keep")
      .write.parquet(s"$dir/state_v0")
    s0.write.parquet(s"$dir/sigs_v0"); s0.unpersist()
    var version = 0
    val stream = MemoryStream[(Long, String)]
    val sq = stream.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val state = spark.read.parquet(s"$dir/state_v$version")
        val sigs = spark.read.parquet(s"$dir/sigs_v$version")
        val (updated, newSigs) = Dedup.foldIntoClusterKeepList(
          state, sigs, scores, batch, "doc_id", "text",
          n = 3, numHashes = 64, bands = 16, threshold = 0.8)
        version += 1
        updated.write.parquet(s"$dir/state_v$version")
        sigs.unionByName(newSigs).write.parquet(s"$dir/sigs_v$version")
        newSigs.unpersist()
        ()
      }
      .start()
    val third1 = docs.filter($"doc_id" % 3 === 1)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val third2 = docs.filter($"doc_id" % 3 === 2)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    stream.addData(third1)
    sq.processAllAvailable()
    stream.addData(third2)
    sq.processAllAvailable()
    sq.stop()
    assert(version == 2, s"two folds expected, got $version")
    // from-scratch over the full corpus with the same scores
    val (pAll, sAll) = Dedup.lshNearDupPairsWithSignatures(
      docs, "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.8)
    val scratch = Dedup.duplicateClusters(pAll, "id_a", "id_b")
      .select($"id".as("doc_id"), $"cluster_id", $"cluster_size")
      .join(scores, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "cluster_size", "score", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    sAll.unpersist()
    val maintained = spark.read.parquet(s"$dir/state_v$version")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Double]("score"), r.getAs[Boolean]("keep"))).toMap
    docs.unpersist()
    assert(maintained == scratch,
      "maintained decision table must equal the from-scratch run")
  }

  test("streamed near-dup-adjusted mixture plan: maintained keep-list + per-doc token log == batch q200 composition") {
    // VERDICT r13 item 5: the dedup-adjusted provisioning plan as a
    // MAINTAINED surface. foreachBatch folds each arriving batch into
    // (a) the materialized keep-list decision table (the q129 fold)
    // and (b) an append-only per-doc token log — each doc tokenized
    // once, at arrival. The plan then resolves per doc (a near-dup in
    // batch k can demote a batch-1 doc, so window-granularity census
    // partials cannot carry the discount) and must equal the batch
    // composition over everything seen.
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Dedup, Sampling}
    implicit val sqlCtx = spark.sqlContext
    val merges = graft.functions.BpeVocab.default
    val budget = 50000L
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"source", $"text", $"n_chars").persist()
    val scores = docs.select($"doc_id", $"n_chars".cast("double").as("score"))
    val dir = java.nio.file.Files.createTempDirectory("stream_ndplan").toString
    val w = Window.partitionBy($"cluster_id").orderBy($"score".desc, $"doc_id".asc)
    def tokenRows(batch: org.apache.spark.sql.DataFrame) =
      batch.select($"doc_id", $"source",
        graft.functions.Bpe.bpeTokenCount($"text", merges)
          .cast("long").as("bpe_tokens"))
    // initial state from the first third, batch-style
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val (p0, s0) = Dedup.lshNearDupPairsWithSignatures(
      b0, "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.8)
    Dedup.duplicateClusters(p0, "id_a", "id_b")
      .select($"id".as("doc_id"), $"cluster_id", $"cluster_size")
      .join(scores, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "cluster_size", "score", "keep")
      .write.parquet(s"$dir/state_v0")
    s0.write.parquet(s"$dir/sigs_v0"); s0.unpersist()
    tokenRows(b0).write.parquet(s"$dir/tokens")
    var version = 0
    val stream = MemoryStream[(Long, String, String)]
    val sq = stream.toDF().toDF("doc_id", "source", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val state = spark.read.parquet(s"$dir/state_v$version")
        val sigs = spark.read.parquet(s"$dir/sigs_v$version")
        val (updated, newSigs) = Dedup.foldIntoClusterKeepList(
          state, sigs, scores, batch, "doc_id", "text",
          n = 3, numHashes = 64, bands = 16, threshold = 0.8)
        version += 1
        updated.write.parquet(s"$dir/state_v$version")
        sigs.unionByName(newSigs).write.parquet(s"$dir/sigs_v$version")
        newSigs.unpersist()
        tokenRows(batch).write.mode("append").parquet(s"$dir/tokens")
        ()
      }
      .start()
    def third(k: Int) = docs.filter($"doc_id" % 3 === k)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq
    stream.addData(third(1)); sq.processAllAvailable()
    stream.addData(third(2)); sq.processAllAvailable()
    sq.stop()
    assert(version == 2, s"two folds expected, got $version")
    val maintained = Sampling.mixturePlanFromKeepList(
        spark.read.parquet(s"$dir/tokens"),
        spark.read.parquet(s"$dir/state_v$version"), "doc_id",
        $"source", $"bpe_tokens", budget)
      .collect().map(r => r.getAs[String]("group_key") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Double]("target_tokens"), r.getAs[Double]("epochs"))).toMap
    // batch composition over everything seen: from-scratch clustering
    // + election, then the same plan over kept docs
    val (pAll, sAll) = Dedup.lshNearDupPairsWithSignatures(
      docs, "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.8)
    val dropped = Dedup.duplicateClusters(pAll, "id_a", "id_b")
      .select($"id".as("doc_id"), $"cluster_id")
      .join(scores, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .filter(!$"keep").select("doc_id")
    val batchPlan = Sampling.temperatureMixturePlan(
        tokenRows(docs).join(dropped, Seq("doc_id"), "left_anti"),
        $"source", $"bpe_tokens", budget)
      .collect().map(r => r.getAs[String]("group_key") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Double]("target_tokens"), r.getAs[Double]("epochs"))).toMap
    sAll.unpersist(); docs.unpersist()
    assert(maintained == batchPlan,
      "the maintained near-dup-adjusted plan must equal the batch composition")
    assert(maintained.nonEmpty)
  }

  test("one-job streaming curation: keep-list + token log + compression census + mixture plan from ONE foreachBatch == batch") {
    // VERDICT r14 item 6: the maintained surfaces composed into ONE
    // foreachBatch pipeline over a SHARED ingest batch — each arriving
    // batch is tokenized once and that single pass feeds (a) the
    // keep-list fold, (b) the append-only per-doc token log, and
    // (c) the mergeable compression-census partials. After any number
    // of batches, BOTH downstream decision surfaces — the near-dup-
    // adjusted mixture plan and the bytes-per-token compression table
    // — must equal their batch compositions over everything seen.
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Dedup, Sampling, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    val merges = graft.functions.BpeVocab.default
    val budget = 50000L
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"source", $"text", $"n_chars").persist()
    val scores = docs.select($"doc_id", $"n_chars".cast("double").as("score"))
    val dir = java.nio.file.Files.createTempDirectory("stream_onejob").toString
    val w = Window.partitionBy($"cluster_id").orderBy($"score".desc, $"doc_id".asc)
    // ONE tokenization per arriving doc; both the token log and the
    // census partials project from this shared frame
    def tokenized(batch: org.apache.spark.sql.DataFrame) =
      batch.filter($"source".isNotNull && $"text".isNotNull)
        .select($"doc_id", $"source",
          graft.functions.Bpe.bpeTokenCount($"text", merges)
            .cast("long").as("bpe_tokens"),
          octet_length($"text").cast("long").as("bytes"))
    def censusRows(tok: org.apache.spark.sql.DataFrame) =
      tok.select($"source".as("group_key"), lit(1L).as("n_docs"),
        $"bpe_tokens".as("total_tokens"), $"bytes".as("total_bytes"))
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val (p0, s0) = Dedup.lshNearDupPairsWithSignatures(
      b0, "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.8)
    Dedup.duplicateClusters(p0, "id_a", "id_b")
      .select($"id".as("doc_id"), $"cluster_id", $"cluster_size")
      .join(scores, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "cluster_size", "score", "keep")
      .write.parquet(s"$dir/state_v0")
    s0.write.parquet(s"$dir/sigs_v0"); s0.unpersist()
    val t0 = tokenized(b0).persist()
    t0.select($"doc_id", $"source", $"bpe_tokens")
      .write.parquet(s"$dir/tokens")
    censusRows(t0).write.parquet(s"$dir/census")
    t0.unpersist()
    var version = 0
    val stream = MemoryStream[(Long, String, String)]
    val sq = stream.toDF().toDF("doc_id", "source", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val state = spark.read.parquet(s"$dir/state_v$version")
        val sigs = spark.read.parquet(s"$dir/sigs_v$version")
        val (updated, newSigs) = Dedup.foldIntoClusterKeepList(
          state, sigs, scores, batch, "doc_id", "text",
          n = 3, numHashes = 64, bands = 16, threshold = 0.8)
        version += 1
        updated.write.parquet(s"$dir/state_v$version")
        sigs.unionByName(newSigs).write.parquet(s"$dir/sigs_v$version")
        newSigs.unpersist()
        val tok = tokenized(batch).persist()
        tok.select($"doc_id", $"source", $"bpe_tokens")
          .write.mode("append").parquet(s"$dir/tokens")
        censusRows(tok).write.mode("append").parquet(s"$dir/census")
        tok.unpersist()
        ()
      }
      .start()
    def third(k: Int) = docs.filter($"doc_id" % 3 === k)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq
    stream.addData(third(1)); sq.processAllAvailable()
    stream.addData(third(2)); sq.processAllAvailable()
    sq.stop()
    assert(version == 2, s"two folds expected, got $version")
    // surface 1: the near-dup-adjusted mixture plan
    val maintainedPlan = Sampling.mixturePlanFromKeepList(
        spark.read.parquet(s"$dir/tokens"),
        spark.read.parquet(s"$dir/state_v$version"), "doc_id",
        $"source", $"bpe_tokens", budget)
      .collect().map(r => r.getAs[String]("group_key") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Double]("target_tokens"), r.getAs[Double]("epochs"))).toMap
    // surface 2: bytes-per-token compression from the census partials
    val maintainedCmp = TextAnalysis.compressionFromCensus(
        spark.read.parquet(s"$dir/census"))
      .collect().map(r => r.getAs[String]("group_key") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_bytes"),
          r.getAs[Long]("total_bpe_tokens"),
          r.getAs[Double]("bytes_per_token"))).toMap
    // batch compositions over everything seen
    val (pAll, sAll) = Dedup.lshNearDupPairsWithSignatures(
      docs, "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.8)
    val dropped = Dedup.duplicateClusters(pAll, "id_a", "id_b")
      .select($"id".as("doc_id"), $"cluster_id")
      .join(scores, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .filter(!$"keep").select("doc_id")
    val batchPlan = Sampling.temperatureMixturePlan(
        tokenized(docs).join(dropped, Seq("doc_id"), "left_anti"),
        $"source", $"bpe_tokens", budget)
      .collect().map(r => r.getAs[String]("group_key") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Double]("target_tokens"), r.getAs[Double]("epochs"))).toMap
    val batchCmp = TextAnalysis.tokenizerCompressionBy(
        docs, $"source", $"text", merges)
      .collect().map(r => r.getAs[String]("group_key") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_bytes"),
          r.getAs[Long]("total_bpe_tokens"),
          r.getAs[Double]("bytes_per_token"))).toMap
    sAll.unpersist(); docs.unpersist()
    assert(maintainedPlan == batchPlan,
      "one-job maintained mixture plan must equal the batch composition")
    assert(maintainedCmp == batchCmp,
      "one-job maintained compression census must equal the batch run")
    assert(maintainedPlan.nonEmpty && maintainedCmp.nonEmpty)
  }

  test("streaming semantic screen admits exactly what the batch anti-join admits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f)),
      (102L, null.asInstanceOf[Array[Float]])).toDF("id", "vec") // NULL bench vec: skipped, not an NPE
    val rows = Seq(
      (1L, Array(0.99f, 0.1f, 0.0f)),   // contaminated (near bench 100)
      (2L, Array(0.0f, 0.0f, 1.0f)),    // orthogonal — admitted
      (3L, Array(0.5f, 0.5f, 0.7f)),    // mid-similarity — admitted at 0.9
      (4L, Array(0.0f, 0.0f, 0.0f)))    // zero norm — NULL cosine, admitted
    val stream = MemoryStream[(Long, Array[Float])]
    val screened = graft.streaming.StreamingCuration.semanticScreen(
      stream.toDF().toDF("id", "vec"), bench, "id", "vec", threshold = 0.9)
    val sink = screened.writeStream.format("memory").queryName("sem_screen")
      .outputMode("append").start()
    stream.addData(rows.take(2)); sink.processAllAvailable()
    stream.addData(rows.drop(2)); sink.processAllAvailable()
    sink.stop()
    val out = spark.table("sem_screen").collect()
    assert(out.length == 4)
    val admitted = out.filter(!_.getAs[Boolean]("is_contaminated"))
      .map(_.getAs[Long]("id")).toSet
    val batchAdmitted = graft.operators.Decontamination.decontaminateSemantic(
        rows.toDF("id", "vec"), bench, "id", "vec", threshold = 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(admitted == batchAdmitted && admitted == Set(2L, 3L, 4L))
    // the flagged row carries its audit cosine; zero-norm row carries NULL
    assert(out.find(_.getAs[Long]("id") == 1L).get.getAs[Double]("max_bench_cosine") > 0.9)
    assert(out.find(_.getAs[Long]("id") == 4L).get.isNullAt(2))
  }

  test("semantic screen: 1-row benchmark and array<double> vectors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // exactly ONE non-null benchmark vector (greatest() needs ≥2 args —
    // the 1-vector case must not throw), and double-typed embeddings
    // (the batch path is element-type-agnostic; the screen must be too)
    val bench = Seq((100L, Array(1.0, 0.0, 0.0))).toDF("id", "vec")
    val stream = MemoryStream[(Long, Array[Double])]
    val screened = graft.streaming.StreamingCuration.semanticScreen(
      stream.toDF().toDF("id", "vec"), bench, "id", "vec", threshold = 0.9)
    val sink = screened.writeStream.format("memory").queryName("sem_screen_1v")
      .outputMode("append").start()
    stream.addData(Seq(
      (1L, Array(0.99, 0.1, 0.0)),   // contaminated
      (2L, Array(0.0, 0.0, 1.0))))   // orthogonal — admitted
    sink.processAllAvailable(); sink.stop()
    val out = spark.table("sem_screen_1v").collect()
    val flagged = out.filter(_.getAs[Boolean]("is_contaminated"))
      .map(_.getAs[Long]("id")).toSet
    assert(flagged == Set(1L))
    assert(out.find(_.getAs[Long]("id") == 1L)
      .get.getAs[Double]("max_bench_cosine") > 0.9)
  }

  test("streamed incremental screen: two batches against a growing store == the operator-layer chain (ninth maintained surface)") {
    import graft.operators.Dedup
    import graft.streaming.StreamingCuration
    val dir = java.nio.file.Files.createTempDirectory("inc_screen").toString
    val store = s"$dir/store"; val kept = s"$dir/kept"; val ckpt = s"$dir/ckpt"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then sleeps"),
      (2L, "completely different content about distributed query engines"))
      .toDF("doc_id", "text")
    // seed the store: the materialized corpus signatures
    Dedup.minhashSignaturesPortable(corpus, "doc_id", "text", n = 3, numHashes = 64)
      .write.mode("overwrite").parquet(s"$store/base")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val sq = StreamingCuration.incrementalScreenSink(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      store, kept, ckpt, n = 3, numHashes = 64, threshold = 0.8)
    val batch1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and then sleeps"), // dup of corpus 1
      (11L, "entirely novel text with no counterpart in the corpus at all"))
    val batch2 = Seq(
      (20L, "entirely novel text with no counterpart in the corpus at all"), // dup of 11 (batch 1 keeper)
      (21L, "a second wholly fresh document closing out the stream test"))
    stream.addData(batch1); sq.processAllAvailable()
    stream.addData(batch2); sq.processAllAvailable()
    sq.stop()
    val streamedKept = StreamingCuration.readScreenKept(spark, kept)
      .select("doc_id").as[Long].collect().toSet
    assert(streamedKept == Set(11L, 21L),
      s"corpus dup AND previous-batch-keeper dup must drop: $streamedKept")
    // operator-layer chain over the same batches
    val sigs0 = Dedup.minhashSignaturesPortable(corpus, "doc_id", "text", 3, 64)
    val (kept1, sigs1) = Dedup.dropNearDuplicatesAgainstWithSignatures(
      sigs0, batch1.toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 64, portable = true)
    val grown = sigs0.union(
      sigs1.join(kept1.select($"doc_id".as("id")), Seq("id"), "left_semi"))
    val (kept2, sigs2) = Dedup.dropNearDuplicatesAgainstWithSignatures(
      grown, batch2.toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 64, portable = true)
    val opKept = (kept1.select("doc_id").as[Long].collect() ++
      kept2.select("doc_id").as[Long].collect()).toSet
    assert(streamedKept == opKept)
    // the store equals the chain's signature table, rows and all
    val storeRows = StreamingCuration.readScreenStore(spark, store)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    val opRows = grown.union(
        sigs2.join(kept2.select($"doc_id".as("id")), Seq("id"), "left_semi"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(storeRows == opRows,
      "the streamed store must equal the operator-layer chained signature table")
    sigs1.unpersist(); sigs2.unpersist()
    // an unseeded store is refused, not treated as an empty corpus
    val stream2 = MemoryStream[(Long, String)]
    val sq2 = StreamingCuration.incrementalScreenSink(
      stream2.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$dir/unseeded_store", s"$dir/unseeded_kept", s"$dir/unseeded_ckpt",
      n = 3, numHashes = 64)
    stream2.addData(batch1)
    val e = intercept[Exception] { sq2.processAllAvailable() }
    assert(e.getMessage.contains("seed"), e.getMessage)
    sq2.stop()

    // the banded-twin form (per-trigger corpus touch = pure scans):
    // identical kept rows, and the maintained band store equals
    // bandedSignatures of the maintained sig store
    val store2 = s"$dir/store_b"; val bandStore = s"$dir/bands_b"
    Dedup.minhashSignaturesPortable(corpus, "doc_id", "text", n = 3, numHashes = 64)
      .write.mode("overwrite").parquet(s"$store2/base")
    Dedup.bandedSignatures(spark.read.parquet(s"$store2/base"), 64, 16, portable = true)
      .write.mode("overwrite").parquet(s"$bandStore/base")
    val stream3 = MemoryStream[(Long, String)]
    val sq3 = StreamingCuration.incrementalScreenSink(
      stream3.toDF().toDF("doc_id", "text"), "doc_id", "text",
      store2, s"$dir/kept_b", s"$dir/ckpt_b", n = 3, numHashes = 64,
      threshold = 0.8, bandedPath = Some(bandStore))
    stream3.addData(batch1); sq3.processAllAvailable()
    stream3.addData(batch2); sq3.processAllAvailable()
    sq3.stop()
    val keptBanded = StreamingCuration.readScreenKept(spark, s"$dir/kept_b")
      .select("doc_id").as[Long].collect().toSet
    assert(keptBanded == streamedKept)
    val bandRows = spark.read.option("recursiveFileLookup", "true")
      .parquet(bandStore)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expBand = Dedup.bandedSignatures(
        StreamingCuration.readScreenStore(spark, store2), 64, 16, portable = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(bandRows == expBand && bandRows.nonEmpty,
      "the maintained band store must equal bandedSignatures of the sig store")
  }

  test("streamed IVF assignment: log == batch assignment; compacted store serves ann_topk identically") {
    import graft.streaming.StreamingCuration
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ann_assign_stream").toString
    val store = s"$dir/store"
    def vec(parts: Double*) = parts.toArray
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("cell", "centroid")
    // seed: an existing corpus's bulk assignment predating the stream
    val seedCorpus = Seq((1L, vec(0.9, 0.1)), (2L, vec(0.1, 0.9)))
      .toDF("vec_id", "emb")
    Similarity.ivfCellAssignments(seedCorpus, cents, "vec_id", "emb")
      .repartition($"cell")
      .write.partitionBy("cell").parquet(s"$store/base")
    val stream = MemoryStream[(Long, Array[Double])]
    val sq = StreamingCuration.annAssignSink(
      stream.toDF().toDF("vec_id", "emb"), "vec_id", "emb",
      cents, store, s"$dir/ckpt")
    val b1 = Seq((10L, vec(1.0, 0.2)), (11L, vec(0.3, 1.0)))
    val b2 = Seq((20L, vec(-1.0, 0.0)), (21L, vec(0.7, 0.7)))
    stream.addData(b1); sq.processAllAvailable()
    stream.addData(b2); sq.processAllAvailable()
    sq.stop()
    // the maintained log equals the batch operator over seed + batches
    val everything = seedCorpus.union((b1 ++ b2).toDF("vec_id", "emb"))
    val expected = Similarity.ivfCellAssignments(everything, cents, "vec_id", "emb")
      .select($"vec_id", $"cell").collect().map(_.toSeq).toSet
    val log = StreamingCuration.readAssignmentLog(spark, store)
    assert(log.select($"vec_id", $"cell").collect().map(_.toSeq).toSet == expected,
      "the maintained log must equal the batch assignment of everything")
    // the log serves annJoinIvfAssigned == the recompute form
    val queries = Seq((100L, vec(0.95, 0.05))).toDF("vec_id", "emb")
    val viaLog = Similarity.annJoinIvfAssigned(
      queries, log, cents, "vec_id", "emb", k = 2, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val recomputed = Similarity.annJoinIvfCentroids(
      queries, everything, cents, "vec_id", "emb", k = 2, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(viaLog == recomputed && viaLog.nonEmpty)
    // compaction: one cell-partitioned serving table, same rows, same
    // serving result; compacting INTO the log itself is refused
    StreamingCuration.compactAssignmentLog(spark, store, s"$dir/serving")
    val served = spark.read.parquet(s"$dir/serving")
    assert(served.select($"vec_id", $"cell").collect().map(_.toSeq).toSet == expected)
    val viaServing = Similarity.annJoinIvfAssigned(
      queries, served, cents, "vec_id", "emb", k = 2, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(viaServing == recomputed)
    // the retrain trigger rides the maintained surfaces too: drift of
    // the log (the recent side) against the compacted serving store
    // equals the shared categoricalDrift arithmetic over the two cell
    // histograms — the production cadence reading (monitor the log,
    // compact on schedule), version contract enforced on both frames
    val driftLS = Similarity.codebookDrift(log, served, cents)
      .collect().map(_.toSeq).toSet
    val driftDirect = graft.operators.Checks.categoricalDrift(
        log.select($"cell".cast("int").as("cell")),
        served.select($"cell".cast("int").as("cell")), "cell")
      .collect().map(_.toSeq).toSet
    assert(driftLS == driftDirect && driftLS.nonEmpty,
      "codebookDrift must serve from the maintained log and compacted store")
    val e = intercept[IllegalArgumentException](
      StreamingCuration.compactAssignmentLog(spark, store, s"$store/base"))
    assert(e.getMessage.contains("refused"), e.getMessage)
    // an empty/missing store is refused loudly
    val e2 = intercept[IllegalArgumentException](
      StreamingCuration.readAssignmentLog(spark, s"$dir/nowhere"))
    assert(e2.getMessage.contains("subtrees"), e2.getMessage)
    // a HALF-WRITTEN subtree (no _SUCCESS — a dead sink batch, or a
    // stale future batch after a checkpoint reset) is SKIPPED by the
    // serving read instead of poisoning it: same rows as before the
    // crash landed
    val half = new java.io.File(s"$store/batch_99")
    assert(half.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/batch_99/part-00000.parquet"),
      Array[Byte](1, 2, 3)) // not even parquet — reading it would fail
    val afterCrash = StreamingCuration.readAssignmentLog(spark, store)
    assert(afterCrash.select($"vec_id", $"cell").collect()
      .map(_.toSeq).toSet == expected,
      "marker-less half subtrees must be skipped, not read")
    // a store with ONLY half-written subtrees refuses loudly and says why
    val onlyHalf = s"$dir/onlyhalf"
    assert(new java.io.File(s"$onlyHalf/batch_0").mkdirs())
    val e3 = intercept[IllegalArgumentException](
      StreamingCuration.readAssignmentLog(spark, onlyHalf))
    assert(e3.getMessage.contains("_SUCCESS"), e3.getMessage)
  }

  test("streamed IVF assignment with carry: the maintained store serves the label consumers == the bulk artifact") {
    import graft.streaming.StreamingCuration
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ann_assign_carry").toString
    val store = s"$dir/store"
    def vec(parts: Double*) = parts.toArray
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("cell", "centroid")
    // the seed must carry the SAME columns the sink carries (the log
    // read's strict unionByName is the drift guard)
    val seedCorpus = Seq((1L, vec(0.9, 0.1), "a"), (2L, vec(0.1, 0.9), "b"))
      .toDF("vec_id", "emb", "lbl")
    Similarity.ivfCellAssignments(
        seedCorpus, cents, "vec_id", "emb", carry = Seq("lbl"))
      .repartition($"cell")
      .write.partitionBy("cell", "codebook_fp").parquet(s"$store/base")
    val stream = MemoryStream[(Long, Array[Double], String)]
    val sq = StreamingCuration.annAssignSink(
      stream.toDF().toDF("vec_id", "emb", "lbl"), "vec_id", "emb",
      cents, store, s"$dir/ckpt", carry = Seq("lbl"))
    val b1 = Seq((10L, vec(1.0, 0.2), "a"), (11L, vec(0.3, 1.0), "a"))
    val b2 = Seq((20L, vec(-1.0, 0.0), "b"), (21L, vec(0.7, 0.7), "b"))
    stream.addData(b1); sq.processAllAvailable()
    stream.addData(b2); sq.processAllAvailable()
    sq.stop()
    val everything = seedCorpus.union((b1 ++ b2).toDF("vec_id", "emb", "lbl"))
    val log = StreamingCuration.readAssignmentLog(spark, store)
    val queries = Seq((100L, vec(0.95, 0.05), "a"), (101L, vec(0.0, 1.0), "b"))
      .toDF("vec_id", "emb", "lbl")
    // the bulk artifact of everything that arrived — what the
    // maintained log must be indistinguishable from at serve time
    val bulk = Similarity.ivfCellAssignments(
      everything, cents, "vec_id", "emb", carry = Seq("lbl"))
    val agreeLog = Similarity.knnLabelAgreementIvfAssigned(
      queries, log, cents, "vec_id", "emb", "lbl", k = 2, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val agreeBulk = Similarity.knnLabelAgreementIvfAssigned(
      queries, bulk, cents, "vec_id", "emb", "lbl", k = 2, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(agreeLog == agreeBulk && agreeLog.nonEmpty,
      "the maintained log must serve the agreement diagnostic " +
        "identically to the bulk artifact")
    val hnLog = Similarity.hardNegativesIvfAssigned(
      queries, log, cents, "vec_id", "emb", "lbl", k = 2, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val hnBulk = Similarity.hardNegativesIvfAssigned(
      queries, bulk, cents, "vec_id", "emb", "lbl", k = 2, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(hnLog == hnBulk && hnLog.nonEmpty,
      "the maintained log must serve hard negatives identically to " +
        "the bulk artifact")
  }
}
