package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a" * 600),           // 600 bytes → 3 frames of 256
    (2L, "héllo"),             // multibyte: 5 chars, 6 bytes
    (3L, "")).toDF("doc_id", "text")

  test("binaryMeta: byte lengths (not char lengths), digest, magic bytes, frame count") {
    val out = Multimodal.binaryMeta(
        Multimodal.withBinaryPayload(docs, "text"), "payload")
      .select("doc_id", "byte_len", "content_md5", "magic_hex", "n_frames")
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("byte_len") shouldBe 600L
    out(1L).getAs[Long]("n_frames") shouldBe 3L
    out(2L).getAs[Long]("byte_len") shouldBe 6L // é is 2 bytes in UTF-8
    out(2L).getAs[String]("magic_hex") shouldBe "68C3A96C" // h, é(2), l
    out(3L).getAs[Long]("byte_len") shouldBe 0L
    out(3L).getAs[Long]("n_frames") shouldBe 0L
    out(1L).getAs[String]("content_md5") should have length 32
  }

  test("sampleFrames slices byte frames with stride; short payloads yield one frame") {
    val out = Multimodal.sampleFrames(
        Multimodal.withBinaryPayload(docs, "text"), "payload",
        frameSize = 256, stride = 2)
      .select("doc_id", "frames")
      .collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1)).toMap
    // 3 frames (0,1,2), stride 2 keeps frames 0 and 2
    out(1L).length shouldBe 2
    out(1L).head.length shouldBe 256
    out(1L)(1).length shouldBe 88 // 600 - 512
    out(2L).length shouldBe 1
    out(2L).head.length shouldBe 6
  }

  test("decodeFrameStub: deterministic 4-moment features; frame features flow through the UDF") {
    Multimodal.decodeFrameStub(Array[Byte](0, 10, 20)) shouldBe
      Multimodal.decodeFrameStub(Array[Byte](0, 10, 20))
    Multimodal.decodeFrameStub(Array.emptyByteArray) shouldBe Array(0.0, 0.0, 0.0, 0.0)
    val feats = Multimodal.extractFrameFeatures(
        Multimodal.sampleFrames(
          Multimodal.withBinaryPayload(docs.filter($"doc_id" === 1L), "text"), "payload"))
      .select("frame_features").head().getSeq[Seq[Double]](0)
    feats.length shouldBe 2
    feats.head.length shouldBe 4
    // all bytes are 'a' (97): mean 97, stddev 0, min 97, max 97
    feats.head shouldBe Seq(97.0, 0.0, 97.0, 97.0)
  }

  test("resizeFrames bounds every frame to the byte budget, deterministically") {
    val out = Multimodal.resizeFrames(
        Multimodal.sampleFrames(
          Multimodal.withBinaryPayload(docs, "text"), "payload"),
        target = 64)
      .select("doc_id", "frames_resized")
      .collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1)).toMap
    all(out(1L).map(_.length)) should be <= 64
    out(2L).head.length shouldBe 6 // already under budget: untouched
    Multimodal.resizeFrameStub("abcdefgh".getBytes, 4).toSeq shouldBe
      Multimodal.resizeFrameStub("abcdefgh".getBytes, 4).toSeq
  }

  test("batched decode matches the per-row UDF and inits the codec once per PARTITION") {
    val framed = Multimodal.sampleFrames(
        Multimodal.withBinaryPayload(docs, "text"), "payload")
      .repartition(2)
    val perRow = Multimodal.extractFrameFeatures(framed)
      .select("doc_id", "frame_features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Seq[Double]](1)).toMap
    val before = Multimodal.codecInits.get()
    val batched = Multimodal.extractFrameFeaturesBatched(framed)
      .select("doc_id", "frame_features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Seq[Double]](1)).toMap
    batched shouldBe perRow
    // the init-amortization contract: one codec handle per partition,
    // never per row or per frame
    (Multimodal.codecInits.get() - before) shouldBe 2L
  }

  test("REAL PNG codec: lossless round trip of the closed-form image; per-partition init") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 63L, 1000L).toDF("doc_id").repartition(2)
    val before = Multimodal.imageCodecInits.get()
    val out = Multimodal.decodePngFeaturesBatched(
        Multimodal.withGrayPngPayload(ids, "doc_id"), "payload")
      .select("doc_id", "width", "height", "px_sum")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    (Multimodal.imageCodecInits.get() - before) shouldBe 2L
    out.foreach { case (id, (w, h, sum)) =>
      w shouldBe 8 + id % 9
      h shouldBe 8 + id % 7
      val expected = (0L until w * h).map(i => (id * 31 + i) % 256).sum
      sum shouldBe expected // PNG gray is lossless: every sample exact
    }
  }

  test("REAL PNG codec: undecodable bytes yield null features, not a crash") {
    import spark.implicits._
    val junk = Seq((1L, "not a png".getBytes)).toDF("doc_id", "payload")
    val r = Multimodal.decodePngFeaturesBatched(junk, "payload")
      .select("width", "height", "px_sum").collect().head
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
    r.isNullAt(2) shouldBe true
  }

  test("REAL PNG resize: nearest-neighbour integer index map, hand-checked; " +
       "junk payloads yield nulls") {
    import spark.implicits._
    val ids = Seq(Tuple1(5L), Tuple1(12L)).toDF("doc_id")
    val out = Multimodal.resizePngBatched(
        Multimodal.withGrayPngPayload(ids, "doc_id"), "payload",
        outW = 4, outH = 3)
      .select("doc_id", "out_width", "out_height", "out_px_sum")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    out.keySet shouldBe Set(5L, 12L)
    out.foreach { case (id, (ow, oh, sum)) =>
      ow shouldBe 4L
      oh shouldBe 3L
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      val expected = (for (y2 <- 0 until 3; x2 <- 0 until 4) yield {
        val sy = y2 * h / 3
        val sx = x2 * w / 4
        (id * 31 + sy.toLong * w + sx) % 256
      }).sum
      sum shouldBe expected
    }
    val junk = Seq((1L, "nope".getBytes)).toDF("doc_id", "payload")
    val r = Multimodal.resizePngBatched(junk, "payload", 4, 3)
      .select("out_width", "out_height", "out_px_sum").collect().head
    (0 to 2).foreach(i => r.isNullAt(i) shouldBe true)
  }

  test("REAL WAV codec: chunk-walking parse recovers the closed-form waveform " +
       "exactly; per-partition init") {
    import spark.implicits._
    val ids = Seq(3L, 70L, 129L).toDF("doc_id").repartition(2)
    val before = Multimodal.audioCodecInits.get()
    val out = Multimodal.wavFeaturesBatched(
        Multimodal.withPcmWavPayload(ids, "doc_id"), "payload")
      .select("doc_id", "sample_rate", "n_samples", "duration_us",
        "peak_abs", "sum_sq", "sum_abs")
      .collect().map(r => r.getLong(0) -> r).toMap
    (Multimodal.audioCodecInits.get() - before) shouldBe 2L
    out.keySet shouldBe Set(3L, 70L, 129L)
    out.foreach { case (id, r) =>
      val n = (256 + (id % 64) * 16).toInt
      val samples = (0 until n).map(i =>
        ((id * 2654435761L + i.toLong * 40503L) % 65536L) - 32768L)
      r.getLong(1) shouldBe 8000L
      r.getLong(2) shouldBe n.toLong
      r.getLong(3) shouldBe n.toLong * 1000000L / 8000L
      r.getLong(4) shouldBe samples.map(math.abs).max
      r.getLong(5) shouldBe samples.map(v => v * v).sum
      r.getLong(6) shouldBe samples.map(math.abs).sum
    }
  }

  test("REAL WAV codec: data chunk is NOT at the fixed 44-byte offset " +
       "(JUNK chunk keeps the walker honest); malformed payloads yield nulls") {
    val wav = Multimodal.encodePcmWav(8000, Array(1, -2, 3))
    // a fixed-layout reader would look for "data" here and find JUNK
    new String(wav, 36, 4, "US-ASCII") shouldBe "JUNK"
    import spark.implicits._
    // corrupt the JUNK chunk's u32 size to 0xffffffff: a parser doing
    // size.toInt gets -1 and the walker stops advancing (or walks
    // backwards) — the Long-guarded walker must reject instead
    val hostile = wav.clone()
    hostile(40) = 0xff.toByte; hostile(41) = 0xff.toByte
    hostile(42) = 0xff.toByte; hostile(43) = 0xff.toByte
    val bad = Seq(
      (1L, "RIFFnope".getBytes),   // too short for a RIFF header
      (2L, wav.take(30)),          // fmt chunk truncated mid-body
      (3L, "not audio at all".getBytes),
      (4L, hostile)).toDF("doc_id", "payload")
    val rs = Multimodal.wavFeaturesBatched(bad, "payload")
      .select("sample_rate", "n_samples", "duration_us",
        "peak_abs", "sum_sq", "sum_abs").collect()
    rs should have length 4
    rs.foreach(r => (0 to 5).foreach(i => r.isNullAt(i) shouldBe true))
  }

  test("REAL WAV codec: negative samples sign-extend through the 16-bit " +
       "little-endian round trip") {
    val samples = Array(-32768, -1, 0, 1, 32767, -12345, 12345)
    val wav = Multimodal.encodePcmWav(44100, samples)
    val codec = Multimodal.wavFeaturesBatched(
      { import spark.implicits._
        Seq((1L, wav)).toDF("doc_id", "payload") }, "payload")
      .select("sample_rate", "n_samples", "peak_abs", "sum_sq", "sum_abs")
      .collect().head
    codec.getLong(0) shouldBe 44100L
    codec.getLong(1) shouldBe samples.length.toLong
    codec.getLong(2) shouldBe 32768L
    codec.getLong(3) shouldBe samples.map(v => v.toLong * v).sum
    codec.getLong(4) shouldBe samples.map(v => math.abs(v.toLong)).sum
  }

  test("REAL video demux: strided frame sampling recovers closed-form " +
       "pixel sums; malformed payloads are dropped; per-partition init") {
    import spark.implicits._
    val ids = Seq(2L, 9L).toDF("doc_id").repartition(2)
    val before = Multimodal.videoCodecInits.get()
    val out = Multimodal.videoFrameStatsBatched(
        Multimodal.withGrayVideoPayload(ids, "doc_id"), "doc_id", "payload",
        stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(4)) -> r).toMap
    (Multimodal.videoCodecInits.get() - before) shouldBe 2L
    Seq(2L, 9L).foreach { id =>
      val w = (4 + id % 5).toInt
      val h = (4 + id % 3).toInt
      val n = (6 + id % 5).toInt
      val sampled = (0 until n).filter(_ % 2 == 0)
      sampled.foreach { f =>
        val r = out((id, f.toLong))
        r.getLong(1) shouldBe w.toLong
        r.getLong(2) shouldBe h.toLong
        r.getLong(3) shouldBe n.toLong
        r.getLong(5) shouldBe
          (0 until w * h).map(i => (id * 31 + f.toLong * 7 + i) % 256).sum
      }
      // only the strided frames appear
      out.keys.count(_._1 == id) shouldBe sampled.size
    }
    val bad = Seq((1L, "GRV1".getBytes), (2L, "nope".getBytes),
      (3L, Multimodal.encodeGrayVideo(4, 4, 3, (_, _) => 7).take(20)))
      .toDF("doc_id", "payload")
    Multimodal.videoFrameStatsBatched(bad, "doc_id", "payload", 1)
      .count() shouldBe 0L
  }

  test("aHash: hand-checked bits on a half-dark half-bright image; " +
      "undecodable payload yields null") {
    // 4×2, left half 0, right half 255 → 2×1 cells: only the bright
    // cell's bit (index 1) is set
    val img = Multimodal.encodeGrayPng(4, 2,
      (x, _) => if (x < 2) 0 else 255)
    val out = Multimodal.aHashPngBatched(
        Seq((1L, img), (2L, "nope".getBytes)).toDF("doc_id", "payload"),
        "payload", blocksX = 2, blocksY = 1)
      .select("doc_id", "ahash")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    out(1L) shouldBe Some(2L)
    out(2L) shouldBe None
  }

  test("aHash: a FLAT image sets no bits (no cell exceeds the mean); " +
      "uneven block boundaries use the exact integer index map") {
    val flat = Multimodal.encodeGrayPng(5, 3, (_, _) => 77)
    Multimodal.aHashPngBatched(
        Seq((1L, flat)).toDF("doc_id", "payload"),
        "payload", blocksX = 2, blocksY = 2)
      .select("ahash").collect().head.getLong(0) shouldBe 0L
  }

  test("group PNG payloads: planted groups land within hamming 6, " +
      "md5-decorrelated bases land far apart") {
    import graft.operators.Dedup
    val ids = (0L until 16L).map(Tuple1(_)).toDF("doc_id")
    val sigs = Multimodal.aHashPngBatched(
        Multimodal.withGrayPngGroupPayload(ids, "doc_id"), "payload",
        blocksX = 10, blocksY = 6)
      .select(col("doc_id"), col("ahash"))
    val hashes = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force hamming: every intra-group pair ≤ 6, every
    // cross-group pair far above it
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (i <- 0L until 16L; j <- i + 1 until 16L) {
      val h = ham(hashes(i), hashes(j))
      if (i / 4 == j / 4) assert(h <= 6, s"intra pair ($i,$j) hamming $h")
      else assert(h > 6, s"cross pair ($i,$j) hamming $h")
    }
    // the slice-blocked pair join finds exactly the brute-force set
    // that agrees on ≥1 of the 4 slice keys
    def slice(v: Long, s: Int) = (v >> (s * 15)) & 0x7fff
    val expected = (for {
      i <- 0L until 16L; j <- i + 1 until 16L
      if ham(hashes(i), hashes(j)) <= 6
      if (0 until 4).exists(s => slice(hashes(i), s) == slice(hashes(j), s))
    } yield (i, j)).toSet
    val got = Dedup.hammingNearDupPairs(sigs, "doc_id", "ahash", 6)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe expected
    expected should not be empty
  }
}
