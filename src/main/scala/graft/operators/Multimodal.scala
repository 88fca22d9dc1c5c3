package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: the payload is an opaque `binary` column plus typed
  * metadata; all Spark-side plumbing (schema, slicing, batching,
  * partitioning) is real, while the codec itself is a clearly-marked
  * deterministic STUB — the image/audio libraries are not in this
  * container, and at cluster scale the codec is a vendored native lib
  * behind exactly this seam.
  *
  * Design: metadata extraction and frame slicing are pure Catalyst
  * (codegen'd, pushdown-friendly); only the per-frame "decode" is a
  * UDF, and it receives already-sliced bounded frames so its cost is
  * proportional to sampled bytes, not payload size.
  */
object Multimodal {

  /** Attach a binary payload column derived from text — the testdata
    * stand-in for reading real media bytes (`binaryFile` data source /
    * parquet `binary` columns in production). */
  def withBinaryPayload(df: DataFrame, textCol: String,
                        binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, encode(col(textCol), "UTF-8"))

  /** Typed metadata over an opaque binary column: byte length, content
    * digest, leading magic bytes (format sniffing), frame count for a
    * fixed frame size. Pure built-ins — one narrow projection. */
  def binaryMeta(df: DataFrame, binCol: String, frameSize: Int = 256): DataFrame =
    df
      .withColumn("byte_len", length(col(binCol)).cast("long"))
      .withColumn("content_md5", md5(col(binCol)))
      .withColumn("magic_hex", hex(substring(col(binCol), 1, 4)))
      .withColumn("n_frames",
        ceil(col("byte_len").cast("double") / frameSize).cast("long"))

  /** Sample every `stride`-th fixed-size frame from a binary payload:
    * `substr` on binary slices bytes, `transform(sequence(...))` builds
    * the frame array without exploding — rows stay 1:1 with documents
    * until the caller chooses to explode. */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int = 256,
                   stride: Int = 2, framesCol: String = "frames"): DataFrame = {
    val bin = col(binCol)
    val nFrames = ceil(length(bin).cast("double") / frameSize).cast("int")
    df.withColumn(framesCol,
      transform(
        filter(sequence(lit(0), greatest(nFrames, lit(1)) - 1),
          i => i % stride === 0),
        i => bin.substr(i * frameSize + 1, lit(frameSize))))
  }

  /** STUB codec ??? — deterministic fake "decode + feature extract".
    *
    * A real deployment vendors an image/audio codec here (JNI or pure
    * JVM) with THIS exact signature: bytes of one frame in, fixed-width
    * feature vector out. The stub derives 4 moments from the byte
    * histogram so tests exercise real data flow end-to-end. */
  def decodeFrameStub(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null || bytes.isEmpty) return Array(0.0, 0.0, 0.0, 0.0)
    val n = bytes.length.toDouble
    var sum = 0.0; var sumSq = 0.0; var mn = 255.0; var mx = 0.0
    bytes.foreach { b =>
      val v = (b & 0xff).toDouble
      sum += v; sumSq += v * v
      if (v < mn) mn = v
      if (v > mx) mx = v
    }
    val mean = sum / n
    Array(mean, math.sqrt(math.max(0.0, sumSq / n - mean * mean)), mn, mx)
  }

  private val decodeFramesUdf =
    udf((frames: Seq[Array[Byte]]) =>
      if (frames == null) Seq.empty[Array[Double]]
      else frames.map(decodeFrameStub))

  /** Per-frame feature extraction over sampled frames (UDF over the
    * bounded frame array — cost is proportional to the sample, not
    * the payload; swap [[decodeFrameStub]] for the real codec). */
  def extractFrameFeatures(df: DataFrame, framesCol: String = "frames",
                           featCol: String = "frame_features"): DataFrame =
    df.withColumn(featCol, decodeFramesUdf(col(framesCol)))

  /** STUB resize — deterministic byte-stride downsample of one frame
    * to `target` bytes (real image resize lives behind the same
    * codec seam; the Spark-side contract — bounded output size per
    * frame — is what matters to the pipeline). */
  def resizeFrameStub(bytes: Array[Byte], target: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty || target <= 0) return Array.emptyByteArray
    if (bytes.length <= target) return bytes
    Array.tabulate(target)(i => bytes((i.toLong * bytes.length / target).toInt))
  }

  private val resizeFramesUdf =
    udf((frames: Seq[Array[Byte]], target: Int) =>
      if (frames == null) Seq.empty[Array[Byte]]
      else frames.map(f => resizeFrameStub(f, target)))

  /** Resize every sampled frame to a bounded byte budget. */
  def resizeFrames(df: DataFrame, framesCol: String = "frames",
                   target: Int = 64, outCol: String = "frames_resized"): DataFrame =
    df.withColumn(outCol, resizeFramesUdf(col(framesCol), lit(target)))

  // --- batched decode (the mapInPandas batch shape, JVM form) -----------

  /** Codec handle seam: real codecs (libjpeg/ffmpeg via JNI, or a JVM
    * decoder) pay an expensive INIT that must be amortized per
    * partition, never per row — exactly what python's `mapInPandas`
    * batch shape buys. The stub records instantiations so the
    * one-init-per-partition contract is testable. */
  final class CodecHandle private[Multimodal] () {
    def decode(bytes: Array[Byte]): Array[Double] = decodeFrameStub(bytes)
  }

  /** Count of codec-handle instantiations (test observability for the
    * init-amortization contract; local-mode tasks share the JVM). */
  val codecInits = new java.util.concurrent.atomic.AtomicLong(0)

  private def newCodecHandle(): CodecHandle = {
    codecInits.incrementAndGet()
    new CodecHandle
  }

  // --- REAL codec through the same seam (javax.imageio PNG) -------------

  /** Count of REAL image-codec instantiations (same observability as
    * [[codecInits]] for the stub path). */
  val imageCodecInits = new java.util.concurrent.atomic.AtomicLong(0)

  /** One-time JVM-wide ImageIO config: the default stream cache spills
    * to TEMP FILES on disk — under a 32-thread decode fan-out that is
    * file creation + I/O contention per image (the q83 full-suite wall
    * drift). Heap-backed cache instead; payloads are KB-sized. */
  private lazy val imageIoHeapCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Real JVM image codec behind the same handle seam as
    * [[CodecHandle]]: javax.imageio PNG (JDK built-in, no new deps).
    * Exists so the batched-decode and one-init-per-partition contracts
    * are exercised against bytes that ACTUALLY decode — the stub seam
    * stays for formats whose codecs aren't in this container. Holds
    * ONE `ImageReader` for its lifetime (`ImageIO.read` re-scans the
    * plugin registry and allocates a fresh reader per call). */
  final class ImageCodecHandle private[Multimodal] () {
    imageIoHeapCache
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()

    /** Decode a PNG to its full 8-bit gray raster (row-major).
      * Undecodable bytes → None. */
    def decodeRaw(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      val img =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis, true, true)
            reader.read(0)
          } finally {
            reader.setInput(null)
            iis.close()
          }
        } catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        Some((w, h, px))
      }
    }

    /** Decode a PNG; features = [width, height, pixel sum] over the
      * 8-bit gray channel. Undecodable bytes → nulls upstream. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Long)] =
      decodeRaw(bytes).map { case (w, h, px) =>
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); i += 1 }
        (w, h, sum)
      }
  }

  private def newImageCodecHandle(): ImageCodecHandle = {
    imageCodecInits.incrementAndGet()
    new ImageCodecHandle
  }

  /** Encode an 8-bit grayscale PNG with `pixel(x, y)` values (0-255).
    * PNG gray is lossless, so decode recovers every sample exactly —
    * the round-trip the q83 oracle proves from the generating
    * formula. */
  def encodeGrayPng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    imageIoHeapCache // heap-backed stream cache (see above)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic gray-PNG payload per row: width = 8 + id % 9,
    * height = 8 + id % 7, pixel(x, y) = (id·31 + y·width + x) % 256 —
    * a closed-form image an SQL oracle can recompute without any
    * codec, making the REAL encode→decode round trip hash-checkable. */
  def withGrayPngPayload(df: DataFrame, idCol: String,
                         binCol: String = "payload"): DataFrame = {
    val gen = udf { (id: Long) =>
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      encodeGrayPng(w, h, (x, y) => ((id * 31 + y.toLong * w + x) % 256).toInt)
    }
    df.withColumn(binCol, gen(col(idCol)))
  }

  /** Batched REAL resize: decode → nearest-neighbour sample to
    * (outW, outH) → resized-raster stats, ONE codec handle per
    * partition. The index map is exact integer arithmetic —
    * `srcX = (x·w) div outW` — so the resized raster is an
    * engine-replayable pure function of the source pixels and the
    * whole decode→resize→encode→decode chain hash-certifies against
    * a closed-form oracle (q146; the REAL counterpart of
    * [[resizeFrameStub]]'s byte-stride seam). Appends
    * out_width/out_height/out_px_sum; undecodable payloads yield
    * nulls. */
  def resizePngBatched(df: DataFrame, binCol: String,
                       outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, "target dims must be positive")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val outSchema = df.schema
      .add("out_width", LongType).add("out_height", LongType)
      .add("out_px_sum", LongType)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val codec = newImageCodecHandle() // per-PARTITION init, not per row
      rows.map { r =>
        val resized = codec.decodeRaw(r.getAs[Array[Byte]](binIdx)).map {
          case (w, h, px) =>
            var sum = 0L
            var y = 0
            while (y < outH) {
              val sy = y * h / outH
              var x = 0
              while (x < outW) { sum += px(sy * w + (x * w / outW)); x += 1 }
              y += 1
            }
            sum
        }
        resized match {
          case Some(sum) =>
            Row.fromSeq(r.toSeq ++ Seq(outW.toLong, outH.toLong, sum))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic gray-PNG payload with PLANTED NEAR-DUPLICATES:
    * every four consecutive ids share one base image (base = id div
    * 4, fixed 20×12 raster, pixel = first md5 byte of "base:pos")
    * and each id perturbs a single id-dependent pixel
    * (position (id·17) % 240 gets +128 mod 256) — group members are
    * perceptually near-identical while DISTINCT bases are
    * md5-decorrelated (a linear gradient family would leave distant
    * bases near-identical whenever their offsets collide mod 256,
    * quadratic pair mass at scale; hashed pixels make cross-base
    * hamming ~Binomial(60, ½)). An SQL oracle recomputes every
    * pixel closed-form from the same md5 coordinate. The image-dedup
    * companion of [[withGrayPngPayload]]. */
  def withGrayPngGroupPayload(df: DataFrame, idCol: String,
                              binCol: String = "payload"): DataFrame = {
    val gen = udf { (id: Long) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val base = id / 4
      val hot = (id * 17 % 240).toInt
      encodeGrayPng(20, 12, { (x, y) =>
        md.reset()
        val d = md.digest(s"$base:${y * 20 + x}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val p = d(0) & 0xff
        if (y * 20 + x == hot) ((p + 128) % 256) else p
      })
    }
    df.withColumn(binCol, gen(col(idCol)))
  }

  /** Batched REAL average-hash (aHash): decode → pool the raster
    * into `blocksX`×`blocksY` cells on exact integer boundaries
    * (`x0 = bx·w div blocksX`, the [[resizePngBatched]] index-map
    * discipline) → bit(by·blocksX + bx) = cell sum · (w·h) > total
    * sum · cell pixels, packed into one long — the perceptual
    * fingerprint an image-dedup pass feeds into the SAME hamming
    * blocking tier text SimHash uses
    * ([[Dedup.hammingNearDupPairs]]). All-integer comparisons make
    * the hash a pure function of the decoded pixels, so the whole
    * encode→decode→pool→threshold chain hash-certifies against a
    * closed-form oracle (q207). Keep blocksX·blocksY ≤ 60 so packed
    * hashes stay clear of the sign bit in every engine. ONE codec
    * handle per partition; undecodable payloads yield null. */
  def aHashPngBatched(df: DataFrame, binCol: String,
                      blocksX: Int, blocksY: Int): DataFrame = {
    require(blocksX >= 1 && blocksY >= 1 && blocksX * blocksY <= 60,
      "block grid must be 1..60 cells")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val outSchema = df.schema.add("ahash", LongType)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val codec = newImageCodecHandle() // per-PARTITION init, not per row
      rows.map { r =>
        val hash = codec.decodeRaw(r.getAs[Array[Byte]](binIdx)).map {
          case (w, h, px) =>
            var total = 0L
            var i = 0
            while (i < px.length) { total += px(i); i += 1 }
            val wh = w.toLong * h
            var bits = 0L
            var by = 0
            while (by < blocksY) {
              val y0 = by * h / blocksY; val y1 = (by + 1) * h / blocksY
              var bx = 0
              while (bx < blocksX) {
                val x0 = bx * w / blocksX; val x1 = (bx + 1) * w / blocksX
                var bs = 0L
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) { bs += px(y * w + x); x += 1 }
                  y += 1
                }
                val cellPx = (y1 - y0).toLong * (x1 - x0)
                if (bs * wh > total * cellPx)
                  bits |= 1L << (by * blocksX + bx)
                bx += 1
              }
              by += 1
            }
            bits
        }
        hash match {
          case Some(b) => Row.fromSeq(r.toSeq :+ b)
          case None    => Row.fromSeq(r.toSeq :+ null)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Batched REAL decode: ONE ImageIO codec handle per partition
    * streams all its rows (the mapInPandas batch shape, JVM form —
    * same contract as [[extractFrameFeaturesBatched]]). Appends
    * width/height/px_sum; undecodable payloads yield nulls. */
  def decodePngFeaturesBatched(df: DataFrame, binCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val outSchema = df.schema
      .add("width", LongType).add("height", LongType).add("px_sum", LongType)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val codec = newImageCodecHandle() // per-PARTITION init, not per row
      rows.map { r =>
        codec.decode(r.getAs[Array[Byte]](binIdx)) match {
          case Some((w, h, sum)) =>
            Row.fromSeq(r.toSeq ++ Seq(w.toLong, h.toLong, sum))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }(Encoders.row(outSchema))
  }

  // --- REAL audio codec (RIFF/WAVE PCM, pure JVM) -----------------------

  /** Count of REAL audio-codec instantiations (same observability as
    * [[imageCodecInits]]). */
  val audioCodecInits = new java.util.concurrent.atomic.AtomicLong(0)

  /** Real RIFF/WAVE PCM-16 codec behind the same per-partition handle
    * seam as [[ImageCodecHandle]]: a chunk-walking parser (fmt /
    * data located by iterating the chunk list, unknown chunks
    * skipped with the RIFF odd-size pad rule — NOT by fixed 44-byte
    * offsets, so payloads carrying extra metadata chunks still
    * parse) plus a writer that deliberately inserts a JUNK chunk
    * between fmt and data to keep the walker honest. Pure JVM byte
    * twiddling — no audio library needed for PCM. */
  final class WavCodecHandle private[Multimodal] () {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Parse a PCM-16 mono/stereo WAV: walk the chunk list, return
      * (sampleRate, channels, samples interleaved). Malformed bytes
      * or non-PCM-16 → None. */
    def parse(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (bytes == null || bytes.length < 12 ||
          tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
      var off = 12
      var rate = -1; var channels = -1; var bits = -1
      var samples: Array[Int] = null
      while (off + 8 <= bytes.length) {
        val id = tag(bytes, off)
        val size32 = u32(bytes, off + 4) // u32: corrupt sizes must not
        val body = off + 8               // wrap negative and walk back
        if (size32 > bytes.length - body) return None
        val size = size32.toInt
        id match {
          case "fmt " =>
            if (size < 16 || u16(bytes, body) != 1) return None // PCM only
            channels = u16(bytes, body + 2)
            rate = u32(bytes, body + 4).toInt
            bits = u16(bytes, body + 14)
            if (bits != 16 || channels < 1) return None
          case "data" =>
            val n = size / 2
            samples = new Array[Int](n)
            var i = 0
            while (i < n) {
              samples(i) = (u16(bytes, body + 2 * i) << 16) >> 16 // sign-extend
              i += 1
            }
          case _ => () // unknown chunk: skip
        }
        off = body + size + (size & 1) // RIFF chunks are word-aligned
      }
      if (rate <= 0 || samples == null) None
      else Some((rate, channels, samples))
    }

    /** Parse + per-payload integer stats: (sample_rate, n_samples,
      * duration_us, peak_abs, sum_sq, sum_abs) — all exact integer
      * arithmetic, so the whole encode→parse→stats chain is
      * hash-checkable against a closed-form oracle. */
    def decodeStats(bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long, Long)] =
      parse(bytes).map { case (rate, channels, samples) =>
        val n = samples.length / channels
        var peak = 0L; var sumSq = 0L; var sumAbs = 0L
        var i = 0
        while (i < samples.length) {
          val v = samples(i).toLong
          val a = math.abs(v)
          if (a > peak) peak = a
          sumSq += v * v
          sumAbs += a
          i += 1
        }
        (rate.toLong, n.toLong, n.toLong * 1000000L / rate, peak, sumSq, sumAbs)
      }
  }

  private def newWavCodecHandle(): WavCodecHandle = {
    audioCodecInits.incrementAndGet()
    new WavCodecHandle
  }

  /** Encode mono PCM-16 samples as a RIFF/WAVE payload. A 7-byte JUNK
    * chunk (plus its odd-size pad byte) sits between fmt and data so
    * any consumer that assumes the fixed 44-byte layout — instead of
    * walking chunks — breaks loudly in tests. */
  def encodePcmWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val dataSize = samples.length * 2
    val junkSize = 7
    val riffSize = 4 + (8 + 16) + (8 + junkSize + 1) + (8 + dataSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                    // PCM
      .putShort(1.toShort)                    // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)                 // byte rate
      .putShort(2.toShort)                    // block align
      .putShort(16.toShort)                   // bits/sample
    bb.put("JUNK".getBytes("US-ASCII")).putInt(junkSize)
      .put(Array.fill[Byte](junkSize + 1)(0)) // body + word-align pad
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i).toShort); i += 1 }
    bb.array()
  }

  /** Deterministic PCM WAV payload per row: 8 kHz mono,
    * n = 256 + id % 64 · 16 samples,
    * sample(i) = (id · 2654435761 + i · 40503) mod 65536 − 32768 —
    * a closed-form waveform an SQL oracle recomputes without any
    * codec, making the REAL encode→parse round trip hash-checkable
    * (the audio analog of [[withGrayPngPayload]]). */
  def withPcmWavPayload(df: DataFrame, idCol: String,
                        binCol: String = "payload"): DataFrame = {
    val gen = udf { (id: Long) =>
      val n = (256 + (id % 64) * 16).toInt
      val samples = Array.tabulate(n) { i =>
        (((id * 2654435761L + i.toLong * 40503L) % 65536L) - 32768L).toInt
      }
      encodePcmWav(8000, samples)
    }
    df.withColumn(binCol, gen(col(idCol)))
  }

  /** Batched REAL audio decode: ONE WAV codec handle per partition
    * streams all its rows (same mapInPandas batch shape as
    * [[decodePngFeaturesBatched]]). Appends sample_rate / n_samples /
    * duration_us / peak_abs / sum_sq / sum_abs; unparseable payloads
    * yield nulls. */
  def wavFeaturesBatched(df: DataFrame, binCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val outSchema = df.schema
      .add("sample_rate", LongType).add("n_samples", LongType)
      .add("duration_us", LongType).add("peak_abs", LongType)
      .add("sum_sq", LongType).add("sum_abs", LongType)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val codec = newWavCodecHandle() // per-PARTITION init, not per row
      rows.map { r =>
        codec.decodeStats(r.getAs[Array[Byte]](binIdx)) match {
          case Some((rate, n, durUs, peak, sumSq, sumAbs)) =>
            Row.fromSeq(r.toSeq ++ Seq(rate, n, durUs, peak, sumSq, sumAbs))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null))
        }
      }
    }(Encoders.row(outSchema))
  }

  // --- raw-video container (header + fixed-size gray frames) ------------

  /** Count of raw-video codec instantiations. */
  val videoCodecInits = new java.util.concurrent.atomic.AtomicLong(0)

  /** Raw gray video container "GRV1": 4-byte magic, then u16-LE
    * width / height / frame count, then `n` frames of `w·h` gray
    * bytes each. The video-shaped sibling of [[WavCodecHandle]] —
    * a real header-parsing, frame-slicing demuxer (the production
    * analog is an ffmpeg demux behind this exact seam), so STRIDED
    * frame sampling — the core video-pipeline op — is exercised
    * against bytes that actually parse. */
  final class VideoCodecHandle private[Multimodal] () {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    /** Parse the container and return every `stride`-th frame's
      * (frame_idx, px_sum) plus the dimensions. Malformed or
      * truncated payloads → None. */
    def sampleFrameStats(bytes: Array[Byte], stride: Int)
        : Option[(Int, Int, Int, Seq[(Int, Long)])] = {
      if (bytes == null || bytes.length < 10 ||
          bytes(0) != 'G' || bytes(1) != 'R' ||
          bytes(2) != 'V' || bytes(3) != '1') return None
      val w = u16(bytes, 4); val h = u16(bytes, 6); val n = u16(bytes, 8)
      // u16·u16 overflows Int — size math in Long; a passing guard
      // bounds everything by bytes.length, so the Int cast is safe
      if (w < 1 || h < 1 ||
          bytes.length.toLong < 10L + n.toLong * (w.toLong * h)) return None
      val frameSize = w * h
      val stats = (0 until n).filter(_ % stride == 0).map { f =>
        val off = 10 + f * frameSize
        var sum = 0L
        var i = 0
        while (i < frameSize) { sum += (bytes(off + i) & 0xff); i += 1 }
        (f, sum)
      }
      Some((w, h, n, stats))
    }
  }

  private def newVideoCodecHandle(): VideoCodecHandle = {
    videoCodecInits.incrementAndGet()
    new VideoCodecHandle
  }

  /** Encode a GRV1 payload with `pixel(frame, i)` gray values. */
  def encodeGrayVideo(width: Int, height: Int, nFrames: Int,
                      pixel: (Int, Int) => Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && nFrames >= 0, "bad dimensions")
    val frameSize = width * height
    val out = new Array[Byte](10 + nFrames * frameSize)
    out(0) = 'G'; out(1) = 'R'; out(2) = 'V'; out(3) = '1'
    out(4) = (width & 0xff).toByte; out(5) = ((width >> 8) & 0xff).toByte
    out(6) = (height & 0xff).toByte; out(7) = ((height >> 8) & 0xff).toByte
    out(8) = (nFrames & 0xff).toByte; out(9) = ((nFrames >> 8) & 0xff).toByte
    var f = 0
    while (f < nFrames) {
      var i = 0
      while (i < frameSize) {
        out(10 + f * frameSize + i) = (pixel(f, i) & 0xff).toByte
        i += 1
      }
      f += 1
    }
    out
  }

  /** Deterministic GRV1 payload per row: w = 4 + id % 5,
    * h = 4 + id % 3, n = 6 + id % 5 frames,
    * pixel(f, i) = (id·31 + f·7 + i) % 256 — closed-form video an
    * SQL oracle recomputes without any demuxer. */
  def withGrayVideoPayload(df: DataFrame, idCol: String,
                           binCol: String = "payload"): DataFrame = {
    val gen = udf { (id: Long) =>
      val w = (4 + id % 5).toInt
      val h = (4 + id % 3).toInt
      val n = (6 + id % 5).toInt
      encodeGrayVideo(w, h, n,
        (f, i) => ((id * 31 + f.toLong * 7 + i) % 256).toInt)
    }
    df.withColumn(binCol, gen(col(idCol)))
  }

  /** Batched REAL frame sampling: ONE demuxer handle per partition;
    * every `stride`-th frame's pixel sum emitted as one row
    * (doc-to-frames explode happens AFTER the bounded per-payload
    * stats, so shuffled bytes are 16/row, not frame rasters).
    * Output: idCol, width, height, n_frames, frame_idx, px_sum;
    * malformed payloads are dropped (quarantine upstream via
    * [[binaryMeta]]'s magic sniff). */
  def videoFrameStatsBatched(df: DataFrame, idCol: String, binCol: String,
                             stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructType}
    val outSchema = new StructType()
      .add("doc_id", LongType).add("width", LongType)
      .add("height", LongType).add("n_frames", LongType)
      .add("frame_idx", LongType).add("px_sum", LongType)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val codec = newVideoCodecHandle() // per-PARTITION init
      rows.flatMap { r =>
        codec.sampleFrameStats(r.getAs[Array[Byte]](binIdx), stride) match {
          case Some((w, h, n, stats)) =>
            val id = r.getLong(idIdx)
            stats.map { case (f, sum) =>
              Row(id, w.toLong, h.toLong, n.toLong, f.toLong, sum)
            }
          case None => Nil
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Per-frame feature extraction with `mapPartitions` batching — the
    * JVM analog of `mapInPandas`: ONE codec handle per partition
    * streams all its rows (swap the stub handle for a JNI codec and
    * the init cost amortizes over the partition, not per row/frame).
    * Appends `featCol: array<array<double>>` to the schema. */
  def extractFrameFeaturesBatched(df: DataFrame, framesCol: String = "frames",
                                  featCol: String = "frame_features"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val outSchema = df.schema.add(featCol, ArrayType(ArrayType(DoubleType)))
    val framesIdx = df.schema.fieldIndex(framesCol)
    df.mapPartitions { rows =>
      val codec = newCodecHandle() // per-PARTITION init, not per row
      rows.map { r =>
        val frames = r.getSeq[Array[Byte]](framesIdx)
        val feats =
          if (frames == null) Seq.empty[Array[Double]]
          else frames.map(codec.decode)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }
}
