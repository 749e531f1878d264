package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing
  * (BASELINE.json north star).
  *
  * Model: media is an opaque `BinaryType` payload column + a typed
  * metadata struct (mime, width/height/duration, source uri). All the
  * Spark-side machinery — schema, partition-sized batch processing,
  * column pruning (metadata-only queries never deserialize payloads) —
  * is real. Image decode/resize are REAL (`decodeImage`,
  * `resizeImages` — `javax.imageio`) and WAV audio parse/PCM
  * extraction is REAL (`decodeAudio` — `javax.sound.sampled`), both
  * JDK-shipped. For compressed media (mp3/ogg/mp4) the JDK has no
  * codec, so the split is: container/frame METADATA (duration, rates,
  * dimensions) is REAL byte-level parsing — [[MediaProbe]] — while
  * PCM/pixel DECODE keeps the deterministic stand-in kernels
  * (`decodeFeatures`/`samplePayload`) behind the same (bytes →
  * features / bytes → bytes) contract, marking where a JNI/ffmpeg or
  * model-server call would run.
  *
  * Scale notes: payloads ride in Parquet binary columns — Parquet
  * keeps them out of dictionary encoding and the vectorized reader
  * streams them; `mapPartitions` processes a partition's rows as one
  * iterator (the JVM analogue of a pandas-batched UDF) so a real codec
  * could amortize per-batch model/codec setup. Partition sizing for
  * ~MB payloads comes from `maxRecordsPerFile`/`maxPartitionBytes`,
  * not row counts.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("uri", StringType)))

  /** Wrap a text table into the multimodal shape with a deterministic
    * fake payload (UTF-8 bytes of the text) — the test harness's stand-in
    * for real image bytes. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        concat(lit("mem://doc/"), col("doc_id")).as("uri")).as("meta"))

  /** Metadata-only projection: never touches payload bytes (column
    * pruning — the binary column's pages are not read). */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.mime").as("mime"),
      octet_length(col("payload")).as("byte_len"))

  private val featureDim = 8

  /** Batch "decode + feature extract" over payload bytes via
    * mapPartitions. A real implementation swaps `fakeDecode` for a
    * codec; everything else (encoder schema, batch shape, partition
    * iteration) stays. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("feature", ArrayType(DoubleType, containsNull = false))))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      // Per-partition setup would init the codec / model session here.
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, fakeDecode(bytes))
      }
    }(enc)
  }

  /** Deterministic fake decoder: 8 byte-histogram moments. Replace with
    * a real codec behind the same (bytes → fixed-dim vector) contract. */
  private def fakeDecode(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](featureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % featureDim) += (bytes(i) & 0xff) / 255.0
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < featureDim) { out(j) = out(j) / bytes.length; j += 1 }
    }
    out
  }

  // ------------------------------------------------ real image codec

  /** Deterministic RGB PNG fixture table: one width×height image per
    * input id, pixel channels = linear formulas of (id, x, y). Because
    * the pixels are closed-form, an oracle can compute the decoded
    * channel means WITHOUT a decoder of its own — so a query over
    * `decodeImage` hash-verifies the whole encode → store → decode
    * loop (PNG is lossless for RGB). Generation runs in the same
    * mapPartitions batch shape as decoding. */
  /** `rich = true` swaps the linear channel formulas for products of
    * two linears mod 256 — pseudo-random per (id, x, y). The plain
    * linear raster shifts by a CONSTANT mod 256 as id varies, and
    * block-vs-global mean comparisons are translation-invariant except
    * at wraps, so small ids all share one aHash; a fingerprint fixture
    * needs the rich raster (measured: images 0..15 hash identically on
    * the linear raster, all distinct on the rich one). */
  def imageTable(ids: DataFrame, width: Int = 16, height: Int = 12,
                 rich: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val in = ids.select(col(ids.columns.head).cast(LongType))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val rr = (if (rich) ((id * 7 + x * 3 + y * 5) * (id * 13 + x * 7 + y * 11)) % 256
                      else (id * 7 + x * 3 + y * 5) % 256).toInt
            val gg = (if (rich) ((id * 11 + x + y * 2) * (id * 3 + x * 5 + y * 7)) % 256
                      else (id * 11 + x + y * 2) % 256).toInt
            val bb = (if (rich) ((id * 13 + x * 3 + y) * (id * 5 + x * 11 + y * 3)) % 256
                      else (id * 13 + x * 3 + y) % 256).toInt
            img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray,
          Row("image/png", width, height, null, s"mem://img/$id"))
      }
    }(enc)
  }

  /** REAL image decode — `javax.imageio` (JDK-shipped, no external
    * dependency): payload bytes (PNG/BMP/GIF/JPEG) → decoded
    * dimensions + per-channel means. Same mapPartitions batch kernel
    * seam as `decodeFeatures`, which remains the codec-free
    * deterministic twin for formats the JDK can't read. Channel sums
    * accumulate in Long (exact — bounded integers), so the emitted
    * means are order-independent and oracle-pinnable. */
  def decodeImage(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      // per-partition: ImageIO scans for plugins once per JVM; a real
      // model/codec session would init here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Row(id, 0, 0, 0.0, 0.0, 0.0)
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          if (n == 0) Row(id, w, h, 0.0, 0.0, 0.0)
          else Row(id, w, h, sr / n, sg / n, sb / n)
        }
      }
    }(enc)
  }

  /** Perceptual AVERAGE-HASH (aHash, public literature) through the
    * real decode seam: decode → per-block gray means on a grid×grid
    * grid (block of pixel (x,y) = ((x·grid)/w, (y·grid)/h), integer
    * division — well-defined for any dimensions) → bit b(by·grid+bx) =
    * block mean > mean-of-block-means (strict) → one 64-bit signature
    * per image. The multimodal member of the near-dup family: exact
    * copies hash identically, small edits flip few bits, and the
    * signature feeds the same pigeonhole Hamming machinery as SimHash
    * ([[Dedup.hammingPairs]]). Gray = r+g+b (integer sum, no rounding);
    * block/global means are IEEE doubles computed identically on the
    * oracle side, so the bits are hash-pinnable. */
  def imageAHash(media: DataFrame, grid: Int = 8): DataFrame = {
    require(grid * grid <= 64, "grid*grid bits must fit a 64-bit hash")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("ahash", LongType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Row(id, 0L)
        else {
          val w = img.getWidth; val h = img.getHeight
          val sums = new Array[Long](grid * grid)
          val counts = new Array[Long](grid * grid)
          var y = 0
          while (y < h) {
            val by = (y * grid) / h
            var x = 0
            while (x < w) {
              val bx = (x * grid) / w
              val p = img.getRGB(x, y)
              val gray = ((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)
              sums(by * grid + bx) += gray
              counts(by * grid + bx) += 1
              x += 1
            }
            y += 1
          }
          val means = Array.tabulate(grid * grid)(i =>
            if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
          val global = means.sum / means.length
          var hash = 0L
          var i = 0
          while (i < means.length) {
            if (means(i) > global) hash |= 1L << i
            i += 1
          }
          Row(id, hash)
        }
      }
    }(enc)
  }

  /** Real resize through the same seam: decode → Graphics2D bilinear
    * scale → re-encode PNG. The byte-stride `samplePayload` remains the
    * structural stand-in for codecs the JDK lacks (video frames). */
  def resizeImages(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val dst = new java.awt.image.BufferedImage(
          outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, outW, outH, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        Row(id, bos.toByteArray,
          Row("image/png", outW, outH, null, s"mem://img/$id/resized"))
      }
    }(enc)
  }

  // ------------------------------------------------- real audio codec

  private def sampleAt(id: Long, i: Int): Short =
    (((id * 31 + i.toLong * 17) % 65536) - 32768).toShort

  /** Spectrally-varied fixture sample: the product of two linear
    * sequences mod 2¹⁶ is pseudo-random per (id, i), so per-frame
    * energies genuinely discriminate between clips — the plain
    * [[sampleAt]] sawtooth is phase-near-identical across small ids,
    * which would make every clip a near-dup of every other under an
    * energy fingerprint. Integer arithmetic only, oracle-replicable. */
  private def richSampleAt(id: Long, i: Int): Short =
    ((((id * 31 + i.toLong * 17) * (id * 7 + i.toLong * 13)) % 65536) - 32768).toShort

  /** Deterministic 16-bit PCM mono WAV fixture table: sample i of id's
    * clip = ((id·31 + i·17) mod 2¹⁶) − 2¹⁵ — integer arithmetic only,
    * so the oracle replicates the decoded stats without any audio
    * library (no transcendental waveform whose last-ulp rounding could
    * differ across engines). The RIFF/fmt/data header is written by
    * hand; `decodeAudio` parses it back through the REAL
    * `javax.sound.sampled` path, proving interop. */
  def audioTable(ids: DataFrame, nSamples: Int = 2048,
                 sampleRate: Int = 8000, rich: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val in = ids.select(col(ids.columns.head).cast(LongType))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bb = java.nio.ByteBuffer.allocate(44 + nSamples * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + nSamples * 2)
        bb.put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
        bb.putShort(1); bb.putShort(1) // PCM, mono
        bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
        bb.putShort(2); bb.putShort(16) // block align, bits/sample
        bb.put("data".getBytes("US-ASCII")); bb.putInt(nSamples * 2)
        var i = 0
        while (i < nSamples) {
          bb.putShort(if (rich) richSampleAt(id, i) else sampleAt(id, i))
          i += 1
        }
        Row(id, bb.array(),
          Row("audio/wav", null, null, nSamples * 1000L / sampleRate,
            s"mem://wav/$id"))
      }
    }(enc)
  }

  /** REAL audio decode — `javax.sound.sampled` (JDK-shipped): WAV
    * payload bytes → format header + PCM sample statistics. Sum of
    * |sample| accumulates in Long (exact), min/max are Ints — all
    * oracle-pinnable. Same mapPartitions batch seam as the image
    * codec; compressed audio (mp3/ogg) stays behind the deterministic
    * stand-in, the JDK has no codec for it. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_samples", LongType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("sum_abs", LongType),
      StructField("min_s", IntegerType),
      StructField("max_s", IntegerType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        // normalize to 16-bit signed PCM: blindly parsing the buffer as
        // shorts would produce silent garbage for 8/24/32-bit or float
        // encodings javax.sound can also parse
        val srcFmt = raw.getFormat
        val ais =
          if (srcFmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              srcFmt.getSampleSizeInBits == 16) raw
          else javax.sound.sampled.AudioSystem.getAudioInputStream(
            new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              srcFmt.getSampleRate, 16, srcFmt.getChannels,
              srcFmt.getChannels * 2, srcFmt.getSampleRate, false), raw)
        try {
          val fmt = ais.getFormat
          val data = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var n = 0L; var sumAbs = 0L
          var mn = Int.MaxValue; var mx = Int.MinValue
          while (bb.remaining() >= 2) {
            val s = bb.getShort.toInt
            n += 1; sumAbs += math.abs(s)
            if (s < mn) mn = s
            if (s > mx) mx = s
          }
          Row(id, n, fmt.getChannels, fmt.getSampleRate.toInt, sumAbs,
            if (n == 0) 0 else mn, if (n == 0) 0 else mx)
        } finally ais.close()
      }
    }(enc)
  }

  /** Audio FINGERPRINT through the real decode seam — the audio member
    * of the near-dup family (public robust-hash shape, cf.
    * Haitsma-Kalker): decode → 16-bit PCM → split into `nBands` equal
    * time frames (frame of sample i = (i·nBands)/n, integer division)
    * → frame energy E_f = Σ|s| (exact Long) → bit f set iff
    * E_f·n > total·count_f (cross-multiplied integer comparison — no
    * float mean, so the bits are oracle-pinnable exactly). Identical
    * clips hash identically; uniform gain changes shift all energies
    * together and flip only frames whose energy sits within the
    * rounding noise of the mean. Feeds [[Dedup.hammingPairs]]. */
  def audioFingerprint(media: DataFrame, nBands: Int = 64): DataFrame = {
    require(nBands > 0 && nBands <= 64, "nBands must fit a 64-bit hash")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("afp", LongType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // corrupt payload -> sentinel hash 0, same contract as the
        // image/video fingerprints: one bad file never fails the task
        val samples =
          try decodePcm16(bytes)
          catch { case _: Exception => Array.empty[Short] }
        val n = samples.length
        if (n == 0) Row(id, 0L)
        else {
          val sums = new Array[Long](nBands)
          val counts = new Array[Long](nBands)
          var i = 0
          var total = 0L
          while (i < n) {
            val f = ((i.toLong * nBands) / n).toInt
            val a = math.abs(samples(i).toLong)
            sums(f) += a; counts(f) += 1; total += a
            i += 1
          }
          var hash = 0L
          var f = 0
          while (f < nBands) {
            if (sums(f) * n > total * counts(f)) hash |= 1L << f
            f += 1
          }
          Row(id, hash)
        }
      }
    }(enc)
  }

  /** Decode any javax.sound-parsable payload to 16-bit signed PCM
    * samples (interleaved channels), normalizing non-16-bit encodings
    * through the same conversion path as [[decodeAudio]]. */
  private def decodePcm16(bytes: Array[Byte]): Array[Short] = {
    val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val srcFmt = raw.getFormat
    val ais =
      if (srcFmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          srcFmt.getSampleSizeInBits == 16) raw
      else javax.sound.sampled.AudioSystem.getAudioInputStream(
        new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          srcFmt.getSampleRate, 16, srcFmt.getChannels,
          srcFmt.getChannels * 2, srcFmt.getSampleRate, false), raw)
    try {
      val fmt = ais.getFormat
      val data = ais.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(data).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Short](bb.remaining() / 2)
      var i = 0
      while (i < out.length) { out(i) = bb.getShort; i += 1 }
      out
    } finally ais.close()
  }

  /** Uniform attenuation as a payload transform: 16-bit PCM WAV in →
    * WAV out with every sample divided by `divisor` (integer division,
    * truncating toward zero — |s/d| = ⌊|s|/d⌋, replicable on the oracle
    * side as abs(s)//d). The near-dup perturbation fixture: a gain
    * change a fingerprint should survive. Parses the RIFF chunk list
    * (not a fixed 44-byte assumption) and rewrites only the data
    * chunk. */
  def attenuateAudio(media: DataFrame, divisor: Int = 2): DataFrame = {
    require(divisor > 0, "divisor must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"),
      col("meta"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1).clone()
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        require(bytes.length >= 12 &&
          bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F',
          s"attenuateAudio: media $id is not RIFF/WAV")
        var pos = 12 // past RIFF size + WAVE
        while (pos + 8 <= bytes.length) {
          val tag = new String(bytes, pos, 4, "US-ASCII")
          val len = bb.getInt(pos + 4)
          require(len >= 0, s"attenuateAudio: media $id has corrupt chunk length $len")
          if (tag == "data") {
            var p = pos + 8
            val end = math.min(pos + 8 + len, bytes.length)
            while (p + 2 <= end) {
              bb.putShort(p, (bb.getShort(p) / divisor).toShort)
              p += 2
            }
            pos = bytes.length
          } else pos += 8 + len + (len & 1)
        }
        Row(id, bytes, r.getStruct(2))
      }
    }(enc)
  }

  // ------------------------------------------------ video frame-sample

  /** Deterministic raw-video fixture container ("GVID"): a 20-byte
    * header (magic, width, height, n_frames, fps — little-endian) +
    * n_frames packed RGB rasters, pixel channels = linear formulas of
    * (id, frame, x, y). The JDK ships no video codec (an H.264/MP4
    * demux would be a JNI/ffmpeg call in the same kernel seam), so the
    * CONTAINER is the stand-in — but the plumbing a frame sampler needs
    * (header parse, frame seek by offset, per-frame stats) is all real,
    * and the closed-form pixels make the decoded output oracle-pinnable
    * without a decoder on the oracle side. */
  def videoTable(ids: DataFrame, width: Int = 8, height: Int = 6,
                 nFrames: Int = 24, fps: Int = 12): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val in = ids.select(col(ids.columns.head).cast(LongType))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bb = java.nio.ByteBuffer.allocate(20 + nFrames * width * height * 3)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("GVID".getBytes("US-ASCII"))
        bb.putInt(width); bb.putInt(height); bb.putInt(nFrames); bb.putInt(fps)
        var f = 0
        while (f < nFrames) {
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              bb.put(((id * 7 + f * 19 + x * 3 + y * 5) % 256).toByte)
              bb.put(((id * 11 + f * 23 + x + y * 2) % 256).toByte)
              bb.put(((id * 13 + f * 29 + x * 3 + y) % 256).toByte)
              x += 1
            }
            y += 1
          }
          f += 1
        }
        Row(id, bb.array(),
          Row("video/x-gvid", width, height, nFrames * 1000L / fps,
            s"mem://vid/$id"))
      }
    }(enc)
  }

  /** Frame sampling through the batch kernel seam: parse the container
    * header, seek every `every`-th frame BY OFFSET (frames between
    * sample points are never touched — the payload analogue of column
    * pruning), and emit per-frame channel means. Sums accumulate in
    * Long (exact), so the means are order-independent and the oracle
    * recomputes them from the pixel formulas alone. One output row per
    * sampled frame. */
  def sampleFrames(media: DataFrame, every: Int): DataFrame = {
    require(every > 0, "every must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val bad = Iterator(Row(id, -1, 0, 0, 0, 0.0, 0.0, 0.0))
        // a corrupt container (short payload, bad magic, nonsense or
        // truncated header) yields the sentinel row — one bad file
        // must never fail a whole partition's task
        if (bytes.length < 20) bad
        else {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val magic = new Array[Byte](4); bb.get(magic)
          if (!java.util.Arrays.equals(magic, "GVID".getBytes("US-ASCII"))) bad
          else {
            val w = bb.getInt; val h = bb.getInt
            val nf = bb.getInt; bb.getInt // fps unused here
            val frameBytes = w.toLong * h * 3
            if (w <= 0 || h <= 0 || nf <= 0 ||
                20L + nf.toLong * frameBytes > bytes.length) bad
            else {
              val px = (w * h).toDouble
              Iterator.range(0, nf, every).map { f =>
                val off = 20 + f * frameBytes.toInt
                var sr = 0L; var sg = 0L; var sb = 0L
                var p = 0
                while (p < w * h) {
                  sr += bytes(off + p * 3) & 0xff
                  sg += bytes(off + p * 3 + 1) & 0xff
                  sb += bytes(off + p * 3 + 2) & 0xff
                  p += 1
                }
                Row(id, f, w, h, nf, sr / px, sg / px, sb / px)
              }
            }
          }
        }
      }
    }(enc)
  }

  /** Video FINGERPRINT — the video member of the near-dup family:
    * sample `nFrameBits/blocksPerFrame` frames BY OFFSET (the same
    * seek-only-what-you-hash pruning as [[sampleFrames]]), and for each
    * sampled frame emit one aHash-style bit per spatial block: bit set
    * iff S_block·(w·h) > S_frame·n_block (gray = r+g+b, Long sums,
    * cross-multiplied integer comparison — no float means, so every bit
    * is oracle-pinnable). 8 sampled frames × (2×4)-block grid = a
    * 64-bit signature combining temporal and spatial structure; exact
    * copies hash identically, global brightness shifts flip only
    * blocks whose mean sits within wrap noise of the frame mean. Feeds
    * [[Dedup.hammingPairs]]. A corrupt container yields hash 0 (one
    * bad file never fails the partition's task). */
  def videoFingerprint(media: DataFrame, gridX: Int = 2, gridY: Int = 4,
                       sampledFrames: Int = 8): DataFrame = {
    require(gridX * gridY * sampledFrames <= 64,
      "gridX*gridY*sampledFrames bits must fit a 64-bit hash")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("vfp", LongType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        var hash = 0L
        if (bytes.length >= 20) {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val magic = new Array[Byte](4); bb.get(magic)
          if (java.util.Arrays.equals(magic, "GVID".getBytes("US-ASCII"))) {
            val w = bb.getInt; val h = bb.getInt
            val nf = bb.getInt; bb.getInt // fps unused
            val frameBytes = w.toLong * h * 3
            if (w > 0 && h > 0 && nf > 0 &&
                20L + nf.toLong * frameBytes <= bytes.length) {
              val nBlocks = gridX * gridY
              var k = 0
              while (k < sampledFrames) {
                val f = ((k.toLong * nf) / sampledFrames).toInt
                val off = 20 + f * frameBytes.toInt
                val sums = new Array[Long](nBlocks)
                val counts = new Array[Long](nBlocks)
                var frameSum = 0L
                var y = 0
                while (y < h) {
                  val by = (y * gridY) / h
                  var x = 0
                  while (x < w) {
                    val bx = (x * gridX) / w
                    val p = off + (y * w + x) * 3
                    val gray = (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) +
                      (bytes(p + 2) & 0xff)
                    sums(by * gridX + bx) += gray
                    counts(by * gridX + bx) += 1
                    frameSum += gray
                    x += 1
                  }
                  y += 1
                }
                var b = 0
                while (b < nBlocks) {
                  if (sums(b) * (w.toLong * h) > frameSum * counts(b))
                    hash |= 1L << (k * nBlocks + b)
                  b += 1
                }
                k += 1
              }
            }
          }
        }
        Row(id, hash)
      }
    }(enc)
  }

  /** Global brightness shift as a payload transform: every channel byte
    * of every frame becomes (b + delta) mod 256 — the perturbation a
    * block-vs-frame-mean fingerprint should survive (both sides of the
    * comparison shift together up to wrap noise). Header untouched. */
  def shiftVideoChannels(media: DataFrame, delta: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"),
      col("meta"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1).clone()
        require(bytes.length >= 20 && bytes(0) == 'G' && bytes(1) == 'V',
          s"shiftVideoChannels: media $id is not a GVID container")
        var p = 20
        while (p < bytes.length) {
          bytes(p) = (((bytes(p) & 0xff) + delta) % 256 + 256).toByte
          p += 1
        }
        Row(id, bytes, r.getStruct(2))
      }
    }(enc)
  }

  /** "Resize / frame-sample" analogue: keep every `stride`-th payload
    * byte — the structural twin of frame-sampling a video or
    * downscaling an image. Same mapPartitions batch kernel shape as
    * decodeFeatures (binary in → smaller binary out). */
  def samplePayload(media: DataFrame, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload_sampled", BinaryType),
      StructField("orig_len", IntegerType),
      StructField("sampled_len", IntegerType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val sampled = Array.range(0, bytes.length, stride).map(bytes(_))
        Row(id, sampled, bytes.length, sampled.length)
      }
    }(enc)
  }
}
