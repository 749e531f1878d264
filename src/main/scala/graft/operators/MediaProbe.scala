package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL container/frame metadata probing for compressed media — no
  * codec required, so it works in a pure-JVM executor at any scale.
  *
  * [[Multimodal]] keeps PCM/pixel DECODE of mp3/ogg/mp4 behind declared
  * stand-ins (the JDK ships no codec for them); this module closes the
  * metadata half for real: duration, sample rate, bit rate and
  * dimensions come from parsing the container/frame structure itself —
  * MPEG audio frame headers (sync + bitrate/samplerate tables), ISO
  * BMFF box walks (`moov`→`mvhd`/`tkhd`), Ogg page headers + the
  * terminal granule position against the Vorbis/Opus id header, RIFF
  * chunks, PNG IHDR and JPEG SOF markers. All of these are published
  * byte-level formats (ISO/IEC 11172-3 §2.4.1 frame header, ISO/IEC
  * 14496-12 box model, RFC 3533 Ogg framing, RFC 7845 OpusHead) —
  * parsing them is bounded integer arithmetic over the payload bytes.
  *
  * At 100 TB this is the shape media curation wants: a probe pass
  * reads each payload once inside `mapPartitions` (no shuffle, no
  * driver data), emits a skinny typed row, and every downstream
  * filter ("keep 10s–5min audio", "drop sub-720p video") runs on the
  * probed columns with the binary column pruned away entirely.
  *
  * Reference scope: pystore stores frames only — media columns are
  * beyond-parity surface for the LLM-pipeline operator set.
  */
object MediaProbe {

  /** One probed payload. Fields are None when the format does not
    * carry them or the payload is truncated/corrupt past that point;
    * `format` is "unknown" when no magic matches. */
  final case class Probe(format: String,
                         durationMs: Option[Long] = None,
                         sampleRate: Option[Int] = None,
                         bitRate: Option[Int] = None,
                         width: Option[Int] = None,
                         height: Option[Int] = None)

  // ------------------------------------------------------------ helpers

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    if (i < 0 || n < 0 || i + n > b.length) ""
    else new String(b, i, n, StandardCharsets.US_ASCII)

  // ------------------------------------------------------------ dispatch

  /** Magic-byte format detection + per-format parse. Total work is
    * O(payload) worst case (mp3 frame walk), O(boxes/pages) typical. */
  def probe(bytes: Array[Byte]): Probe = {
    if (bytes == null || bytes.length < 12) return Probe("unknown")
    if (ascii(bytes, 0, 3) == "ID3" || isMp3Sync(bytes, 0)) probeMp3(bytes)
    else if (ascii(bytes, 4, 4) == "ftyp") probeMp4(bytes)
    else if (ascii(bytes, 0, 4) == "OggS") probeOgg(bytes)
    else if (ascii(bytes, 0, 4) == "RIFF" && ascii(bytes, 8, 4) == "WAVE") probeWav(bytes)
    else if (u8(bytes, 0) == 0x89 && ascii(bytes, 1, 3) == "PNG") probePng(bytes)
    else if (u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8) probeJpeg(bytes)
    else if (be32(bytes, 0) == 0x1a45dfa3L) probeEbml(bytes)
    else Probe("unknown")
  }

  // ------------------------------------------------------------ webm/mkv

  // RFC 8794 EBML + the Matroska/WebM element registry: element ids
  // and the sizes/containers the probe walks.
  private val EbmlHeader = 0x1a45dfa3L
  private val DocTypeId = 0x4282L
  private val SegmentId = 0x18538067L
  private val InfoId = 0x1549a966L
  private val TimecodeScaleId = 0x2ad7b1L
  private val DurationId = 0x4489L
  private val TracksId = 0x1654ae6bL
  private val TrackEntryId = 0xaeL
  private val VideoId = 0xe0L
  private val PixelWidthId = 0xb0L
  private val PixelHeightId = 0xbaL

  /** EBML variable-length integer at `i`: (value, byteLength). For
    * element IDs the marker bit stays in the value (ids are compared
    * with it, per the registry); for SIZEs `stripMarker` clears it.
    * Returns (-1, 0) on truncation; an all-ones size VINT means
    * "unknown size" (streamed Segment) → caller treats as to-EOF. */
  private def vint(b: Array[Byte], i: Int, stripMarker: Boolean): (Long, Int) = {
    if (i >= b.length) return (-1L, 0)
    val first = u8(b, i)
    if (first == 0) return (-1L, 0)
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1 // 1..8
    if (i + len > b.length) return (-1L, 0)
    var v = if (stripMarker) (first & (0xff >>> len)).toLong else first.toLong
    var allOnes = stripMarker && (first & (0xff >>> len)) == (0xff >>> len)
    (1 until len).foreach { k =>
      v = (v << 8) | u8(b, i + k)
      allOnes &&= u8(b, i + k) == 0xff
    }
    (if (allOnes) Long.MaxValue else v, len)
  }

  private def ebmlUint(b: Array[Byte], i: Int, n: Int): Long = {
    var v = 0L
    (0 until n).foreach(k => v = (v << 8) | u8(b, i + k))
    v
  }

  /** WebM/Matroska: Segment→Info gives TimecodeScale (default 10⁶ ns)
    * and Duration (float ticks); Segment→Tracks→TrackEntry→Video gives
    * pixel dimensions. Cluster (media) elements are skipped by their
    * declared size — a probe of a multi-GB webm touches header bytes
    * only. DocType decides webm vs mkv. */
  private def probeEbml(b: Array[Byte]): Probe = {
    var docType = "mkv"
    var scaleNs = 1000000L
    var durationTicks: Option[Double] = None
    var width: Option[Int] = None
    var height: Option[Int] = None

    def walk(from: Long, to: Long, depth: Int): Unit = {
      var i = from
      while (i < to && depth < 8) {
        val (id, idLen) = vint(b, i.toInt, stripMarker = false)
        if (idLen == 0) return
        val (size, szLen) = vint(b, i.toInt + idLen, stripMarker = true)
        if (szLen == 0) return
        val body = i + idLen + szLen
        val end = if (size == Long.MaxValue) to else math.min(to, body + size)
        if (body > to) return
        id match {
          case EbmlHeader | SegmentId | InfoId | TracksId | TrackEntryId | VideoId =>
            walk(body, end, depth + 1)
          case DocTypeId =>
            val s = ascii(b, body.toInt, (end - body).toInt)
            if (s == "webm") docType = "webm"
          case TimecodeScaleId =>
            scaleNs = ebmlUint(b, body.toInt, (end - body).toInt)
          case DurationId =>
            val n = (end - body).toInt
            if (n == 4)
              durationTicks = Some(java.lang.Float.intBitsToFloat(
                be32(b, body.toInt).toInt).toDouble)
            else if (n == 8)
              durationTicks = Some(java.lang.Double.longBitsToDouble(be64(b, body.toInt)))
          case PixelWidthId if width.isEmpty =>
            width = Some(ebmlUint(b, body.toInt, (end - body).toInt).toInt)
          case PixelHeightId if height.isEmpty =>
            height = Some(ebmlUint(b, body.toInt, (end - body).toInt).toInt)
          case _ => // Cluster/Cues/...: skip by declared size
        }
        if (size == Long.MaxValue) return // unknown-size non-container: stop
        i = body + size
      }
    }
    walk(0, b.length.toLong, 0)
    Probe(docType,
      durationMs =
        durationTicks.filter(_ >= 0).map(t => (t * scaleNs / 1e6).toLong),
      width = width, height = height)
  }

  // ------------------------------------------------------------ mp3

  // ISO/IEC 11172-3 §2.4.1: bitrate (kbps) and sample-rate tables,
  // MPEG-1/2 × Layer I-III. Row index = the 4-bit bitrate_index.
  private val BitrateKbps: Map[(Int, Int), Array[Int]] = Map(
    // (mpeg version 1, layer III)
    (1, 3) -> Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0),
    (1, 2) -> Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0),
    (1, 1) -> Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0),
    // (mpeg version 2/2.5, layer III & II share a table; layer I its own)
    (2, 3) -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0),
    (2, 2) -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0),
    (2, 1) -> Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0))

  private val SampleRateHz: Map[Int, Array[Int]] = Map(
    1 -> Array(44100, 48000, 32000, 0),   // MPEG-1
    2 -> Array(22050, 24000, 16000, 0),   // MPEG-2
    0 -> Array(11025, 12000, 8000, 0))    // MPEG-2.5

  private def isMp3Sync(b: Array[Byte], i: Int): Boolean =
    i + 3 < b.length && u8(b, i) == 0xff && (u8(b, i + 1) & 0xe0) == 0xe0 &&
      ((u8(b, i + 1) >> 3) & 0x3) != 1 &&  // version != reserved
      ((u8(b, i + 1) >> 1) & 0x3) != 0     // layer != reserved

  /** Walk every frame: per-frame length from the header's bitrate ×
    * samplerate, duration = Σ samples-per-frame / rate — exact for CBR
    * AND VBR (no Xing header needed; a tag-only estimate would be the
    * lossy shortcut). Reported bitRate is the frame average. */
  private def probeMp3(b: Array[Byte]): Probe = {
    var i = 0
    if (ascii(b, 0, 3) == "ID3" && b.length >= 10) {
      // ID3v2 size: 4 sync-safe bytes (7 bits each), header is 10 bytes
      val sz = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
      i = 10 + sz
    }
    var frames = 0
    var samplesTotal = 0L
    var rateHz = 0
    var bitSum = 0L
    while (i + 4 <= b.length && !isMp3Sync(b, i)) i += 1 // find first sync
    while (i + 4 <= b.length && isMp3Sync(b, i)) { // stop at trailer (e.g. ID3v1 "TAG")
      val h1 = u8(b, i + 1); val h2 = u8(b, i + 2)
      val verBits = (h1 >> 3) & 0x3        // 0=2.5, 2=2, 3=1
      val layer = 4 - ((h1 >> 1) & 0x3)    // 1..3
      val ver = if (verBits == 3) 1 else 2
      val verKey = if (verBits == 3) 1 else if (verBits == 2) 2 else 0
      val brIdx = (h2 >> 4) & 0xf
      val srIdx = (h2 >> 2) & 0x3
      val padding = (h2 >> 1) & 0x1
      val kbps = BitrateKbps.get((ver, layer)).map(_(brIdx)).getOrElse(0)
      val rate = SampleRateHz(verKey)(srIdx)
      if (kbps == 0 || rate == 0) return done() // free-format/invalid: stop
      val samplesPerFrame =
        if (layer == 1) 384 else if (layer == 2) 1152
        else if (ver == 1) 1152 else 576 // layer III halves for MPEG-2/2.5
      val frameLen =
        if (layer == 1) (12 * kbps * 1000 / rate + padding) * 4
        else samplesPerFrame / 8 * kbps * 1000 / rate + padding
      if (frameLen <= 0) return done()
      frames += 1; samplesTotal += samplesPerFrame; rateHz = rate; bitSum += kbps
      i += frameLen
    }
    def done(): Probe =
      if (frames == 0 || rateHz == 0) Probe("mp3")
      else Probe("mp3",
        durationMs = Some(samplesTotal * 1000 / rateHz),
        sampleRate = Some(rateHz),
        bitRate = Some((bitSum / frames).toInt * 1000))
    done()
  }

  // ------------------------------------------------------------ mp4

  /** ISO BMFF (ISO/IEC 14496-12) box walk: top level → `moov`; inside
    * it `mvhd` (timescale + duration) and the first visual `tkhd`
    * (16.16 fixed-point presentation width/height). Box sizes are
    * declared, so the walk touches header bytes only — a probe of a
    * multi-GB movie reads no media data (`mdat` is skipped by size). */
  private def probeMp4(b: Array[Byte]): Probe = {
    var duration: Option[Long] = None
    var width: Option[Int] = None
    var height: Option[Int] = None

    def walk(from: Long, to: Long, depth: Int): Unit = {
      var i = from
      while (i + 8 <= to && depth < 8) {
        val declared = be32(b, i.toInt)
        val tpe = ascii(b, i.toInt + 4, 4)
        // size 1 = 64-bit largesize follows; size 0 = box extends to EOF
        val (size, hdr) =
          if (declared == 1 && i + 16 <= to) (be64(b, i.toInt + 8), 16L)
          else if (declared == 0) (to - i, 8L)
          else (declared, 8L)
        if (size < hdr || i + size > to) return // corrupt: stop cleanly
        val body = i + hdr
        tpe match {
          case "moov" | "trak" => walk(body, i + size, depth + 1)
          case "mvhd" if duration.isEmpty && body + 4 <= to =>
            val ver = u8(b, body.toInt)
            if (ver == 1 && body + 28 + 4 <= to) {
              val ts = be32(b, body.toInt + 20); val dur = be64(b, body.toInt + 24)
              if (ts > 0) duration = Some(dur * 1000 / ts)
            } else if (ver == 0 && body + 20 + 4 <= to) {
              val ts = be32(b, body.toInt + 12); val dur = be32(b, body.toInt + 16)
              if (ts > 0) duration = Some(dur * 1000 / ts)
            }
          case "tkhd" if width.isEmpty && body + 4 <= to =>
            val ver = u8(b, body.toInt)
            val wOff = body + (if (ver == 1) 4 + 16 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
                               else 4 + 8 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36)
            if (wOff + 8 <= to) {
              val w = (be32(b, wOff.toInt) >> 16).toInt
              val h = (be32(b, wOff.toInt + 4) >> 16).toInt
              if (w > 0 && h > 0) { width = Some(w); height = Some(h) }
            }
          case _ => // ftyp/mdat/free/...: skip by declared size
        }
        i += size
      }
    }
    walk(0, b.length.toLong, 0)
    Probe("mp4", durationMs = duration, width = width, height = height)
  }

  // ------------------------------------------------------------ ogg

  /** RFC 3533 framing: pages start "OggS"; the FIRST page's first
    * packet is the codec id header (Vorbis I §4.2.2: `\x01vorbis` +
    * rate; RFC 7845 §5.1: `OpusHead` + pre-skip, granule fixed at
    * 48 kHz), and the LAST page's granule position counts total PCM
    * samples — duration needs only the two ends of the stream. */
  private def probeOgg(b: Array[Byte]): Probe = {
    // first page: header is 27 bytes + segment table
    if (b.length < 28) return Probe("ogg")
    val nSegs = u8(b, 26)
    val body = 27 + nSegs
    var rate = 0
    var preSkip = 0L
    var granuleRate = 0 // the clock granule positions tick at
    // Vorbis id packet: packtype byte 0x01 + "vorbis" + version(4) +
    // channels(1) + rate(4 LE) -> rate at body+12
    if (body + 16 <= b.length && u8(b, body) == 1 && ascii(b, body + 1, 6) == "vorbis") {
      rate = le32(b, body + 12).toInt; granuleRate = rate
    } else if (ascii(b, body, 8) == "OpusHead" && body + 12 + 4 <= b.length) {
      preSkip = le16(b, body + 10).toLong
      rate = le32(b, body + 12).toInt // original input rate, informational
      granuleRate = 48000             // Opus granules are ALWAYS 48 kHz
    }
    if (granuleRate == 0) return Probe("ogg")
    // last page: scan back for the final "OggS" capture pattern
    var i = b.length - 27
    while (i >= 0 && ascii(b, i, 4) != "OggS") i -= 1
    if (i < 0 || i + 14 > b.length) return Probe("ogg", sampleRate = Some(rate))
    val granule = le64(b, i + 6)
    if (granule < 0) return Probe("ogg", sampleRate = Some(rate))
    Probe("ogg",
      durationMs = Some(math.max(0L, granule - preSkip) * 1000 / granuleRate),
      sampleRate = Some(rate))
  }

  // ------------------------------------------------------------ wav/png/jpeg

  private def probeWav(b: Array[Byte]): Probe = {
    // Long cursor: a corrupt chunk size is unsigned 0..2^32-1, so the
    // cursor strictly advances by >= 8 every iteration — an Int cursor
    // with `sz.toInt` would go negative (spin forever / index below 0)
    // on sizes >= 0x80000000
    var i = 12L
    var rate = 0; var byteRate = 0L; var dataLen = -1L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val id = ascii(b, ii, 4); val sz = le32(b, ii + 4)
      if (id == "fmt " && ii + 8 + 16 <= b.length) {
        rate = le32(b, ii + 12).toInt
        byteRate = le32(b, ii + 16)
      } else if (id == "data") dataLen = sz
      i += 8L + sz + (sz & 1L) // chunks are word-aligned
    }
    Probe("wav",
      durationMs = if (byteRate > 0 && dataLen >= 0) Some(dataLen * 1000 / byteRate) else None,
      sampleRate = if (rate > 0) Some(rate) else None)
  }

  private def probePng(b: Array[Byte]): Probe =
    if (b.length >= 24 && ascii(b, 12, 4) == "IHDR")
      Probe("png", width = Some(be32(b, 16).toInt), height = Some(be32(b, 20).toInt))
    else Probe("png")

  private def probeJpeg(b: Array[Byte]): Probe = {
    var i = 2
    while (i + 4 <= b.length && u8(b, i) == 0xff) {
      val marker = u8(b, i + 1)
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 &&
          marker != 0xcc) { // SOFn
        if (i + 9 <= b.length)
          return Probe("jpeg",
            height = Some(be16(b, i + 5)), width = Some(be16(b, i + 7)))
        return Probe("jpeg")
      }
      val len = be16(b, i + 2)
      if (len < 2) return Probe("jpeg")
      i += 2 + len
    }
    Probe("jpeg")
  }

  // ------------------------------------------------------------ fixtures

  /** Deterministic, structurally VALID media fixtures (the probe-side
    * analogue of [[Multimodal.imageTable]]): real MPEG frames / BMFF
    * boxes / Ogg pages whose metadata is a closed-form function of the
    * construction parameters, so an oracle can re-derive the expected
    * probe output arithmetically with no decoder of its own. */
  object Fixtures {

    /** `frames` CBR frames of MPEG-1 Layer III 128 kbps @ 44100 Hz
      * (header FF FB 90 00 → 417-byte frames), ID3v1 "TAG" trailer.
      * Probed duration = frames * 1152 * 1000 / 44100 ms. */
    def mp3(frames: Int, id3Prefix: Boolean = false): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      if (id3Prefix) {
        out.write(Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0,
          (200 >> 7).toByte, (200 & 0x7f).toByte))
        out.write(new Array[Byte](200))
      }
      val frame = new Array[Byte](417)
      frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte
      frame(2) = 0x90.toByte; frame(3) = 0x00
      (0 until frames).foreach(_ => out.write(frame))
      out.write(Array[Byte]('T', 'A', 'G'))
      out.write(new Array[Byte](125))
      out.toByteArray
    }

    private def bmffBox(tpe: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length); b.put(tpe.getBytes(StandardCharsets.US_ASCII))
      b.put(body)
      b.array()
    }

    /** ftyp + moov(mvhd v0 + trak(tkhd v0)) + mdat; timescale 1000 so
      * the mvhd duration IS milliseconds; tkhd dims are 16.16 fixed. */
    def mp4(durationMs: Long, w: Int, h: Int): Array[Byte] = {
      val mvhd = java.nio.ByteBuffer.allocate(100)
      mvhd.putInt(0); mvhd.putInt(0); mvhd.putInt(0)
      mvhd.putInt(1000); mvhd.putInt(durationMs.toInt)
      val tkhd = java.nio.ByteBuffer.allocate(84)
      tkhd.position(76); tkhd.putInt(w << 16); tkhd.putInt(h << 16)
      val moov = bmffBox("moov", bmffBox("mvhd", mvhd.array()) ++
        bmffBox("trak", bmffBox("tkhd", tkhd.array())))
      bmffBox("ftyp", "isom".getBytes(StandardCharsets.US_ASCII) ++
        new Array[Byte](4)) ++ moov ++ bmffBox("mdat", new Array[Byte](32))
    }

    private def oggPage(headerType: Int, granule: Long, seq: Int,
                        packet: Array[Byte]): Array[Byte] = {
      require(packet.length < 255)
      val b = java.nio.ByteBuffer.allocate(27 + 1 + packet.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("OggS".getBytes(StandardCharsets.US_ASCII))
      b.put(0.toByte); b.put(headerType.toByte)
      b.putLong(granule); b.putInt(0x4747).putInt(seq).putInt(0)
      b.put(1.toByte); b.put(packet.length.toByte)
      b.put(packet)
      b.array()
    }

    /** BOS page with a Vorbis id header (rate 44100) + EOS page whose
      * granule position = total PCM samples → duration. */
    def oggVorbis(samples: Long): Array[Byte] = {
      val id = java.nio.ByteBuffer.allocate(30)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      id.put(1.toByte); id.put("vorbis".getBytes(StandardCharsets.US_ASCII))
      id.putInt(0); id.put(2.toByte); id.putInt(44100)
      oggPage(2, 0L, 0, id.array()) ++ oggPage(4, samples, 1, new Array[Byte](8))
    }

    /** RIFF/WAVE PCM mono 16-bit @ 8000 Hz (byte rate 16000). */
    def wav(dataBytes: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes(StandardCharsets.US_ASCII)); b.putInt(36 + dataBytes)
      b.put("WAVE".getBytes(StandardCharsets.US_ASCII))
      b.put("fmt ".getBytes(StandardCharsets.US_ASCII)); b.putInt(16)
      b.putShort(1.toShort); b.putShort(1.toShort)
      b.putInt(8000); b.putInt(16000)
      b.putShort(2.toShort); b.putShort(16.toShort)
      b.put("data".getBytes(StandardCharsets.US_ASCII)); b.putInt(dataBytes)
      b.array()
    }

    private def ebmlId(id: Long): Array[Byte] = {
      val len = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      (0 until len).map(k => ((id >> (8 * (len - 1 - k))) & 0xff).toByte).toArray
    }

    private def ebmlSize(n: Int): Array[Byte] =
      if (n < 0x7f) Array((0x80 | n).toByte)
      else Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)

    private def ebmlEl(id: Long, body: Array[Byte]): Array[Byte] =
      ebmlId(id) ++ ebmlSize(body.length) ++ body

    private def ebmlUintBytes(v: Long): Array[Byte] = {
      val len = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      (0 until len).map(k => ((v >> (8 * (len - 1 - k))) & 0xff).toByte).toArray
    }

    /** Minimal WebM: EBML header (DocType "webm") + Segment with
      * Info(TimecodeScale 10⁶ ns, Duration float64 = milliseconds) and
      * Tracks(TrackEntry(Video(PixelWidth, PixelHeight))) + a dummy
      * Cluster the probe must skip by size. */
    def webm(durationMs: Long, w: Int, h: Int): Array[Byte] = {
      val header = ebmlEl(0x1a45dfa3L,
        ebmlEl(0x4282L, "webm".getBytes(StandardCharsets.US_ASCII)))
      val dur = java.nio.ByteBuffer.allocate(8)
        .putDouble(durationMs.toDouble).array()
      val info = ebmlEl(0x1549a966L,
        ebmlEl(0x2ad7b1L, ebmlUintBytes(1000000L)) ++ ebmlEl(0x4489L, dur))
      val video = ebmlEl(0xe0L,
        ebmlEl(0xb0L, ebmlUintBytes(w)) ++ ebmlEl(0xbaL, ebmlUintBytes(h)))
      val tracks = ebmlEl(0x1654ae6bL, ebmlEl(0xaeL, video))
      val cluster = ebmlEl(0x1f43b675L, new Array[Byte](24))
      header ++ ebmlEl(0x18538067L, info ++ tracks ++ cluster)
    }

    /** One fixture per id, format round-robin by `id % 4` with
      * id-derived parameters (the oracle re-derives these in SQL):
      *  - id % 4 == 0 → mp3, frames = 20 + id % 50
      *  - id % 4 == 1 → mp4, duration 1000 + id ms, dims
      *    (160 + (id%16)*8) × (90 + (id%9)*8)
      *  - id % 4 == 2 → ogg, samples = 44100 + id * 441
      *  - id % 4 == 3 → webm, duration 2000 + id ms, dims
      *    (320 + (id%8)*16) × (180 + (id%6)*16) */
    def table(ids: DataFrame): DataFrame = {
      val input = ids.toDF("media_id").select(col("media_id").cast(LongType))
      val enc = RowEncoder.encoderFor(StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false))))
      input.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = (id % 4) match {
            case 0 => mp3((20 + id % 50).toInt)
            case 1 => mp4(1000L + id,
              (160 + (id % 16) * 8).toInt, (90 + (id % 9) * 8).toInt)
            case 2 => oggVorbis(44100L + id * 441L)
            case _ => webm(2000L + id,
              (320 + (id % 8) * 16).toInt, (180 + (id % 6) * 16).toInt)
          }
          Row(id, payload)
        }
      }(enc)
    }
  }

  // ------------------------------------------------------------ operator

  val probeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType),
    StructField("bit_rate", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Probe every payload: one pass inside `mapPartitions`, skinny
    * typed output, binary column never leaves the executor. */
  def probeMedia(media: DataFrame): DataFrame = {
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(probeSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val p = probe(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), p.format,
          p.durationMs.map(Long.box).orNull,
          p.sampleRate.map(Int.box).orNull,
          p.bitRate.map(Int.box).orNull,
          p.width.map(Int.box).orNull,
          p.height.map(Int.box).orNull)
      }
    }(enc)
  }
}
