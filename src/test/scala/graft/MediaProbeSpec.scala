package graft

import java.io.ByteArrayOutputStream
import graft.operators.MediaProbe

/** Container/frame metadata probing over REAL bytes: every fixture is
  * a structurally valid file built to its published spec (MPEG audio
  * frame headers, ISO BMFF boxes, RFC 3533 Ogg pages, RIFF chunks,
  * ImageIO-written PNG/JPEG), and every expected value is arithmetic
  * over the construction parameters — the parser must agree exactly. */
class MediaProbeSpec extends SparkSpec {

  // ----------------------------------------------- fixtures (shared)

  // The structural builders live in main (MediaProbe.Fixtures) so the
  // oracle query can construct the same payloads; these are aliases.
  private def mp3(frames: Int, id3Prefix: Boolean = false): Array[Byte] =
    MediaProbe.Fixtures.mp3(frames, id3Prefix)
  private def mp4(durationMs: Long, w: Int, h: Int): Array[Byte] =
    MediaProbe.Fixtures.mp4(durationMs, w, h)
  private def oggVorbis(samples: Long): Array[Byte] =
    MediaProbe.Fixtures.oggVorbis(samples)
  private def wav(dataBytes: Int): Array[Byte] =
    MediaProbe.Fixtures.wav(dataBytes)

  private def image(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  // ------------------------------------------------------------- tests

  test("mp3: exact frame walk — duration, rate, bitrate; ID3v2 skip; ID3v1 stop") {
    val n = 38
    val p = MediaProbe.probe(mp3(n))
    assert(p.format == "mp3")
    assert(p.durationMs.contains(n.toLong * 1152 * 1000 / 44100)) // 992 ms
    assert(p.sampleRate.contains(44100))
    assert(p.bitRate.contains(128000))
    // an ID3v2 prefix moves the first sync; the walk must skip it whole
    assert(MediaProbe.probe(mp3(n, id3Prefix = true)) == p)
  }

  test("mp4: box walk reads mvhd duration and tkhd 16.16 dimensions, skips mdat") {
    val p = MediaProbe.probe(mp4(5432L, 640, 360))
    assert(p == MediaProbe.Probe("mp4", durationMs = Some(5432L),
      width = Some(640), height = Some(360)))
  }

  test("ogg: vorbis id header rate + terminal granule position = duration") {
    val p = MediaProbe.probe(oggVorbis(44100L * 3)) // exactly 3 s
    assert(p == MediaProbe.Probe("ogg", durationMs = Some(3000L),
      sampleRate = Some(44100)))
  }

  test("webm: EBML walk reads Info duration x timecode scale and Video pixel dims") {
    val p = MediaProbe.probe(MediaProbe.Fixtures.webm(7321L, 1280, 720))
    assert(p == MediaProbe.Probe("webm", durationMs = Some(7321L),
      width = Some(1280), height = Some(720)))
    // truncation at every prefix: no throw
    val fix = MediaProbe.Fixtures.webm(500L, 64, 48)
    for (cut <- 0 to fix.length) MediaProbe.probe(fix.take(cut))
  }

  test("wav/png/jpeg: RIFF chunks, IHDR, SOF marker") {
    assert(MediaProbe.probe(wav(32000)) == MediaProbe.Probe("wav",
      durationMs = Some(2000L), sampleRate = Some(8000)))
    val png = MediaProbe.probe(image("png", 20, 10))
    assert(png == MediaProbe.Probe("png", width = Some(20), height = Some(10)))
    val jpg = MediaProbe.probe(image("jpg", 31, 17))
    assert(jpg == MediaProbe.Probe("jpeg", width = Some(31), height = Some(17)))
  }

  test("corrupt and truncated payloads never throw; unknown magic reports unknown") {
    assert(MediaProbe.probe(Array.fill[Byte](64)(0x5a)).format == "unknown")
    assert(MediaProbe.probe(new Array[Byte](3)).format == "unknown")
    assert(MediaProbe.probe(null).format == "unknown")
    // every valid fixture, truncated at every prefix length: no throw
    for (fix <- Seq(mp3(3), mp4(100L, 8, 8), oggVorbis(1000), wav(64));
         cut <- 0 to math.min(fix.length, 96))
      MediaProbe.probe(fix.take(cut))
  }

  test("corrupt SIZE fields terminate (no hang, no negative index), partial fields survive") {
    // wav whose first chunk size is 0xFFFFFFF8: an Int cursor would
    // compute 8 + (-8) and spin forever — the probe must terminate
    val spinner = wav(16)
    spinner(16) = 0xf8.toByte; spinner(17) = 0xff.toByte
    spinner(18) = 0xff.toByte; spinner(19) = 0xff.toByte
    assert(MediaProbe.probe(spinner).format == "wav") // returns, promptly
    // wav with a size that drives the cursor past Int range
    val jumper = wav(16)
    jumper(16) = 0x10.toByte; jumper(17) = 0x00.toByte
    jumper(18) = 0x00.toByte; jumper(19) = 0x80.toByte // 0x80000010
    assert(MediaProbe.probe(jumper).format == "wav")
    // mp4 whose final box is an EMPTY tkhd (size 8, no body): the
    // version byte would read past the array without the bounds guard
    val emptyTkhd = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putInt(8); b.put("ftyp".getBytes("US-ASCII")) // dispatch magic
      b.putInt(8); b.put("tkhd".getBytes("US-ASCII")) // empty body

      b.array()
    }
    assert(MediaProbe.probe(emptyTkhd).format == "mp4")
    // every fixture with EVERY single byte corrupted: still no throw
    for (fix <- Seq(mp3(2).take(96), mp4(50L, 4, 4), oggVorbis(100).take(96), wav(8));
         pos <- fix.indices) {
      val bad = fix.clone(); bad(pos) = 0xff.toByte
      MediaProbe.probe(bad)
    }
  }

  test("seeded fuzz: 500 random payloads, magic-prefixed and raw, never throw") {
    val rng = new scala.util.Random(20260814L)
    val magics = Seq[Array[Byte]](
      Array(0xff.toByte, 0xfb.toByte),                    // mp3 sync
      "ID3".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 32) ++ "ftyp".getBytes("US-ASCII"),
      "OggS".getBytes("US-ASCII"),
      "RIFF1234WAVE".getBytes("US-ASCII"),
      Array(0x89.toByte) ++ "PNG".getBytes("US-ASCII"),
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte),
      Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte)) // EBML
    (0 until 500).foreach { i =>
      val body = new Array[Byte](rng.nextInt(512))
      rng.nextBytes(body)
      val payload =
        if (i % 3 == 0) body else magics(i % magics.size) ++ body
      MediaProbe.probe(payload) // must return, promptly, for ANY bytes
    }
  }

  test("probeMedia: one mapPartitions pass, skinny typed rows") {
    import spark.implicits._
    val media = Seq(
      (1L, mp3(10)), (2L, mp4(1234L, 320, 240)), (3L, oggVorbis(22050)),
      (4L, wav(8000)), (5L, Array.fill[Byte](16)(0x01))
    ).toDF("media_id", "payload")
    val probed = MediaProbe.probeMedia(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(probed(1L).getString(1) == "mp3")
    assert(probed(1L).getLong(2) == 10L * 1152 * 1000 / 44100)
    assert(probed(2L).getString(1) == "mp4" && probed(2L).getLong(2) == 1234L)
    assert(probed(2L).getInt(5) == 320 && probed(2L).getInt(6) == 240)
    assert(probed(3L).getString(1) == "ogg" && probed(3L).getLong(2) == 500L)
    assert(probed(4L).getString(1) == "wav" && probed(4L).getLong(2) == 500L)
    assert(probed(5L).getString(1) == "unknown" && probed(5L).isNullAt(2))
  }
}
