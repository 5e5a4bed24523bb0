package graft.functions

import graft.SparkSpec

/** Golden-byte fixtures for the REAL media decoders: BMP and PCM-WAV
  * files are hand-assembled here from the published format specs —
  * every header byte written out explicitly, independently of the
  * encoder helpers — and the parsed dimensions AND extracted channel
  * planes are pinned byte-for-byte. The wrap→decode→plane roundtrips
  * (the q152/q153 shapes) and the strict-sniff fallbacks (an
  * ASCII payload can never be mis-decoded as media) are pinned too. */
class GoldenMediaSpec extends SparkSpec {

  private def le16(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def tag(s: String): Seq[Byte] = s.getBytes("US-ASCII").toSeq

  private def decoded(b: Array[Byte]): (Int, Int, Int, Long) = {
    val r = MediaCodec.decode(b)
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3))
  }

  // ---- 24-bpp bottom-up BMP, 3×2, stride 12 (3 pad bytes per row) ----
  // storage row 0 is the BOTTOM image row; pixels are B,G,R per pixel
  private def bmp24: Array[Byte] = {
    val bottomRow = Seq[Byte](10, 11, 12, 20, 21, 22, 30, 31, 32, 0, 0, 0)
    val topRow = Seq[Byte](40, 41, 42, 50, 51, 52, 60, 61, 62, 0, 0, 0)
    val total = 54 + 24
    (tag("BM") ++ le32(total) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(3) ++ le32(2) ++                 // info: w=3, h=2 (bottom-up)
      le16(1) ++ le16(24) ++ le32(0) ++ le32(24) ++     // planes, bpp, BI_RGB, size
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ // dpi, palette
      bottomRow ++ topRow).toArray
  }

  test("golden BMP 24-bpp: header fields parse; B/G/R planes extract " +
       "top-down with padding stripped and the bottom-up flip applied") {
    assert(decoded(bmp24) == ((3, 2, 3, 78L)))
    // top-down plane = top storage row (row 1) first
    assert(MediaCodec.plane(bmp24, 0).toSeq == Seq[Byte](40, 50, 60, 10, 20, 30))
    assert(MediaCodec.plane(bmp24, 1).toSeq == Seq[Byte](41, 51, 61, 11, 21, 31))
    assert(MediaCodec.plane(bmp24, 2).toSeq == Seq[Byte](42, 52, 62, 12, 22, 32))
    assert(MediaCodec.plane(bmp24, 3) == null, "plane index past channels")
  }

  test("golden BMP strict sniff: a corrupted size field or a truncated " +
       "pixel array falls back to opaque-payload pseudo-dimensions") {
    def pseudo(b: Array[Byte]) =
      (64 + (b.length % 64), 64 + ((b.length / 64) % 64), 3, b.length.toLong)
    val badSize = bmp24.clone(); badSize(2) = (badSize(2) + 1).toByte
    assert(decoded(badSize) == pseudo(badSize), "bfSize mismatch must fall back")
    assert(MediaCodec.plane(badSize, 0) == null)
    val truncated = bmp24.take(60) // valid headers, pixel array cut short
    assert(decoded(truncated) == pseudo(truncated))
    val ascii = "BMhello world, a text that merely starts with the magic"
      .getBytes("UTF-8")
    assert(decoded(ascii) == pseudo(ascii),
      "ASCII starting with 'BM' must never parse as a BMP " +
        "(its size field would need NUL bytes)")
  }

  // ---- 16-bit stereo PCM WAV, 3 frames at 8000 Hz ----
  private def wav16stereo: Array[Byte] = {
    val data = Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    (tag("RIFF") ++ le32(48) ++ tag("WAVE") ++
      tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ // PCM, stereo
      le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16) ++
      tag("data") ++ le32(12) ++ data).toArray
  }

  test("golden WAV 16-bit stereo: frames/rate/channels parse; channel " +
       "planes deinterleave as little-endian sample bytes") {
    assert(decoded(wav16stereo) == ((3, 8000, 2, 56L)))
    assert(MediaCodec.plane(wav16stereo, 0).toSeq ==
      Seq[Byte](1, 2, 5, 6, 9, 10))
    assert(MediaCodec.plane(wav16stereo, 1).toSeq ==
      Seq[Byte](3, 4, 7, 8, 11, 12))
    assert(MediaCodec.plane(wav16stereo, 2) == null)
  }

  test("golden WAV strict sniff: RIFF size mismatch, non-PCM format " +
       "and ragged data chunk all fall back / reject") {
    def pseudo(b: Array[Byte]) =
      (64 + (b.length % 64), 64 + ((b.length / 64) % 64), 3, b.length.toLong)
    val badRiff = wav16stereo.clone(); badRiff(4) = (badRiff(4) + 1).toByte
    assert(decoded(badRiff) == pseudo(badRiff))
    val float = wav16stereo.clone(); float(20) = 3 // IEEE-float format tag
    assert(decoded(float) == pseudo(float), "non-integer-PCM must fall back")
    val ragged = wav16stereo.clone()
    ragged(40) = 11 // data size 11 % (2 ch · 2 B) != 0
    // chunk walk now overruns by the lost pad byte accounting — either
    // way it must NOT parse as media
    assert(decoded(ragged) == pseudo(ragged))
    assert(MediaCodec.plane(ragged, 0) == null)
  }

  test("wavWrapPcm8 roundtrip: odd payload pads to even, decode reads " +
       "back every header field, plane 0 is the payload verbatim") {
    val payload = "seven b".getBytes("UTF-8") // 7 bytes: exercises the pad
    val wav = MediaCodec.wavWrapPcm8(payload, 16000)
    assert(wav.length == 44 + 7 + 1)
    assert(decoded(wav) == ((7, 16000, 1, 52L)))
    assert(MediaCodec.plane(wav, 0).toSeq == payload.toSeq,
      "PCM-8 mono stores the bytes verbatim — the pad byte is chunk " +
        "framing, never part of the data")
  }

  test("bmpWrapGray8 roundtrip: payload pads to fill the last row, " +
       "decode reads the geometry back, plane 0 is payload + zero tail") {
    val payload = "ten bytes!".getBytes("UTF-8") // 10 bytes, width 4 → 3 rows
    val bmp = MediaCodec.bmpWrapGray8(payload, 4)
    assert(bmp.length == 1078 + 12)
    assert(decoded(bmp) == ((4, 3, 1, 1090L)))
    assert(MediaCodec.plane(bmp, 0).toSeq ==
      (payload ++ Array[Byte](0, 0)).toSeq)
    // width must be a positive multiple of 4 (the 8-bpp stride rule)
    intercept[IllegalArgumentException] { MediaCodec.bmpWrapGray8(payload, 3) }
    intercept[IllegalArgumentException] {
      MediaCodec.bmpWrapGray8(Array.emptyByteArray, 4)
    }
  }

  test("plane on a non-media payload is null (null-on-failure contract)") {
    assert(MediaCodec.plane("just some text".getBytes("UTF-8"), 0) == null)
  }
}
