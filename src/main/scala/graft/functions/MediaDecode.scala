package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Media decode kernel (reference: the binary payloads the source API
  * ships as base64 envelopes, mabna_tables_create.py:113-117 handles
  * only their metadata — the engine treats media as first-class binary
  * columns).
  *
  * [[MediaCodec.decode]] is a REAL decoder for the uncompressed public
  * formats a codec-less container can parse from the published specs
  * alone:
  *
  *  - **BMP** (Windows DIB, BITMAPFILEHEADER + 40-byte
  *    BITMAPINFOHEADER, uncompressed BI_RGB at 8/24/32 bpp) →
  *    `(width, height, bpp/8, file_bytes)`;
  *  - **WAV** (RIFF/WAVE, integer PCM at 8/16/24/32 bits) →
  *    `(frames_per_channel, sample_rate, channels, file_bytes)` — the
  *    audio mapping of the image-shaped struct, documented here.
  *
  * Anything else is an *opaque payload*: deterministic pseudo-dimensions
  * derived from the byte length (the documented contract for formats
  * with no in-container codec — what lets the driver's DuckDB oracle
  * reproduce q23/q88/q129 from file sizes; a libjpeg/ffmpeg JNI handle
  * would slot in as one more sniff branch). Sniffing is strict — the
  * header's own file-size field must equal the actual byte length,
  * which an ASCII/UTF-8 payload cannot satisfy (it would need NUL
  * bytes) — so opaque payloads can never be mis-decoded as media.
  *
  * [[MediaCodec.plane]] extracts one channel plane: for BMP, the
  * per-pixel byte of storage channel `idx` (BGR[A] order) in top-down
  * row-major order with row padding stripped; for WAV, channel `idx`'s
  * PCM samples (little-endian, `bytesPerSample` each), deinterleaved.
  * Golden-byte fixtures pin both in GoldenMediaSpec.
  */
object MediaCodec {

  val decodedType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  // ---- little-endian readers (unsigned unless noted) ----
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Parsed BMP geometry; `heightRaw < 0` means top-down storage. */
  private final case class Bmp(width: Int, heightRaw: Int, bpp: Int,
                               dataOffset: Int, stride: Int)

  /** Strict BITMAPFILEHEADER + BITMAPINFOHEADER parse; null unless the
    * bytes are a well-formed uncompressed 8/24/32-bpp BMP whose declared
    * file size matches the actual length and whose pixel array fits. */
  private def parseBmp(b: Array[Byte]): Bmp = {
    val n = b.length
    if (n < 54 || b(0) != 'B' || b(1) != 'M') return null
    if (u32(b, 2) != n.toLong) return null              // bfSize == |file|
    val dataOffset = u32(b, 10)
    if (dataOffset < 54 || dataOffset > n) return null
    if (u32(b, 14) != 40L) return null                  // biSize: BITMAPINFOHEADER
    val width = i32(b, 18)
    val heightRaw = i32(b, 22)
    if (width <= 0 || heightRaw == 0) return null
    if (u16(b, 26) != 1) return null                    // biPlanes
    val bpp = u16(b, 28)
    if (bpp != 8 && bpp != 24 && bpp != 32) return null
    if (u32(b, 30) != 0L) return null                   // BI_RGB only
    val h = math.abs(heightRaw.toLong)
    val stride = ((width.toLong * bpp / 8) + 3) & ~3L
    if (stride > Int.MaxValue || h > Int.MaxValue) return null
    if (dataOffset + stride * h > n.toLong) return null
    Bmp(width, heightRaw, bpp, dataOffset.toInt, stride.toInt)
  }

  /** Parsed WAV geometry (integer PCM only). */
  private final case class Wav(channels: Int, sampleRate: Int,
                               bytesPerSample: Int, dataOff: Int,
                               dataLen: Int) {
    def frames: Int = dataLen / (channels * bytesPerSample)
  }

  /** Strict RIFF/WAVE chunk walk; null unless the bytes are a
    * well-formed PCM WAV whose RIFF size matches the actual length and
    * whose data chunk divides evenly into frames. */
  private def parseWav(b: Array[Byte]): Wav = {
    val n = b.length
    if (n < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F')
      return null
    if (u32(b, 4) != n.toLong - 8) return null          // RIFF size == |file|-8
    if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return null
    var pos = 12
    var channels = 0; var sampleRate = 0; var bytesPerSample = 0
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= n) {
      val size = u32(b, pos + 4)
      if (size < 0 || pos + 8 + size > n.toLong) return null
      val isFmt = b(pos) == 'f' && b(pos + 1) == 'm' &&
        b(pos + 2) == 't' && b(pos + 3) == ' '
      val isData = b(pos) == 'd' && b(pos + 1) == 'a' &&
        b(pos + 2) == 't' && b(pos + 3) == 'a'
      if (isFmt) {
        if (size < 16) return null
        if (u16(b, pos + 8) != 1) return null           // integer PCM only
        channels = u16(b, pos + 10)
        val rate = u32(b, pos + 12)
        if (channels < 1 || rate < 1 || rate > Int.MaxValue) return null
        sampleRate = rate.toInt
        val bits = u16(b, pos + 22)
        if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return null
        bytesPerSample = bits / 8
      } else if (isData) {
        dataOff = pos + 8
        dataLen = size.toInt
      }
      pos += 8 + size.toInt + (size.toInt & 1)          // chunks pad to even
    }
    if (channels == 0 || dataOff < 0) return null
    if (dataLen % (channels * bytesPerSample) != 0) return null
    Wav(channels, sampleRate, bytesPerSample, dataOff, dataLen)
  }

  /** Decode (codegen entry point): real BMP / PCM-WAV header parse,
    * opaque-payload pseudo-dimensions for anything else (see object
    * doc). Never null — an opaque payload is data, not a failure. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val bmp = parseBmp(bytes)
    if (bmp != null)
      return new GenericInternalRow(Array[Any](
        bmp.width, math.abs(bmp.heightRaw), bmp.bpp / 8, bytes.length.toLong))
    val wav = parseWav(bytes)
    if (wav != null)
      return new GenericInternalRow(Array[Any](
        wav.frames, wav.sampleRate, wav.channels, bytes.length.toLong))
    val n = bytes.length
    val w = 64 + (n % 64)
    val h = 64 + ((n / 64) % 64)
    new GenericInternalRow(Array[Any](w, h, 3, n.toLong))
  }

  /** Channel-plane extraction; null when the bytes are not decodable
    * media or `idx` is out of range (null-on-failure: the caller's
    * filter drops the row, a bad payload never poisons the batch).
    *
    *  - BMP: byte `idx` of each pixel in STORAGE channel order (BGR,
    *    BGRA; 8-bpp has the single palette-index plane 0), emitted
    *    top-down row-major with the 4-byte row padding stripped —
    *    `width·height` bytes regardless of stride or bottom-up storage.
    *  - WAV: channel `idx`'s samples in order, `bytesPerSample`
    *    little-endian bytes each — `frames·bytesPerSample` bytes. */
  def plane(bytes: Array[Byte], idx: Int): Array[Byte] = {
    if (idx < 0) return null
    val bmp = parseBmp(bytes)
    if (bmp != null) {
      val channels = bmp.bpp / 8
      if (idx >= channels) return null
      val h = math.abs(bmp.heightRaw)
      val topDown = bmp.heightRaw < 0
      val w = bmp.width
      if (w.toLong * h > Int.MaxValue) return null
      val out = new Array[Byte](w * h)
      var r = 0
      while (r < h) {
        val srcRow = if (topDown) r else h - 1 - r
        val rowOff = bmp.dataOffset + srcRow * bmp.stride
        var x = 0
        while (x < w) {
          out(r * w + x) = bytes(rowOff + x * channels + idx)
          x += 1
        }
        r += 1
      }
      return out
    }
    val wav = parseWav(bytes)
    if (wav != null) {
      if (idx >= wav.channels) return null
      val bps = wav.bytesPerSample
      val frames = wav.frames
      val out = new Array[Byte](frames * bps)
      var f = 0
      while (f < frames) {
        val src = wav.dataOff + (f * wav.channels + idx) * bps
        var j = 0
        while (j < bps) { out(f * bps + j) = bytes(src + j); j += 1 }
        f += 1
      }
      return out
    }
    null
  }

  /** Encode raw bytes as a PCM-8 mono WAV at `sampleRate` (44-byte
    * canonical header; data chunk padded to even per RIFF, pad byte not
    * counted in the chunk size). Roundtrip law: `decode` sees
    * `(n, sampleRate, 1, 44+n+pad)` and `plane(_, 0)` returns exactly
    * the input bytes. */
  def wavWrapPcm8(data: Array[Byte], sampleRate: Int): Array[Byte] = {
    require(sampleRate >= 1, s"sampleRate=$sampleRate must be >= 1")
    val n = data.length
    val pad = n & 1
    val out = new Array[Byte](44 + n + pad)
    def put32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putTag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, 36L + n + pad); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16L)
    put16(20, 1); put16(22, 1)                     // PCM, mono
    put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong)                   // byte rate = rate·1·1
    put16(32, 1); put16(34, 8)                     // block align, bits
    putTag(36, "data"); put32(40, n.toLong)
    System.arraycopy(data, 0, out, 44, n)
    out
  }

  /** Encode raw bytes as an 8-bpp grayscale BMP of the given width
    * (top-down via negative biHeight, grayscale palette, zero-padded to
    * fill the last row). `width` must be a positive multiple of 4 so
    * the stride needs no row padding, and `data` must be non-empty.
    * Roundtrip law: `decode` sees `(width, ceil(n/width), 1,
    * 1078 + rows·width)` and `plane(_, 0)` returns the input bytes plus
    * the zero tail. */
  def bmpWrapGray8(data: Array[Byte], width: Int): Array[Byte] = {
    require(width >= 4 && width % 4 == 0,
      s"width=$width must be a positive multiple of 4 (8-bpp stride rule)")
    require(data.nonEmpty, "bmpWrapGray8: empty payload has no rows")
    val rows = (data.length + width - 1) / width
    val pixBytes = rows * width
    val dataOffset = 14 + 40 + 1024                // headers + 256-entry palette
    val out = new Array[Byte](dataOffset + pixBytes)
    def put32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length.toLong); put32(10, dataOffset.toLong)
    put32(14, 40L); put32(18, width.toLong)
    put32(22, (-rows).toLong & 0xffffffffL)        // negative: top-down
    put16(26, 1); put16(28, 8)                     // planes, bpp
    put32(30, 0L); put32(34, pixBytes.toLong)      // BI_RGB, biSizeImage
    put32(38, 2835L); put32(42, 2835L)             // 72 dpi
    put32(46, 256L); put32(50, 0L)                 // palette entries
    var i = 0
    while (i < 256) {                              // grayscale BGRA palette
      val off = 54 + i * 4
      out(off) = i.toByte; out(off + 1) = i.toByte; out(off + 2) = i.toByte
      i += 1
    }
    System.arraycopy(data, 0, out, dataOffset, data.length)
    out
  }

  val pHashType: StructType = StructType(Seq(
    StructField("dhash", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false)))

  /** Integer perceptual hashes over one channel plane (the classic
    * aHash/dHash pair, computed exactly — no float resize, so the
    * DuckDB oracle reproduces every bit):
    *
    *  - **dHash** (gradient): sample a `width`-preserving 8-row grid;
    *    in each row take the 9 column samples `c·width/9` (integer
    *    division) and set bit `r·8+c` iff sample c > sample c+1 —
    *    horizontal gradient signs, robust to brightness shifts.
    *  - **aHash** (average): the 8×8 grid samples at `c·width/8`; bit
    *    is set iff the sample exceeds the floor-mean of all 64.
    *
    * Nearest-neighbor sampling (top-left pixel of each cell) instead
    * of box-filter averaging keeps the whole computation in exact
    * integers; for near-dup detection the gradient STRUCTURE is what
    * matters, and re-encoded copies of the same plane sample
    * identically. Null unless the plane length divides evenly by a
    * positive width (the [[plane]] contract guarantees it for decoded
    * media). */
  def pHash(plane: Array[Byte], width: Int): InternalRow = {
    if (width <= 0 || plane.length == 0 || plane.length % width != 0)
      return null
    val h = plane.length / width
    @inline def v(r: Int, c: Int): Int = plane(r * width + c) & 0xff
    var dhash = 0L
    var r = 0
    while (r < 8) {
      val sr = r * h / 8
      var c = 0
      while (c < 8) {
        if (v(sr, c * width / 9) > v(sr, (c + 1) * width / 9))
          dhash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    val s = new Array[Int](64)
    var sum = 0L
    r = 0
    while (r < 8) {
      val sr = r * h / 8
      var c = 0
      while (c < 8) {
        val x = v(sr, c * width / 8)
        s(r * 8 + c) = x
        sum += x
        c += 1
      }
      r += 1
    }
    val mean = sum / 64
    var ahash = 0L
    var i = 0
    while (i < 64) { if (s(i) > mean) ahash |= 1L << i; i += 1 }
    new GenericInternalRow(Array[Any](dhash, ahash))
  }

  val frameStatsType: ArrayType = ArrayType(StructType(Seq(
    StructField("frame_bytes", IntegerType, nullable = false),
    StructField("frame_hash", StringType, nullable = false))),
    containsNull = false)

  private val HexDigits = "0123456789abcdef".toCharArray

  /** One-pass frame stats: every `stride`-th `blockSize`-byte block of
    * the media binary yields (length, md5-hex). `MessageDigest.update
    * (bytes, off, len)` hashes each slice IN PLACE, so the file binary
    * is materialized once per row — the declarative
    * `transform(offsets, substring(media, …))` form this replaces
    * re-fetched the whole binary from the UnsafeRow for every frame
    * (`getBinary` copies), an O(frames × file_size) blow-up that a
    * multi-MB file turns into minutes of single-thread work. */
  def frameStats(bytes: Array[Byte],
                 blockSize: Int, stride: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = bytes.length
    val nBlocks = (n + blockSize - 1) / blockSize
    val out = new Array[Any](if (nBlocks <= 0) 0 else (nBlocks + stride - 1) / stride)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    var b = 0
    while (b < nBlocks) {
      val off = b * blockSize
      val len = math.min(blockSize, n - off)
      md.reset()
      md.update(bytes, off, len)
      val dig = md.digest()
      val hex = new Array[Char](dig.length * 2)
      var j = 0
      while (j < dig.length) {
        hex(j * 2) = HexDigits((dig(j) >> 4) & 0xf)
        hex(j * 2 + 1) = HexDigits(dig(j) & 0xf)
        j += 1
      }
      out(i) = new GenericInternalRow(Array[Any](
        len, org.apache.spark.unsafe.types.UTF8String.fromString(new String(hex))))
      i += 1
      b += stride
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd decode: `binary → struct<width,height,channels,n_bytes>`,
  * null on null media (a failed decode drops the row at the caller's
  * filter, never poisons the batch). Replaces the round-4 Row-based RDD
  * `mapPartitions` path, which fell out of whole-stage codegen and paid
  * Row boxing per media item. */
case class MediaDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodec.decodedType
  override def prettyName: String = "media_decode"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.decode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaCodec.decode($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Codegen'd channel-plane extraction: `binary → binary`, null when the
  * payload is not decodable media or the plane index is out of range
  * (see [[MediaCodec.plane]]). */
case class MediaPlaneExpr(child: Expression, plane: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "media_plane"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.plane(input.asInstanceOf[Array[Byte]], plane)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: two media_plane calls in one codegen scope with
      // non-nullable children would both declare the local and fail
      // compilation → silent interpreted fallback (round-17 advice)
      val p = ctx.freshName("pl")
      s"""
       |byte[] $p = graft.functions.MediaCodec.plane($c, $plane);
       |if ($p == null) { ${ev.isNull} = true; } else { ${ev.value} = $p; }
     """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Codegen'd PCM-8 mono WAV encoder: `binary → binary` (the roundtrip
  * half that lets the driver oracle certify the REAL WAV parser — see
  * [[MediaCodec.wavWrapPcm8]]). */
case class WavWrapExpr(child: Expression, sampleRate: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "media_wav_wrap"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.wavWrapPcm8(input.asInstanceOf[Array[Byte]], sampleRate)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MediaCodec.wavWrapPcm8($c, $sampleRate)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Codegen'd 8-bpp grayscale BMP encoder: `binary → binary` (roundtrip
  * half for the BMP parser — see [[MediaCodec.bmpWrapGray8]]). */
case class BmpWrapExpr(child: Expression, width: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "media_bmp_wrap"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.bmpWrapGray8(input.asInstanceOf[Array[Byte]], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MediaCodec.bmpWrapGray8($c, $width)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Frame sampling as ONE codegen'd pass: `binary → array<struct<
  * frame_bytes, frame_hash>>`, frame i covering block i·stride. The
  * output array is tiny (one ~40-byte struct per frame) regardless of
  * media size, so the explode downstream shuffles stats, never bytes. */
case class MediaFrameStatsExpr(child: Expression, blockSize: Int, stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = MediaCodec.frameStatsType
  override def prettyName: String = "media_frame_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodec.frameStats(input.asInstanceOf[Array[Byte]], blockSize, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MediaCodec.frameStats($c, $blockSize, $stride)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Codegen'd perceptual hash: `(plane binary, width int) →
  * struct<dhash bigint, ahash bigint>` ([[MediaCodec.pHash]]); null on
  * a null/ill-shaped plane, so an undecodable payload drops at the
  * caller's filter. One binary fetch per row — the 144 grid samples
  * read the materialized array, never re-fetch the UnsafeRow binary. */
case class MediaPHashExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = MediaCodec.pHashType
  override def nullable: Boolean = true
  override def prettyName: String = "media_phash"
  override def nullSafeEval(plane: Any, width: Any): Any =
    MediaCodec.pHash(plane.asInstanceOf[Array[Byte]],
      width.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, w) => {
      // freshName: two media_phash calls in one codegen scope with
      // non-nullable children would otherwise both declare `ph` and
      // the duplicate local fails compilation → silent interpreted
      // fallback (round-17 advice; MediaPlaneExpr had the same bug)
      val ph = ctx.freshName("ph")
      s"""
       |InternalRow $ph = graft.functions.MediaCodec.pHash($p, (int) $w);
       |if ($ph == null) { ${ev.isNull} = true; } else { ${ev.value} = $ph; }
     """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object MediaFunctions {
  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("media_plane"))) return
    reg.createOrReplaceTempFunction("media_decode",
      es => MediaDecodeExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("media_frame_stats",
      es => MediaFrameStatsExpr(es(0), intArg(es(1)), intArg(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("media_plane",
      es => MediaPlaneExpr(es(0), intArg(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("media_wav_wrap",
      es => WavWrapExpr(es(0), intArg(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("media_bmp_wrap",
      es => BmpWrapExpr(es(0), intArg(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("media_phash",
      es => MediaPHashExpr(es(0), es(1)), "scala_udf")
  }

  def decodeMedia(media: Column): Column = call_function("media_decode", media)

  def frameStats(media: Column, blockSize: Int, stride: Int): Column =
    call_function("media_frame_stats", media,
      org.apache.spark.sql.functions.lit(blockSize),
      org.apache.spark.sql.functions.lit(stride))

  def mediaPlane(media: Column, plane: Int): Column =
    call_function("media_plane", media,
      org.apache.spark.sql.functions.lit(plane))

  def wavWrap(media: Column, sampleRate: Int): Column =
    call_function("media_wav_wrap", media,
      org.apache.spark.sql.functions.lit(sampleRate))

  def bmpWrap(media: Column, width: Int): Column =
    call_function("media_bmp_wrap", media,
      org.apache.spark.sql.functions.lit(width))

  def pHash(plane: Column, width: Column): Column =
    call_function("media_phash", plane, width)
}
