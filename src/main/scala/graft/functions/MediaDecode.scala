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
  * The container has no codec libraries, so [[MediaCodec.decode]] is a
  * clearly-marked deterministic STUB: it derives pseudo-dimensions from
  * the byte length. Everything around it — the codegen'd expression, the
  * struct schema, null-on-null decode-failure semantics — is the real
  * production shape; swapping the stub body for libjpeg/ffmpeg (behind a
  * lazy per-JVM handle, so init amortizes across every row a task
  * decodes) is a one-function change.
  */
object MediaCodec {

  val decodedType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** STUB decode (codegen entry point): a real implementation calls the
    * codec here via a lazily-initialized per-JVM handle. The stub's
    * pseudo-dimensions are pure arithmetic on the byte length, which is
    * what lets the driver's DuckDB oracle reproduce them from file
    * sizes. */
  def decode(bytes: Array[Byte]): InternalRow = {
    // ??? <- real codec goes here (libjpeg / ffmpeg via JNI)
    val n = bytes.length
    val w = 64 + (n % 64)
    val h = 64 + ((n / 64) % 64)
    new GenericInternalRow(Array[Any](w, h, 3, n.toLong))
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

object MediaFunctions {
  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("media_frame_stats"))) return
    reg.createOrReplaceTempFunction("media_decode",
      es => MediaDecodeExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("media_frame_stats",
      es => MediaFrameStatsExpr(es(0), intArg(es(1)), intArg(es(2))), "scala_udf")
  }

  def decodeMedia(media: Column): Column = call_function("media_decode", media)

  def frameStats(media: Column, blockSize: Int, stride: Int): Column =
    call_function("media_frame_stats", media,
      org.apache.spark.sql.functions.lit(blockSize),
      org.apache.spark.sql.functions.lit(stride))
}
