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

object MediaFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("media_decode"))) return
    reg.createOrReplaceTempFunction("media_decode",
      es => MediaDecodeExpr(es.head), "scala_udf")
  }

  def decodeMedia(media: Column): Column = call_function("media_decode", media)
}
