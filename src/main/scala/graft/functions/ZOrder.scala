package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bit-interleave (Morton / z-order) of k bucket indices into one sort
  * key — the clustering primitive behind multi-dimensional data
  * skipping (public technique; Delta/Iceberg/Hudi all expose it as
  * `OPTIMIZE ... ZORDER BY`).
  *
  * Sorting a table by the interleaved key keeps rows close in EVERY
  * clustered dimension near each other on disk, so the per-row-group
  * min/max stats parquet already writes become tight boxes in k-space:
  * a selective conjunctive filter on the clustered columns skips the
  * row groups whose box misses it — in ANY clustered dimension, not
  * just the first sort column. A lexicographic sort gives that skipping
  * power only for its leading column; z-order spreads it across all of
  * them. See [[graft.operators.Layout.writeZOrdered]] for the
  * write-side normalization and the measured skipping contrast.
  */
object ZOrder {

  /** Interleave `vs(0..k-1)` bit-by-bit, `bits` low bits per value,
    * value 0 owning the lowest bit of each group. `k * bits` must fit a
    * positive Long (checked at plan time by the expression). */
  def interleave(vs: ArrayData, bits: Int): Long = {
    val k = vs.numElements()
    var z = 0L
    var b = 0
    while (b < bits) {
      var c = 0
      while (c < k) {
        z |= ((vs.getLong(c) >>> b) & 1L) << (b * k + c)
        c += 1
      }
      b += 1
    }
    z
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(FunctionIdentifier("zorder_key"))) return
    reg.createOrReplaceTempFunction("zorder_key", {
      case Seq(c, b) => ZOrderKeyExpr(c, b.eval().asInstanceOf[Int])
    }, "scala_udf")
  }

  /** The z-order key of pre-normalized bucket-index columns (each in
    * `[0, 2^bits)`, Long). */
  def zKey(spark: SparkSession, bits: Int, buckets: Column*): Column = {
    register(spark)
    call_function("zorder_key", array(buckets: _*), lit(bits))
  }
}

/** `zorder_key(array<long>, bits)` — codegen'd interleave; one compiled
  * call per row under the re-layout's range repartition. */
case class ZOrderKeyExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) if bits >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: bucket array must not contain nulls (coalesce buckets first)")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<long> buckets, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ZOrder.interleave(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZOrder.interleave($c, $bits)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
