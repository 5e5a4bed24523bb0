package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express a
  * dot product declaratively but are CodegenFallback — every row pays
  * interpreted-lambda overhead, which dominates brute-force ANN scans.
  * A dedicated BinaryExpression with `doGenCode` keeps the similarity
  * kernel inside whole-stage codegen: one fused loop over the two float
  * arrays per row, no allocation.
  *
  * Semantics (fixed so the DuckDB oracle can reproduce them exactly):
  * every element is widened to double BEFORE multiplication, and the
  * three accumulators (dot, |a|², |b|²) are sequential double folds —
  * the same order DuckDB's list_dot_product uses over a DOUBLE[] cast.
  * Null array, null element, mismatched or zero length → null.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  @transient private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0d || nb == 0d) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (leftFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (rightFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  boolean anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { anyNull = true; break; }
         |    final double $xi = $getX;
         |    final double $yi = $getY;
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (anyNull || $na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All per-table random-hyperplane LSH buckets of a vector in one
  * compiled pass. The declarative alternative — nTables × nPlanes × dim
  * `element_at` terms — builds a thousands-node expression tree that
  * falls out of codegen and dominates ANN bucket time. */
case class HyperplaneBucketsExpr(child: Expression, nPlanes: Int, nTables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_buckets"
  override def nullSafeEval(input: Any): Any = {
    val buckets = ArrayMath.hyperplaneBuckets(
      input.asInstanceOf[ArrayData], nPlanes, nTables,
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType)
    if (buckets == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buckets)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: a duplicate bare local from two sibling calls in one
      // codegen scope fails compilation → interpreted fallback
      val b = ctx.freshName("hpb")
      s"""
       |long[] $b = graft.functions.ArrayMath.hyperplaneBuckets(
       |  $c, $nPlanes, $nTables, $isFloat);
       |if ($b == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($b); }
     """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Symmetric int8 scalar quantization of an embedding: scale by the
  * vector's max |component| onto [-127, 127] and round half-up. Output
  * stays `array<double>` holding exact integer values — cheap to reason
  * about (every downstream double op on them is exact, so the DuckDB
  * oracle reproduces quantized scores bit-for-bit) while modelling the
  * int8 storage the scale path would write (4× smaller than f32; the
  * scan bandwidth win is the whole point at 100 TB). One compiled pass:
  * max-abs fold + quantize loop, no allocation beyond the output. */
case class Int8QuantizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quantize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val q = ArrayMath.int8Quantize(input.asInstanceOf[ArrayData],
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType)
    if (q == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(q)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: see hyperplaneBuckets — duplicate bare locals break
      // sibling calls in one codegen scope
      val q = ctx.freshName("i8q")
      s"""
       |double[] $q = graft.functions.ArrayMath.int8Quantize($c, $isFloat);
       |if ($q == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($q); }
     """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Σᵢ (aᵢ − bᵢ)² over two numeric arrays — the Euclidean kernel for
  * clustering (k-means assignment is argmin of this over centroids).
  * Same contract as the cosine kernel: elements widened to double
  * before arithmetic, one sequential fold, null/mismatch/empty → null.
  * On integer-valued inputs (int8-quantized vectors) every term and
  * the sum are exact integral doubles, so a DuckDB replay over the
  * same quantized lists is bit-identical — which is what lets k-means
  * assignments be oracle-checked rather than eyeballed. */
case class SquaredL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_l2"

  @transient private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val anyNull = ctx.freshName("anyNull")
      val getX = if (leftFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (rightFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $anyNull = true; break; }
         |    final double $d = $getX - $getY;
         |    $acc += $d * $d;
         |  }
         |  if ($anyNull) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σᵢ aᵢ·bᵢ over two numeric arrays — the inner-product kernel the
  * integer-exact similarity arms build on. Same contract as the other
  * kernels: elements widened to double, one sequential fold,
  * null/mismatch/empty → null. On int8-quantized inputs every term is
  * ≤ 127² and the sum ≤ dim·127² — exact integral doubles far below
  * 2^53, so pair thresholds can be decided in pure integer arithmetic
  * (dot²·den ≥ num·‖a‖²·‖b‖²) and replayed bit-exactly by the oracle. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  @transient private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val anyNull = ctx.freshName("anyNull")
      val getX = if (leftFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (rightFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $anyNull = true; break; }
         |    $acc += $getX * $getY;
         |  }
         |  if ($anyNull) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayMath {
  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a splitmix64-style mix of both indices, so no (plane, dim) pair
    * shares a seed with any other — a linear `plane·K + dim` seed would
    * make planes correlated for vectors with ≥ K dimensions. */
  def planeCoeff(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xC2B2AE3D27D4EB4FL + 0x165667B19E3779F9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  /** Kernel (codegen entry point): sign-pattern bucket per table.
    * Returns null (→ null column) when any element is null, matching
    * the cosine kernel's contract. nPlanes is bounded so every plane
    * gets a distinct bit. */
  def hyperplaneBuckets(v: ArrayData, nPlanes: Int, nTables: Int,
                        isFloat: Boolean): Array[Long] = {
    require(nPlanes >= 1 && nPlanes <= 62, s"nPlanes=$nPlanes outside [1, 62]")
    val dim = v.numElements()
    var d0 = 0
    while (d0 < dim) {
      if (v.isNullAt(d0)) return null
      d0 += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val plane = t * nPlanes + p
        var dot = 0.0
        var d = 0
        while (d < dim) {
          val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          dot += x * planeCoeff(plane, d)
          d += 1
        }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** Kernel (codegen entry point): symmetric int8 quantization.
    * q_i = floor(x_i·127/max|x| + 0.5) — round-half-toward-+∞, the same
    * floor(x+0.5) the oracle uses, identical for both engines on IEEE
    * doubles. All-zero vectors quantize to zeros (no 0/0); null
    * elements or an empty array → null, matching the other kernels. */
  def int8Quantize(v: ArrayData, isFloat: Boolean): Array[Double] = {
    val dim = v.numElements()
    if (dim == 0) return null
    var scale = 0.0
    var d = 0
    while (d < dim) {
      if (v.isNullAt(d)) return null
      val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      val ax = math.abs(x)
      if (ax > scale) scale = ax
      d += 1
    }
    val out = new Array[Double](dim)
    if (scale == 0.0) return out
    d = 0
    while (d < dim) {
      val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      out(d) = math.floor(x * 127.0 / scale + 0.5)
      d += 1
    }
    out
  }

  /** Register the kernels as SQL functions on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    // register-once: avoids the per-call SimpleFunctionRegistry WARN
    // that polluted the round-1 bench output
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("hyperplane_buckets")))
      return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", es => CosineSimilarityExpr(es(0), es(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_buckets", es => HyperplaneBucketsExpr(es(0),
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_quantize", es => Int8QuantizeExpr(es(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "squared_l2", es => SquaredL2Expr(es(0), es(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", es => DotProductExpr(es(0), es(1)), "scala_udf")
  }

  /** Column API for the bucket kernel. */
  def hyperplaneBuckets(v: Column, nPlanes: Int, nTables: Int): Column =
    call_function("hyperplane_buckets", v,
      org.apache.spark.sql.functions.lit(nPlanes),
      org.apache.spark.sql.functions.lit(nTables))

  /** Column API for the native cosine kernel (session must be
    * registered — all graft entry points do this). */
  def cosineSimilarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Column API for the int8 quantization kernel. */
  def int8Quantize(v: Column): Column =
    call_function("int8_quantize", v)

  /** Column API for the Euclidean kernel. */
  def squaredL2(a: Column, b: Column): Column =
    call_function("squared_l2", a, b)

  /** Column API for the inner-product kernel. */
  def dotProduct(a: Column, b: Column): Column =
    call_function("dot_product", a, b)
}
