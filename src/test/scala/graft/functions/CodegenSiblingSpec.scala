package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType, IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 regression (from the round-17 advice): several custom
  * expressions declared FIXED Java local names in their generated code
  * (`ph`, `p`, `sig`, …). Two sibling calls in one codegen scope —
  * e.g. a projection computing media_phash over two planes — then
  * declared the same local twice, the generated class failed javac,
  * and Spark silently fell back to the interpreted path (correct
  * results, codegen contract violated). Every such local now goes
  * through `ctx.freshName`; this spec compiles a projection with TWO
  * instances of each expression side by side — before the fix,
  * GenerateMutableProjection.generate threw a duplicate-variable
  * CompileException here. */
class CodegenSiblingSpec extends AnyFunSuite {

  private def bin(ord: Int) = BoundReference(ord, BinaryType, nullable = true)

  test("two media_phash siblings compile in one codegen scope") {
    val e1 = MediaPHashExpr(bin(0), Literal(8, IntegerType))
    val e2 = MediaPHashExpr(bin(1), Literal(8, IntegerType))
    GenerateMutableProjection.generate(Seq(e1, e2), useSubexprElimination = false)
  }

  test("two media_plane siblings compile in one codegen scope") {
    val e1 = MediaPlaneExpr(bin(0), 0)
    val e2 = MediaPlaneExpr(bin(1), 0)
    GenerateMutableProjection.generate(Seq(e1, e2), useSubexprElimination = false)
  }

  test("two minhash_signature siblings compile in one codegen scope") {
    val s = BoundReference(0, StringType, nullable = true)
    val t = BoundReference(1, StringType, nullable = true)
    val coeffs = graft.operators.TextOps.minhashCoeffs(8)
    val e1 = MinHashSigExpr(s, 3, 8, coeffs)
    val e2 = MinHashSigExpr(t, 3, 8, coeffs)
    GenerateMutableProjection.generate(Seq(e1, e2), useSubexprElimination = false)
  }

  test("two hyperplane-bucket and int8-quantize siblings compile in one " +
       "codegen scope") {
    val v1 = BoundReference(0, ArrayType(FloatType), nullable = true)
    val v2 = BoundReference(1, ArrayType(FloatType), nullable = true)
    GenerateMutableProjection.generate(
      Seq(HyperplaneBucketsExpr(v1, 4, 2), HyperplaneBucketsExpr(v2, 4, 2)),
      useSubexprElimination = false)
    GenerateMutableProjection.generate(
      Seq(Int8QuantizeExpr(v1), Int8QuantizeExpr(v2)),
      useSubexprElimination = false)
  }
}
