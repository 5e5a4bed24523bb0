package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's custom scalar functions
  * (SURVEY.md §7.3: the Jalali conversion is the one scalar the built-in
  * library can't express). Implemented as `Expression`s rather than Scala
  * UDFs so they stay null-safe, serialization-free, and usable from SQL;
  * eval is integer arithmetic (no allocation beyond the result), so
  * CodegenFallback costs one virtual call per row.
  */
case class JalaliDateExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "jalali_date"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Jalali.jDateString(input.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Jalali.jDateString($c))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (jy, jm, jd) struct of a Gregorian DateType — one conversion, all
  * parts (the dim-date generator selects fields out of this). */
case class JalaliPartsExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("jy", IntegerType, nullable = false),
    StructField("jm", IntegerType, nullable = false),
    StructField("jd", IntegerType, nullable = false)))
  override def prettyName: String = "jalali_parts"
  override def nullSafeEval(input: Any): Any = {
    val (jy, jm, jd) = Jalali.fromEpochDay(input.asInstanceOf[Int])
    InternalRow(jy, jm, jd)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jalali (jy, jm, jd) → Gregorian DateType. */
case class JalaliToDateExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DateType
  override def prettyName: String = "jalali_to_date"
  override def nullSafeEval(jy: Any, jm: Any, jd: Any): Any =
    Jalali.j2d(jy.asInstanceOf[Int], jm.asInstanceOf[Int], jd.asInstanceOf[Int]) - 2440588
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.Jalali.j2d($a, $b, $c) - 2440588")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object GraftFunctions {
  /** Register all graft SQL functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // register-once: silences the per-call SimpleFunctionRegistry WARN
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("jalali_to_date")))
      return
    reg.createOrReplaceTempFunction("jalali_date",
      es => JalaliDateExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("jalali_parts",
      es => JalaliPartsExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("jalali_to_date",
      es => JalaliToDateExpr(es(0), es(1), es(2)), "scala_udf")
  }

  def jalaliDate(c: Column): Column = call_function("jalali_date", c)
  def jalaliParts(c: Column): Column = call_function("jalali_parts", c)
  def jalaliToDate(jy: Column, jm: Column, jd: Column): Column =
    call_function("jalali_to_date", jy, jm, jd)
}
