package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("dropNullRows drops nulls AND NaN in double columns (pandas dropna parity)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("v", DoubleType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 1.0), Row(null, 2.0), Row(3L, null), Row(4L, Double.NaN))),
      schema)
    val kept = Transforms.dropNullRows(df, Seq("id", "v")).collect()
    assert(kept.map(_.getLong(0)).toSet == Set(1L))
  }

  test("pctChange: zero denominator yields Infinity (pandas parity), null propagates") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (20.0, 1020.0), (1020.0, 1020.0), (null, 1020.0))
      .toDF("change", "base")
      .select(Transforms.pctChange(col("change"), col("base")).as("pct"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 20.0 / 1000.0)
    assert(rows(1).getDouble(0).isPosInfinity)
    assert(rows(2).isNullAt(0))
  }

  test("slashDateFromCompact slices positions like the reference") {
    val out = Seq("14011225093000").toDF("dt")
      .select(Transforms.slashDateFromCompact(col("dt"))).first().getString(0)
    assert(out == "1401/12/25")
  }

  test("slashDateFromCompact on short input mirrors python slicing (best effort)") {
    // reference slices s[0:4]+'/'+s[4:6]+'/'+s[6:8]; python slices of a
    // short string truncate to '' — so "14011" → "1401" + "/" + "1" +
    // "/" + "" = "1401/1/". substring behaves identically.
    val out = Seq("14011").toDF("dt")
      .select(Transforms.slashDateFromCompact(col("dt"))).first().getString(0)
    assert(out == "1401/1/")
  }

  test("insertAt places the derived column at the target ordinal") {
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    val out = Transforms.insertAt(df, "w", lit(9), 1)
    assert(out.columns.toSeq == Seq("x", "w", "y", "z"))
  }

  test("conditionalDrop drops only for configured variants") {
    val df = Seq((1, "c", 5)).toDF("id", "code", "volume")
    val dropped = Transforms.conditionalDrop(df, "commodity",
      Set("commodity", "currency"), Seq("code", "volume"))
    val kept = Transforms.conditionalDrop(df, "share",
      Set("commodity", "currency"), Seq("code", "volume"))
    assert(dropped.columns.toSeq == Seq("id"))
    assert(kept.columns.toSeq == Seq("id", "code", "volume"))
  }

  test("dateStrBetween is lexicographic on zero-padded strings") {
    val df = Seq("1398/12/29", "1399/01/01", "1400/06/15", "1401/01/01").toDF("j")
    val n = df.filter(Transforms.dateStrBetween(col("j"), "1399/01/01", "1400/12/29")).count()
    assert(n == 2)
  }
}
