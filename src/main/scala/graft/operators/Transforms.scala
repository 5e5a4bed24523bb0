package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure `DataFrame => DataFrame` re-expressions of the reference's
  * staging-layer transforms (SURVEY.md §2.3 projections, §2.4 filters,
  * §2.8 scalar functions). Everything here stays inside whole-stage
  * codegen: built-in functions only, no UDFs, so filters and projections
  * push down to the parquet scan.
  *
  * Reference citations (into /root/reference/):
  *  - P1 column-list projection     mabna_tables_create.py:145-146
  *  - F1 multi-col NOT NULL filter  mabna_tables_create.py:147-148
  *  - X1 compact-date → 'Y/M/D'     mabna_tables_create.py:149-152
  *  - X2 pct-change ratio           mabna_tables_create.py:153-154
  *  - F2 string BETWEEN date window mabna_tables_create.py:244
  *  - P4 conditional column drop    mabna_tables_create.py:247-248
  *  - P5 positional column insert   mabna_tables_create.py:117,:149-154
  */
object Transforms {

  /** P1 — keep an explicit column list (pandas `df[[...]]`). */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** F1 — drop rows with a null in any required column
    * (pandas `dropna(subset=...)`; pandas also drops NaN, so NaN is
    * filtered too for float columns — see SURVEY.md §7.4). */
  def dropNullRows(df: DataFrame, required: Seq[String]): DataFrame = {
    val floatish = df.schema.fields
      .filter(f => required.contains(f.name))
      .filter(f => f.dataType.typeName == "double" || f.dataType.typeName == "float")
      .map(_.name).toSet
    val conds = required.map { c =>
      val base = col(c).isNotNull
      if (floatish(c)) base && !isnan(col(c)) else base
    }
    df.filter(conds.reduce(_ && _))
  }

  /** X1 — derive a 'yyyy/MM/dd' date string by slicing a compact
    * 'yyyyMMddHHmmss' string (reference slices `date_time[0:4]` etc.). */
  def slashDateFromCompact(compact: Column): Column =
    concat_ws("/",
      substring(compact, 1, 4),
      substring(compact, 5, 2),
      substring(compact, 7, 2))

  /** Compact 'yyyyMMddHHmmss' string from a timestamp — the fixture
    * realization of the reference's `date_time` payload (FIXTURES.md §A). */
  def compactFromTimestamp(ts: Column): Column =
    date_format(ts, "yyyyMMddHHmmss")

  /** X2 — pct-change ratio `change / (base - change)`: change over the
    * previous value. Pandas float semantics: null propagates, zero
    * denominator yields ±Infinity (0/0 → NaN). Spark's `/` returns null
    * on a zero divisor (non-ANSI), so the zero case is made explicit:
    * `change * Inf` carries the sign and maps 0 → NaN like IEEE. */
  def pctChange(change: Column, base: Column): Column = {
    val denom = base - change
    when(denom === 0, change * lit(Double.PositiveInfinity))
      .otherwise(change / denom)
  }

  /** F2 — lexicographic BETWEEN over zero-padded 'yyyy/MM/dd' strings. */
  def dateStrBetween(dateStr: Column, lo: String, hi: String): Column =
    dateStr.between(lit(lo), lit(hi))

  /** P4 — drop columns only for configured variants (the reference drops
    * `code,isin,trade_count,volume,value` for commodity/currency trades). */
  def conditionalDrop(df: DataFrame, variant: String,
                      dropFor: Set[String], cols: Seq[String]): DataFrame =
    if (dropFor.contains(variant)) df.drop(cols: _*) else df

  /** P5 — place a derived column at a target ordinal (the reference's
    * `df.insert(loc=...)`; column order matters to the BI consumer). */
  def insertAt(df: DataFrame, name: String, value: Column, pos: Int): DataFrame = {
    val others = df.columns.filterNot(_ == name)
    val (before, after) = others.splitAt(pos)
    val ordered = (before :+ name) ++ after
    df.withColumn(name, value).select(ordered.map(col): _*)
  }

  /** The staging-trades pipeline shape (§3.3's hottest path), re-hosted
    * on `lineitem` (FIXTURES.md §A mapping): project → dropna → derive
    * compact date string → slash date → pct-change ratio. One fused
    * whole-stage-codegen pipeline; projection+filter push to the scan. */
  def stgTrades(lineitem: DataFrame): DataFrame = {
    val projected = project(lineitem, Seq(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"))
    val cleaned = dropNullRows(projected, Seq(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate"))
    val withCompact = cleaned
      .withColumn("date_time", compactFromTimestamp(col("l_shipdate")))
      .drop("l_shipdate")
    val withDate = insertAt(withCompact, "j_date",
      slashDateFromCompact(col("date_time")), 2)
    insertAt(withDate, "pct_change",
      pctChange(col("l_discount"), col("l_extendedprice")), 8)
  }
}
