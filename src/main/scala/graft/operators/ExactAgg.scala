package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact, overflow-bounded money aggregation at corpus scale.
  *
  * A `sum` over a wide decimal (precision > 18) leaves Spark's compact
  * Long-backed Decimal representation and pays per-row BigDecimal
  * arithmetic in the aggregation buffer — profiled at ~2× the cost of
  * the whole scan+group for q07 (round-2 profiling at sf0.1: dec(38,8)
  * sum chain 0.9 s vs 0.43 s long-sum over the same 600k rows). At
  * 10^11+ rows that constant dominates the job.
  *
  * The alternative here: represent fixed-point money as exact integer
  * units (cents) in a LONG, sum longs, and widen to decimal only where
  * the magnitude demands it. A single global long sum would overflow
  * silently at ~10^10 rows × 10^9 units, so the reduction is two-level:
  *
  *  - stage 1 groups by (keys…, spark_partition_id()). The partition id
  *    is constant within a map task, so map-side combine emits at most
  *    |groups| rows per task and the exchange is near-empty. A partial
  *    sum covers one scan partition (≤ ~10^7 rows under default
  *    maxPartitionBytes), keeping it ≤ ~10^16 « Long.MaxValue for
  *    per-row magnitudes up to 10^9 units.
  *  - stage 2 merges the partials as decimal(38,0) — exact, and only
  *    |groups| × |partitions| rows ever touch the BigDecimal path.
  *
  * Correctness contract: unit extraction uses the same HALF_UP
  * double→decimal cast the DuckDB oracle uses (`CAST(x AS DECIMAL(p,s))`),
  * so results are bit-identical to the wide-decimal formulation (pinned
  * by ExactAggSpec).
  */
object ExactAgg {

  /** `e` as exact integer units (scale-`s` fixed point) in a LONG.
    * The double→decimal cast is HALF_UP — identical to the SQL oracle's
    * CAST convention — and every intermediate stays a compact decimal
    * (precision ≤ 18), so the whole extraction is Long arithmetic.
    *
    * Domain bound: |e| < 10^intDigits. Sessions here run with ANSI off,
    * where an out-of-range cast yields NULL — which a sum would silently
    * drop, corrupting the "exact" total. The guard turns that into a
    * loud per-row error instead (also fires on NaN, which has no money
    * meaning). Cost: one null-check branch per row inside codegen,
    * negligible next to the decimal multiply. */
  def fixedPointUnits(e: Column, intDigits: Int, s: Int): Column = {
    val p = intDigits + s
    require(p + s + 1 + 1 <= 18, s"decimal($p,$s) × 10^$s must stay compact")
    val fixed = e.cast(s"decimal($p,$s)")
    val guarded = when(e.isNotNull && fixed.isNull,
      raise_error(concat(
        lit(s"fixedPointUnits: value exceeds decimal($p,$s) domain: "),
        e.cast("string"))).cast(s"decimal($p,$s)"))
      .otherwise(fixed)
    (guarded * lit(math.pow(10, s).toLong).cast(s"decimal(${s + 1},0)"))
      .cast("long")
  }

  /** Two-level exact sum: stage-1 long sums per (keys, partition id),
    * stage-2 decimal merge. `sums` maps output column name → (long-typed
    * unit expression, decimal scale of the units); each emerges as an
    * exact DOUBLE of value sum(units)/10^scale. Non-money double sums
    * ride along via `carryDouble`; a LONG row count lands in
    * `countName`. */
  def exactSums(df: DataFrame, keys: Seq[Column],
                sums: Seq[(String, Column, Int)],
                carryDouble: Seq[(String, Column)] = Nil,
                countName: String = "count_order"): DataFrame = {
    val partialAggs =
      sums.map { case (name, units, _) => sum(units).as(s"_p_$name") } ++
        carryDouble.map { case (name, e) => sum(e).as(s"_p_$name") } :+
        count(lit(1)).as("_p_cnt")
    val partial = df
      .groupBy((keys :+ spark_partition_id().as("_pid")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sums.map { case (name, _, s) =>
        // divisor cast to a narrow decimal keeps the quotient at scale 6
        // (≥ any money scale here) — exact, then one double cast
        (sum(col(s"_p_$name").cast("decimal(38,0)")) /
          lit(math.pow(10, s).toLong).cast(s"decimal(${s + 1},0)"))
          .cast("double").as(name)
      } ++
        carryDouble.map { case (name, _) => sum(col(s"_p_$name")).as(name) } :+
        sum(col("_p_cnt")).as(countName)
    partial.groupBy(keys: _*).agg(finalAggs.head, finalAggs.tail: _*)
  }
}
