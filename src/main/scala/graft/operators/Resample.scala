package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with last-observation-carried-
  * forward — the standard "as-of snapshots every N minutes" view of an
  * irregular observation stream (the reference domain's market data is
  * exactly this shape).
  *
  * Composition, not a new kernel: per-key spans are one aggregate, the
  * grid is a bounded per-key `sequence` explode (span/step ticks — the
  * output's own size, no amplification), and the carry-forward is the
  * skew-guarded [[Joins.asofJoinBucketed]] of grid ticks against
  * observations, so one hot key's history never serializes into a
  * single task.
  *
  * Contract: `tsCol` is integral (epoch units) and non-negative; grid
  * ticks are the multiples of `stepUs` inside each key's observed
  * [min, max] span (exact integer arithmetic throughout). Every tick
  * carries the latest observation at-or-before it — never null, since
  * ticks start at-or-after the key's first observation. */
object Resample {

  private def floorDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))).cast("decimal(38,0)") /
      lit(d).cast("decimal(38,0)")).cast("long")

  def resampleLocf(obs: DataFrame, keyCol: String, tsCol: String,
                   valCols: Seq[String], stepUs: Long): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    // loud domain bound (the rest of this file is exact at any long
    // magnitude): the 1024-step as-of bucket width must not wrap
    require(stepUs <= Long.MaxValue / 1024,
      s"stepUs=$stepUs overflows the 1024-step bucket width")
    val spans = obs.groupBy(col(keyCol))
      .agg(min(col(tsCol)).cast("long").as("__lo"),
        max(col(tsCol)).cast("long").as("__hi"))
    // first/last step-multiple inside the span: ceil(lo/step) =
    // floor((lo + step − 1)/step) with the ADD done in decimal(38,0),
    // where it cannot wrap — exact for every long including
    // Long.MinValue (a long-typed negate or add would overflow at the
    // extremes under the non-ANSI session)
    val kLo = floorDiv(
      col("__lo").cast("decimal(38,0)") + lit(stepUs - 1), stepUs)
    val kHi = floorDiv(col("__hi"), stepUs)
    val grid = spans
      .select(col(keyCol), kLo.as("__klo"), kHi.as("__khi"))
      .filter(col("__klo") <= col("__khi")) // sub-step spans have no tick
      .select(col(keyCol),
        explode(sequence(col("__klo"), col("__khi"))).as("__k"))
      .select(col(keyCol), (col("__k") * stepUs).as("grid_ts"))
    Joins.asofJoinBucketed(grid, obs, keyCol, "grid_ts", tsCol,
      valCols, bucketWidth = stepUs * 1024)
  }
}
