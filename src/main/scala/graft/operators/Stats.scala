package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics for quality-gating a corpus: exact grouped
  * quantiles (threshold picking — "keep docs above the per-language
  * p50") and fixed-width histograms (drift monitoring).
  *
  * Quantiles use Spark's exact `percentile` (R-7 linear interpolation —
  * the same convention as DuckDB's `quantile_cont`, which makes the
  * oracle a direct transliteration). Exact grouped percentiles buffer
  * each group's values once on the reduce side: right when groups are
  * bounded (languages, event types, shards); for unbounded/hot groups
  * switch to `approx_percentile`, which is mergeable and
  * constant-memory. Histograms are a pure hash aggregate — one shuffle
  * of (group, bucket) partial counts, no value buffering at all. */
object Stats {

  /** One row per group: `p<NN>` columns with the exact interpolated
    * quantile of `valCol`, rounded to 6 decimals (cross-engine float
    * parity). */
  def groupedQuantiles(df: DataFrame, groupCol: String, valCol: String,
                       ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    // labels keep sub-percent precision (0.999 → p99_9, never a column
    // named p100 holding the 99.9th percentile)
    val names = ps.map { p =>
      "p" + BigDecimal.valueOf(p * 100).underlying.stripTrailingZeros
        .toPlainString.replace(".", "_").replace("-", "m")
    }
    require(names.distinct.size == names.size,
      s"duplicate quantiles requested: $ps")
    val aggs = ps.zip(names).map { case (p, name) =>
      round(percentile(col(valCol), lit(p)), 6).as(name)
    }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Fixed-width histogram per group: bucket lower bound (an exact
    * multiple of `width`) and row count. Buckets with no rows emit no
    * row (sparse form — at corpus scale a dense form would materialize
    * empty buckets for free-floating doubles). */
  def histogram(df: DataFrame, groupCol: String, valCol: String,
                width: Double): DataFrame = {
    require(width > 0, "width must be positive")
    val bucket = (floor(col(valCol).cast("double") / lit(width)) * lit(width))
      .as("bucket_lo")
    df.groupBy(col(groupCol), bucket)
      .agg(count(lit(1)).as("n"))
  }
}
