package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** `p<NN>` column labels with sub-percent precision (0.999 → p99_9,
    * never a column named p100 holding the 99.9th percentile). */
  private def quantileNames(ps: Seq[Double]): Seq[String] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val names = ps.map { p =>
      "p" + BigDecimal.valueOf(p * 100).underlying.stripTrailingZeros
        .toPlainString.replace(".", "_").replace("-", "m")
    }
    require(names.distinct.size == names.size,
      s"duplicate quantiles requested: $ps")
    names
  }

  /** Exact top-k rows per group in `ordering` order, `rank` appended —
    * REPLACING any pre-existing `rank` column in the input (withColumn
    * semantics; rename yours first if it must survive). The ordering
    * must reach a total order (end it with a unique id)
    * or the kept set is nondeterministic. Scale note: Spark's
    * rank-limit pushdown rewrites the `row_number ≤ k` filter into
    * `WindowGroupLimit`, so each map task pre-prunes to its LOCAL
    * top-k before the exchange — the shuffle carries ≤ k rows per
    * (task, group), never the group. That is what makes grouped top-k
    * survive a billion-row group; pinned in PlanContractSpec. */
  def topKPerGroup(df: DataFrame, groupCol: String, k: Int,
                   ordering: Seq[Column]): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    df.withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(ordering: _*)).cast("long"))
      .filter(col("rank") <= k)
  }

  /** One row per group: `p<NN>` columns with the exact interpolated
    * quantile of `valCol`, rounded to 6 decimals (cross-engine float
    * parity). */
  def groupedQuantiles(df: DataFrame, groupCol: String, valCol: String,
                       ps: Seq[Double]): DataFrame = {
    val aggs = ps.zip(quantileNames(ps)).map { case (p, name) =>
      round(percentile(col(valCol), lit(p)), 6).as(name)
    }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** [[groupedQuantiles]] with bounded memory: same output schema, but
    * the per-group state is a mergeable fixed-size sketch
    * (`approx_percentile`) instead of a buffer of every value — the
    * form that survives an unbounded hot group (one event type with
    * billions of rows) at 100 TB, where the exact variant OOMs its
    * reduce task. Rank error ≤ 1/`accuracy`; raise `accuracy` to
    * tighten (memory grows linearly with it, independent of group
    * size). Use the exact form when groups are known-bounded — it is
    * the one the DuckDB oracle certifies. */
  def approxGroupedQuantiles(df: DataFrame, groupCol: String,
                             valCol: String, ps: Seq[Double],
                             accuracy: Int = 10000): DataFrame = {
    require(accuracy >= 1, s"accuracy=$accuracy must be positive")
    val names = quantileNames(ps)
    val sketch = approx_percentile(col(valCol),
      array(ps.map(lit): _*), lit(accuracy))
    df.groupBy(col(groupCol)).agg(sketch.as("__q"))
      .select(col(groupCol) +: names.zipWithIndex.map { case (name, i) =>
        round(element_at(col("__q"), i + 1), 6).as(name)
      }: _*)
  }

  /** Winsorize: clip `valCol` to its group's [pLo, pHi] quantile band —
    * the standard outlier-taming pass before training-statistics or
    * normalization. The per-group bounds are a broadcast-sized
    * aggregate; clipping itself picks one of {value, lo, hi} by
    * comparison only (no float arithmetic), so the output is
    * engine-exact. Appends a `clipped` column. Every input row is
    * preserved: the bounds join is null-safe, so a null group clips
    * against the null group's own quantile band (a plain equi-join
    * would silently drop those rows). */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo < pHi, s"need pLo($pLo) < pHi($pHi)")
    val names = quantileNames(Seq(pLo, pHi))
    val bounds = groupedQuantiles(df, groupCol, valCol, Seq(pLo, pHi))
      .select(col(groupCol).as("__g"), col(names.head).as("__lo"),
        col(names(1)).as("__hi"))
    df.join(broadcast(bounds), df(groupCol) <=> bounds("__g"))
      .withColumn("clipped",
        least(greatest(col(valCol), col("__lo")), col("__hi")))
      .drop("__g", "__lo", "__hi")
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

  /** Sketch-vs-exact accuracy audit per group: HyperLogLog++ distinct
    * count (`approx_count_distinct`) and mergeable approximate median
    * (`percentile_approx`) computed ALONGSIDE their exact counterparts,
    * emitting the exact value plus a within-tolerance flag for each
    * sketch. This is how the constant-memory sketch path — the 100 TB
    * form, where exact distinct shuffles every key and exact percentile
    * buffers every value — gets certified against the exact path it
    * replaces: the sketch value itself is engine-specific (an oracle
    * can't reproduce Spark's HLL registers), but the exact value and
    * the tolerance verdict are portable, so the flags oracle as
    * constant TRUE. Sketches are deterministic for a given input, so a
    * green flag is stable, not flaky. `rsd` 0.01 gives ~1% HLL error
    * against the 5% tolerance; `percentile_approx` at accuracy 10000
    * bounds rank error to n/10000 per group. */
  def sketchAccuracy(df: DataFrame, groupCol: String, distinctCol: String,
                     valueCol: String, rsd: Double = 0.01,
                     tol: Double = 0.05): DataFrame = {
    // two aggregation branches, NOT one: mixing COUNT(DISTINCT) with
    // buffer-heavy aggregates makes the planner pre-aggregate per
    // (group, distinct-key) and drag the percentile/HLL merge buffers
    // through that expanded keyspace — one sketch buffer PER USER
    // instead of per group (measured 7× slower). Split, each branch
    // plans its natural shape: sketches in one exchange keyed by group,
    // exact distinct in the standard two-level expansion with plain
    // count buffers; the rejoin is a broadcast over |groups| rows.
    val sketches = df.groupBy(col(groupCol))
      .agg(
        approx_count_distinct(col(distinctCol), rsd).as("__hll"),
        percentile(col(valueCol), lit(0.5)).as("__p50"),
        percentile_approx(col(valueCol), lit(0.5), lit(10000)).as("__p50a"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(distinctCol)).as("exact_distinct"))
    exact.join(broadcast(sketches), Seq(groupCol))
      .select(col(groupCol), col("exact_distinct"),
        (abs(col("__hll") - col("exact_distinct")) <=
          col("exact_distinct") * tol).as("hll_ok"),
        (abs(col("__p50a") - col("__p50")) <=
          abs(col("__p50")) * tol + lit(1e-9)).as("p50_ok"))
  }
}
