package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import scala.collection.mutable

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

  /** Exact per-group order statistics WITHOUT a data-sized sort or
    * per-group value buffering — the 100 TB form of the grouped
    * median/quantile.
    *
    * The naive exact forms (`percentile`, or `row_number over
    * Window.partitionBy(group)`) buffer/sort every row of a group in
    * one task; partitioned by a low-cardinality key, one hot group at
    * scale becomes a single-task sort. This runs the two-phase
    * discipline instead:
    *
    *  1. histogram phase — per (group, requested rank), bucket the
    *     group's value range into `buckets` equal-width bins and count
    *     them: a map-side-combinable hash aggregate, one slim shuffle,
    *     ≤ |targets|·buckets result rows to the driver (metadata-scale
    *     for bounded group counts, the same bound class as the
    *     partition-list collects). The driver walks the cumulative
    *     counts to find the bucket holding the rank, re-targets the
    *     rank inside it, and — because the bucket index is monotone in
    *     the value — narrows to the bucket's OBSERVED [min, max].
    *     Repeat while the bucket still holds more than `cutoff` rows:
    *     each level shrinks the candidate range ×`buckets`, so ~7
    *     levels exhaust double precision (min==max short-circuits:
    *     the rank's value is known without touching the rows again).
    *  2. targeted select — only the final bucket's ≤ `cutoff` rows
    *     (selectivity `cutoff`/|group|) are collected PER GROUP into a
    *     bounded `collect_list`, sorted, and indexed at the residual
    *     rank. No window over raw data anywhere; every aggregate state
    *     is ≤ max(buckets, cutoff) entries by construction.
    *
    * `ranksOf(n)` names the wanted order statistics per group given
    * its non-null count n — e.g. `n => Seq(("median", (n + 1) / 2))`.
    * Ranks are 1-based positions in ascending `valCol` order; the
    * VALUE at a rank is tie-independent, so no tiebreaker is needed.
    * NULL and NaN values are excluded (and excluded from n); values
    * must be finite. Returns one row per (group, stat): (groupCol,
    * stat, value: double). Values round-trip exactly for integral
    * inputs < 2^53.
    *
    * `weightCol` generalizes the rank to WEIGHTED mass (the quantile a
    * training pipeline budgets in: "the document length below which
    * half the TOKENS sit", not half the documents): ranks become
    * 1-based positions in cumulative integer weight — the stat at rank
    * k is the smallest v with Σ weight(rows ≤ v) ≥ k — and `ranksOf`
    * receives the group's TOTAL WEIGHT instead of its row count.
    * Weights must be positive integers (a long column); rows with
    * NULL or non-positive weight carry no mass and are excluded.
    * Histogram narrowing still bounds by ROW count, so convergence
    * and every memory bound are exactly the unweighted ones, and with
    * all-1 weights the result is identical to the unweighted call
    * (law in StatsSpec).
    *
    * Passes over the data: 1 (per-group count/min/max) + L (histogram
    * levels, L=1 for groups ≤ buckets·cutoff rows ≈ 4M at defaults;
    * every level is the SAME scan shape) + 1 (targeted select) —
    * a fixed small number of scans buys the absence of any
    * group-sized task. */
  def exactGroupedRankValues(df: DataFrame, groupCol: String, valCol: String,
                             ranksOf: Long => Seq[(String, Long)],
                             buckets: Int = 1024,
                             cutoff: Long = 4096,
                             maxGroups: Long = 100000,
                             weightCol: Option[String] = None): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    require(cutoff >= 1, s"cutoff=$cutoff must be >= 1")
    require(maxGroups >= 1, s"maxGroups=$maxGroups must be >= 1")
    val spark = df.sparkSession
    val gType = df.schema(groupCol).dataType
    val wExpr = weightCol.map(w => col(w).cast("long")).getOrElse(lit(1L))
    val base = df
      .select(col(groupCol).as("__g"), col(valCol).cast("double").as("__v"),
        wExpr.as("__wt"))
      .where(col("__v").isNotNull && !isnan(col("__v")) && col("__wt") > 0)
    val outSchema = StructType(Seq(
      StructField(groupCol, gType, nullable = true),
      StructField("stat", StringType, nullable = false),
      StructField("value", DoubleType, nullable = true)))

    // phase 0: per-group envelope — |groups| rows to the driver. The
    // bounded-groups contract made LOUD at zero extra scans: the
    // collect is capped at maxGroups+1 rows (LIMIT above the
    // aggregate, so a runaway group key reaches the driver as one
    // excess row, not millions) and overflow fails fast with the
    // right alternative named — a high-cardinality key belongs on
    // approxGroupedQuantiles (mergeable sketch, constant memory),
    // not on driver-coordinated exact ranks.
    val env = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum("__wt").as("tw"),
        min("__v").as("mn"), max("__v").as("mx"))
      .limit((maxGroups + 1).min(Int.MaxValue).toInt)
      .collect()
    require(env.length <= maxGroups,
      s"exactGroupedRankValues: over $maxGroups distinct groups in " +
        s"'$groupCol' — driver-coordinated exact ranks need a bounded " +
        "group key; use approxGroupedQuantiles for unbounded keys or " +
        "raise maxGroups deliberately")

    final class Target(val g: Any, val stat: String, var k: Long,
                       val chain: mutable.ArrayBuffer[(Double, Double, Long)],
                       var lo: Double, var hi: Double)
    val resolved = mutable.ArrayBuffer.empty[Row]   // (g, stat, value)
    var narrowing = mutable.ArrayBuffer.empty[Target] // bucket > cutoff: histogram again
    val selecting = mutable.ArrayBuffer.empty[Target] // bucket ≤ cutoff: targeted select
    env.foreach { r =>
      val (g, n, tw, mn, mx) =
        (r.get(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      val wanted = ranksOf(tw)
      require(wanted.map(_._1).distinct.size == wanted.size,
        s"duplicate stat names requested for group $g: ${wanted.map(_._1)}")
      wanted.foreach { case (stat, k) =>
        require(k >= 1 && k <= tw, s"rank $k outside [1, $tw] for group $g")
        val t = new Target(g, stat, k, mutable.ArrayBuffer.empty, mn, mx)
        if (mn == mx) resolved += Row(g, stat, mn)
        else if (n <= cutoff) selecting += t
        else narrowing += t
      }
    }

    def width(lo: Double, hi: Double): Double =
      math.max((hi - lo) / buckets, java.lang.Double.MIN_VALUE)
    def idxExpr(l: Int): Column =
      least(lit(buckets - 1L), greatest(lit(0L),
        floor((col("__v") - col(s"__lo$l")) / col(s"__w$l")))).cast("long")

    // phase 1: narrow each oversized target one histogram level per
    // pass; all active targets ride ONE scan via a broadcast spec.
    var depth = 0
    val MaxDepth = 16 // range shrinks ×buckets per level; 7 levels span
                      // the whole double range — 16 is a hard backstop
    while (narrowing.nonEmpty && depth < MaxDepth) {
      val specSchema = StructType(
        StructField("__g", gType, nullable = true) +:
        StructField("__stat", StringType, nullable = false) +:
        (0 to depth).flatMap(l => Seq(
          StructField(s"__lo$l", DoubleType, nullable = false),
          StructField(s"__w$l", DoubleType, nullable = false),
          StructField(s"__ib$l", LongType, nullable = true))))
      val specRows = narrowing.map { t =>
        val levels = (t.chain.map { case (lo, w, ib) =>
          Seq[Any](lo, w, ib) } :+
          Seq[Any](t.lo, width(t.lo, t.hi), null)).flatten
        Row.fromSeq(Seq[Any](t.g, t.stat) ++ levels)
      }
      val spec = spark.createDataFrame(
        spark.sparkContext.parallelize(specRows.toSeq, 1), specSchema)
      // null-safe: a NULL group is a group like any other
      var j = base.join(broadcast(spec), base("__g") <=> spec("__g"))
        .drop(spec("__g"))
      for (l <- 0 until depth) j = j.where(idxExpr(l) === col(s"__ib$l"))
      val hist = j.groupBy(col("__g"), col("__stat"), idxExpr(depth).as("__b"))
        .agg(count(lit(1)).as("c"), sum("__wt").as("cw"),
          min("__v").as("bmn"), max("__v").as("bmx"))
        .collect()
      val byTarget = hist.groupBy(r => (r.get(0), r.getString(1)))
      val next = mutable.ArrayBuffer.empty[Target]
      narrowing.foreach { t =>
        val bs = byTarget((t.g, t.stat)).sortBy(_.getLong(2))
        var cum = 0L // cumulative WEIGHT (== row count when unweighted)
        var found = false
        for (b <- bs if !found) {
          val (ib, c, cw, bmn, bmx) = (b.getLong(2), b.getLong(3),
            b.getLong(4), b.getDouble(5), b.getDouble(6))
          if (t.k <= cum + cw) {
            found = true
            t.k -= cum
            t.chain += ((t.lo, width(t.lo, t.hi), ib))
            if (bmn == bmx) resolved += Row(t.g, t.stat, bmn)
            else if (c <= cutoff) selecting += t
            else { t.lo = bmn; t.hi = bmx; next += t }
          } else cum += cw
        }
        require(found, s"rank ${t.k} not reachable for group ${t.g} (${t.stat})")
      }
      narrowing = next
      depth += 1
    }
    require(narrowing.isEmpty,
      s"exactGroupedRankValues did not converge in $MaxDepth levels")

    // phase 2: targeted select — only final-bucket rows (≤ cutoff per
    // target) reach the bounded collect_list.
    val selected: Option[DataFrame] = if (selecting.isEmpty) None else {
      val maxD = selecting.map(_.chain.size).max
      val specSchema = StructType(
        StructField("__g", gType, nullable = true) +:
        StructField("__stat", StringType, nullable = false) +:
        StructField("__k", LongType, nullable = false) +:
        (0 until maxD).flatMap(l => Seq(
          StructField(s"__lo$l", DoubleType, nullable = true),
          StructField(s"__w$l", DoubleType, nullable = true),
          StructField(s"__ib$l", LongType, nullable = true))))
      val specRows = selecting.map { t =>
        val levels = (0 until maxD).flatMap { l =>
          if (l < t.chain.size) { val (lo, w, ib) = t.chain(l); Seq[Any](lo, w, ib) }
          else Seq[Any](null, null, null)
        }
        Row.fromSeq(Seq[Any](t.g, t.stat, t.k) ++ levels)
      }
      val spec = spark.createDataFrame(
        spark.sparkContext.parallelize(specRows.toSeq, 1), specSchema)
      var j = base.join(broadcast(spec), base("__g") <=> spec("__g"))
        .drop(spec("__g"))
      for (l <- 0 until maxD)
        j = j.where(col(s"__ib$l").isNull || idxExpr(l) === col(s"__ib$l"))
      // weighted rank select inside the bounded bucket: sort the
      // ≤ cutoff (value, weight) pairs, fold cumulative weight, answer
      // = first value where it reaches the residual rank. With all-1
      // weights the crossing row IS the k-th smallest, so this is
      // exactly the old element_at(array_sort(...), k).
      Some(j.groupBy(col("__g"), col("__stat"), col("__k"))
        .agg(expr(
          """aggregate(
            |  array_sort(collect_list(named_struct('v', __v, 'w', __wt))),
            |  named_struct('cum', CAST(0 AS BIGINT), 'ans', CAST(NULL AS DOUBLE)),
            |  (acc, x) -> named_struct(
            |    'cum', acc.cum + x.w,
            |    'ans', CASE WHEN acc.ans IS NOT NULL THEN acc.ans
            |                WHEN acc.cum + x.w >= __k THEN x.v END),
            |  acc -> acc.ans)""".stripMargin)
          .as("value"))
        .select(col("__g").as(groupCol), col("__stat").as("stat"), col("value")))
    }
    val resolvedDf = spark.createDataFrame(
      spark.sparkContext.parallelize(resolved.toSeq, 1), outSchema)
    selected.fold(resolvedDf)(s => resolvedDf.unionByName(s))
  }

  /** [[groupedQuantiles]] semantics (exact R-7 interpolation, same
    * 6-dp rounding, same output schema) built on
    * [[exactGroupedRankValues]] — the scale-safe exact path: no
    * per-group value buffering, no data-sized window, identical
    * values. Interpolation replicates Spark's `percentile` formula
    * operation-for-operation (position = p·(n−1); result =
    * (⌈pos⌉−pos)·x_lo + (pos−⌊pos⌋)·x_hi, degenerate cases return
    * x_lo) so a switchover is bit-invisible. */
  def exactGroupedQuantilesScalable(df: DataFrame, groupCol: String,
                                    valCol: String, ps: Seq[Double],
                                    buckets: Int = 1024,
                                    cutoff: Long = 4096): DataFrame = {
    val names = quantileNames(ps)
    val ranksOf: Long => Seq[(String, Long)] = n =>
      ps.zip(names).flatMap { case (p, name) =>
        val pos = p * (n - 1)
        val lo = math.floor(pos).toLong + 1
        val hi = math.ceil(pos).toLong + 1
        if (hi == lo) Seq((s"${name}_lo", lo))
        else Seq((s"${name}_lo", lo), (s"${name}_hi", hi))
      }
    val ranks = exactGroupedRankValues(df, groupCol, valCol, ranksOf,
      buckets, cutoff)
    val counts = df
      .where(col(valCol).isNotNull && !isnan(col(valCol).cast("double")))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val pivoted = ranks.groupBy(col(groupCol))
      .pivot(col("stat"), names.flatMap(n => Seq(s"${n}_lo", s"${n}_hi")))
      .agg(first(col("value")))
    val out = ps.zip(names).map { case (p, name) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val vLo = col(s"${name}_lo")
      val vHi = coalesce(col(s"${name}_hi"), vLo)
      round(when(ceil(pos) === floor(pos) || vHi === vLo, vLo)
        .otherwise((ceil(pos) - pos) * vLo + (pos - floor(pos)) * vHi), 6)
        .as(name)
    }
    pivoted.join(broadcast(counts), Seq(groupCol))
      .select(col(groupCol) +: out: _*)
  }

  /** Equi-depth (quantile-boundary) histogram per group: `bins` bins
    * whose edges are the EXACT order statistics at ranks ⌈j·n/B⌉ —
    * the balanced-bin profile optimizers and samplers want where
    * [[histogram]]'s fixed-width bins collapse under skew (one hot
    * value range owns every row). Edges ride
    * [[exactGroupedRankValues]] (two-phase, no data-sized window);
    * assignment is a pure projection against the broadcast per-group
    * edge array — bin(v) = #{edges < v}, so a row at an edge falls
    * LEFT (bin b covers (e_b, e_b+1]), ties deterministic in both
    * engines. With all-distinct values every bin holds ⌊n/B⌋ or
    * ⌈n/B⌉ rows; heavy ties skew bins honestly (the audit shows it —
    * a tie-run cannot be split by any boundary). Empty bins emit no
    * row. Output: (group, bin, n, lo, hi) with lo/hi the enclosing
    * edges (NULL at the outer bins). */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valCol: String,
                         bins: Int, buckets: Int = 1024,
                         cutoff: Long = 4096): DataFrame = {
    require(bins >= 2 && bins <= 99, s"bins=$bins outside [2, 99]")
    val ranksOf: Long => Seq[(String, Long)] = n =>
      (1 until bins).map(j => (f"e$j%02d", (j * n + bins - 1) / bins))
    val edges = exactGroupedRankValues(df, groupCol, valCol, ranksOf,
      buckets, cutoff)
    val earr = edges
      .select(col(groupCol).as("__g"),
        struct(substring(col("stat"), 2, 2).cast("int").as("j"),
          col("value").as("v")).as("__e"))
      .groupBy("__g").agg(array_sort(collect_list(col("__e"))).as("__es"))
      .select(col("__g"), transform(col("__es"), e => e("v")).as("__edges"))
    val base = df
      .select(col(groupCol).as("__bg"), col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !isnan(col("__v")))
    base.join(broadcast(earr), col("__bg") <=> col("__g"))
      .withColumn("bin",
        size(filter(col("__edges"), e => col("__v") > e)).cast("long"))
      .groupBy(col("__bg"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(earr), col("__bg") <=> col("__g"))
      .select(col("__bg").as(groupCol), col("bin"), col("n"),
        when(col("bin") >= 1,
          element_at(col("__edges"), col("bin").cast("int"))).as("lo"),
        when(col("bin") < bins - 1,
          element_at(col("__edges"), col("bin").cast("int") + 1)).as("hi"))
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

  /** Shuffle-skew audit for a prospective join/aggregation key: BEFORE
    * keying a 100 TB shuffle on `keyCol`, measure what that shuffle
    * would do — the `k` heaviest keys with their corpus share, and for
    * each the projected load of the shuffle bucket it lands in under a
    * `parts`-way hash partitioner. Bucketing uses the portable
    * [[Sampling.hashKey]] so the oracle replays bucket assignment
    * exactly; Spark's own Murmur3 partitioner differs in WHICH bucket
    * a key hits, never in the skew statistics the audit surfaces.
    * All-integer outputs (ppm shares via floor `DIV`): `key_share_ppm`
    * decides salting (the q64 knob), `bucket_share_ppm` against the
    * uniform 10^6/parts line is the projected partition imbalance, and
    * `hot_fraction_ppm` (this key's share of its own bucket) says
    * whether a hot bucket is hot because of this key (salt it) or
    * because of key collisions (raise `parts`).
    *
    * Scale shape: one map-side-combinable count per key (the very
    * aggregate the audited shuffle would run), a `parts`-row bucket
    * rollup FROM the key counts (never from raw rows), a k-row top-k
    * (per-partition heap, k rows to the driver side of the plan), and
    * broadcasts of the two bounded tables back onto it. Nothing wider
    * than the key-count table ever shuffles, and the raw rows are
    * scanned exactly once. */
  def skewAudit(df: DataFrame, keyCol: String, parts: Int, k: Int,
                seed: String = "graft"): DataFrame = {
    require(parts >= 1, s"parts=$parts must be >= 1")
    require(k >= 1, s"k=$k must be >= 1")
    val keyed = df.select(col(keyCol).cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("key_rows"))
      .withColumn("bucket",
        pmod(Sampling.hashKey(col("key"), seed), lit(parts.toLong)))
    val buckets = keyed.groupBy("bucket")
      .agg(sum("key_rows").as("bucket_rows"),
        count(lit(1)).as("bucket_keys"))
    val total = keyed.agg(sum("key_rows").as("__total"))
    keyed
      .orderBy(col("key_rows").desc, col("key"))
      .limit(k)
      .join(broadcast(buckets), Seq("bucket"))
      .crossJoin(broadcast(total))
      // bounded k-row window (the prioritySample idiom)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("key_rows").desc, col("key")))
          .cast("long"))
      .select(col("rank"), col("key"), col("key_rows"),
        expr("key_rows * 1000000 DIV __total").as("key_share_ppm"),
        col("bucket"), col("bucket_rows"), col("bucket_keys"),
        expr("bucket_rows * 1000000 DIV __total").as("bucket_share_ppm"),
        expr("key_rows * 1000000 DIV bucket_rows").as("hot_fraction_ppm"))
  }
}
