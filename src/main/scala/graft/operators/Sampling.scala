package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `df.sample()` is partition-order-dependent: a retry, a different
  * split plan, or AQE re-coalescing changes WHICH rows survive — poison
  * for reproducible training mixes and for incremental pipelines where
  * yesterday's sample must not churn. Everything here keys off a 60-bit
  * salted md5 of a stable row id instead: membership is a pure function
  * of (id, seed), so any engine — including the DuckDB oracle — selects
  * byte-identical rows, and re-running over a grown corpus keeps every
  * previously-selected row (hash-threshold consistency).
  *
  * At 100 TB: [[hashSample]] is a shuffle-free codegen'd filter pushed
  * into the scan stage; [[stratifiedSample]] costs one shuffle keyed by
  * stratum (the unavoidable minimum for exact per-stratum counts).
  */
object Sampling {

  /** 2^60 — the hash space of the 15-hex-char md5 prefix. */
  val Space: Long = 1L << 60

  /** 60-bit salted hash of a stable id: uniform on [0, 2^60).
    * Mirror in DuckDB: `('0x' || substr(md5(id::VARCHAR || seed), 1,
    * 15))::BIGINT`. All built-ins, fully codegen'd. */
  def hashKey(e: Column, seed: String): Column =
    conv(substring(md5(concat(e.cast("string"), lit(seed))), 1, 15), 16, 10)
      .cast("long")

  /** Integer threshold for a sampling rate — computed once on the
    * driver so the Spark filter and the SQL oracle compare against the
    * same literal (no cross-engine float drift). */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate=$rate outside [0,1]")
    math.round(rate * Space.toDouble)
  }

  /** Deterministic Bernoulli-by-hash sample: keeps exactly the rows
    * whose hash key falls below rate·2^60. Shuffle-free, stable under
    * retries and re-partitioning, monotone in `rate` (raising the rate
    * only ADDS rows — a grown sample is a superset of the old one). */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 seed: String = "graft"): DataFrame =
    df.filter(hashKey(col(idCol), seed) < lit(threshold(rate)))

  /** Deterministic train/val/test split assignment: each row joins the
    * split whose cumulative-fraction interval its hash key falls in.
    * The property that makes this THE split mechanism at 100 TB: it is
    * a pure projection — no shuffle, no sort, no state — and the
    * assignment of a given id never changes under re-partitioning, task
    * retry, corpus growth, or a different executor count (the hash is
    * engine-portable, so a reader in another system reproduces the
    * exact same split). Fractions must sum to 1 (every row lands
    * somewhere); interval edges are integer thresholds computed once on
    * the driver, so there is no cross-engine float drift at the cuts.
    * A null id hashes to null, every `h < cut` comparison is null, and
    * the row falls through to the LAST split — deterministic, and
    * explicit here so it reads as a contract rather than an accident. */
  def splitAssign(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  seed: String = "graft"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0.0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must be positive and sum to 1: $splits")
    val cuts = splitCuts(splits)
    val h = hashKey(col(idCol), seed)
    // last split takes the open top interval (threshold rounding never
    // drops a row)
    val assign = splits.init.zip(cuts).foldRight(
        lit(splits.last._1)) { case (((name, _), cut), rest) =>
      when(h < lit(cut), lit(name)).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /** The integer interval edges [[splitAssign]] compares against —
    * public so an external oracle/reader uses the IDENTICAL literals
    * (recomputing `threshold(0.8 + 0.1)` elsewhere can land one ulp
    * off `threshold(0.9)` and flip a hash at the cut). The cumulative
    * sum is clamped into [0, 1]: fractions that sum to 1.0 within
    * tolerance can still accumulate to 1.0 + 1 ulp, which would
    * otherwise throw in [[threshold]] (found by the PropertiesSpec
    * law over random fraction vectors). */
  def splitCuts(splits: Seq[(String, Double)]): Seq[Long] =
    splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => threshold(math.min(1.0, math.max(0.0, c))))

  /** Exact stratified sample: within each stratum keep the
    * ceil(frac·|stratum|) rows with the smallest (hash, id) — exact
    * quota per stratum (a Bernoulli filter only hits the quota in
    * expectation), deterministic tie-break via the unique id. `fracs`
    * overrides the default fraction per stratum value — the per-source
    * mixing-weights shape of a training-mix config.
    *
    * Two-phase, skew-proof: a naive `row_number` over
    * `partitionBy(stratum)` sorts every hot stratum in ONE task — at
    * 100 TB a stratum is a source domain with billions of rows. Instead:
    *  - Phase 1 histograms hash keys into 2^(60-shift) buckets per
    *    stratum (pure hash aggregate, no sort) and locates the single
    *    boundary bucket where the quota-th smallest (hash, id) lands —
    *    a window over ≤ 2^(60-shift) tiny histogram rows per stratum.
    *  - Phase 2 keeps every row hashing below the boundary bucket with
    *    a shuffle-free broadcast-join filter, and ranks ONLY the
    *    boundary bucket's rows (~|stratum|/2^(60-shift) of the data,
    *    uniform by construction) for the exact cut.
    * Same selected set as the single-window form — the bucket is the
    * hash's high bits, so bucket order refines hash order — at the cost
    * of THREE scans of `df` (histogram + the two phase-2 branches; the
    * below/boundary branches are separate subtrees, which Spark does
    * not common-subexpression-share). That trade is deliberate: the
    * scans are shuffle-free pushed-filter passes and the only shuffled
    * data is the ~0.1% boundary slice — at 100 TB, re-scanning columnar
    * input beats either caching the corpus or shuffling it once by
    * (stratum, bucket). Callers that prefer one scan over memory can
    * persist `df` first. `boundaryShift` trades boundary-task size
    * against histogram width (50 → 1024 buckets → the ranked slice is
    * ~0.1% of the hottest stratum).
    *
    * CORRECTNESS REQUIRES `df` BE DETERMINISTIC across those scans: a
    * non-deterministic upstream (`sample()`, rand()-derived columns, a
    * re-listed mutable source) can present different rows to the
    * histogram and the two phase-2 branches, yielding an inconsistent
    * selected set. Persist (or checkpoint) such an input first — the
    * same contract as re-reading any Spark plan twice, but it is load-
    * bearing here, so it is a contract, not a performance note. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       defaultFrac: Double,
                       fracs: Map[String, Double] = Map.empty,
                       seed: String = "graft",
                       boundaryShift: Int = 50): DataFrame = {
    (defaultFrac +: fracs.values.toSeq).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f outside [0,1]"))
    require(boundaryShift >= 30 && boundaryShift <= 59,
      s"boundaryShift=$boundaryShift outside [30, 59]")
    val fracCol = fracs.foldLeft(lit(defaultFrac)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    takeSmallestByHash(df, stratumCol, idCol,
      total => ceil(fracCol * total), seed, boundaryShift)
  }

  /** Per-stratum frequency CAP: keep at most `cap` rows per stratum —
    * the "max N documents per domain" pass a crawl-derived corpus runs
    * so no single site dominates training (the absolute-count sibling
    * of [[stratifiedSample]]'s fractional quota; a fraction can't
    * express "never more than 10k docs from one domain" when domain
    * sizes span six orders of magnitude). Deterministic: keeps the cap
    * rows with the smallest (hash, id) per stratum, so growing the
    * corpus only ever REPLACES kept rows with smaller-hash arrivals,
    * never reshuffles the survivors arbitrarily. Same two-phase
    * skew-proof machinery — a billion-row domain is histogrammed, never
    * sorted whole; a cap of 0 drops the stratum. */
  def stratumCap(df: DataFrame, stratumCol: String, idCol: String,
                 defaultCap: Long, caps: Map[String, Long] = Map.empty,
                 seed: String = "graft",
                 boundaryShift: Int = 50): DataFrame = {
    (defaultCap +: caps.values.toSeq).foreach(c =>
      require(c >= 0, s"cap $c must be non-negative"))
    require(boundaryShift >= 30 && boundaryShift <= 59,
      s"boundaryShift=$boundaryShift outside [30, 59]")
    val capCol = caps.foldLeft(lit(defaultCap)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    takeSmallestByHash(df, stratumCol, idCol,
      total => least(total, capCol), seed, boundaryShift)
  }

  /** Shared two-phase engine of [[stratifiedSample]] / [[stratumCap]]:
    * keep, per stratum, the `quota(stratumTotal)` rows with the
    * smallest (hash, id). Phase 1 histograms hash buckets and finds the
    * one boundary bucket where the quota lands; phase 2 keeps earlier
    * buckets outright and exact-ranks only the boundary bucket. See
    * [[stratifiedSample]]'s scaladoc for the full scale rationale and
    * the determinism contract on `df`. */
  private def takeSmallestByHash(df: DataFrame, stratumCol: String,
                                 idCol: String, quota: Column => Column,
                                 seed: String,
                                 boundaryShift: Int): DataFrame = {
    // a null id hashes to null; the single-window form sorted nulls
    // FIRST, selecting them ahead of every real hash. Coalescing to -1
    // reproduces that exactly (every real key is ≥ 0, and -1 >> shift
    // = -1 keeps the null bucket first in histogram order) instead of
    // silently dropping the rows at the null-hostile comparisons below
    val h = coalesce(hashKey(col(idCol), seed), lit(-1L))
    val bucket = shiftright(h, boundaryShift)

    // Phase 1: histogram → per-stratum quota and boundary bucket.
    val byStratum = Window.partitionBy(col(stratumCol))
    val cum = sum(col("__cnt")).over(byStratum.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, 0))
    val bounds = df
      .groupBy(col(stratumCol).as("__s"), bucket.as("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn(stratumCol, col("__s"))
      .withColumn("__cum", cum)
      .withColumn("__quota", quota(sum(col("__cnt")).over(byStratum)))
      // the unique bucket containing the quota-th smallest hash; strata
      // with quota 0 (frac/cap = 0) match no bucket and drop in the join
      .filter(col("__cum") >= col("__quota") &&
        col("__cum") - col("__cnt") < col("__quota"))
      .select(col("__s"), col("__b").as("__bb"),
        (col("__quota") - (col("__cum") - col("__cnt"))).as("__r"))

    // Phase 2: keep below-boundary rows outright; exact-rank only the
    // boundary bucket (null-safe stratum join preserves a null stratum
    // as its own group, like the window form did).
    val keyed = df.withColumn("__h", h).withColumn("__b", bucket)
      .join(broadcast(bounds), col(stratumCol) <=> col("__s"))
    val original = df.columns.map(col).toSeq
    val below = keyed.filter(col("__b") < col("__bb"))
    val boundary = keyed.filter(col("__b") === col("__bb"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__s")).orderBy(col("__h"), col(idCol))))
      .filter(col("__rn") <= col("__r"))
    below.select(original: _*).unionByName(boundary.select(original: _*))
  }

  /** Token-budget mix: within each stratum, take documents in hash
    * order while the running `weightCol` total stays within the
    * stratum's budget — the "N tokens of web, M tokens of code" shape a
    * pre-training mix config specifies. Keeps exactly the rows whose
    * cumulative weight over (hash, id) order is ≤ budget (the classic
    * prefix rule: once the budget is crossed every later row is out,
    * so membership is deterministic and engine-independent).
    *
    * Same two-phase, skew-proof machinery as [[stratifiedSample]], with
    * the count histogram generalized to a WEIGHT histogram: phase 1
    * sums `weightCol` per (stratum, hash-bucket) and finds the single
    * bucket where the running total first crosses the budget; phase 2
    * keeps every earlier bucket outright and runs the exact running sum
    * only over that one boundary bucket (~|stratum|/2^(60-shift) rows,
    * uniform by construction). A hot stratum is never sorted whole. A
    * stratum whose total weight never reaches its budget has no
    * boundary bucket — the left join keeps all its rows.
    *
    * Contracts: weights must be non-negative and non-null (token counts
    * are); `df` must be deterministic across scans (same load-bearing
    * re-scan contract as [[stratifiedSample]]). */
  def budgetTake(df: DataFrame, stratumCol: String, idCol: String,
                 weightCol: String, defaultBudget: Long,
                 budgets: Map[String, Long] = Map.empty,
                 seed: String = "graft",
                 boundaryShift: Int = 50): DataFrame = {
    (defaultBudget +: budgets.values.toSeq).foreach(b =>
      require(b >= 0, s"budget $b negative"))
    require(boundaryShift >= 30 && boundaryShift <= 59,
      s"boundaryShift=$boundaryShift outside [30, 59]")
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val h = coalesce(hashKey(col(idCol), seed), lit(-1L))
    val bucket = shiftright(h, boundaryShift)

    // Phase 1: weight histogram → the unique bucket where the running
    // stratum total first crosses the budget (cum is monotone, so the
    // pair of conditions matches at most one bucket per stratum).
    val byStratum = Window.partitionBy(col(stratumCol))
    val cum = sum(col("__w")).over(byStratum.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, 0))
    val bounds = df
      .groupBy(col(stratumCol).as("__s"), bucket.as("__b"))
      .agg(sum(col(weightCol)).as("__w"))
      .withColumn(stratumCol, col("__s"))
      .withColumn("__cum", cum)
      .filter(col("__cum") > budgetCol && col("__cum") - col("__w") <= budgetCol)
      .select(col("__s"), col("__b").as("__bb"),
        (budgetCol - (col("__cum") - col("__w"))).as("__rem"))

    // Phase 2: left join — a stratum with no boundary bucket (total ≤
    // budget) keeps everything; otherwise keep below-boundary buckets
    // outright and exact-running-sum only the boundary bucket.
    val original = df.columns.map(col).toSeq
    val keyed = df.withColumn("__h", h).withColumn("__b", bucket)
      .join(broadcast(bounds), col(stratumCol) <=> col("__s"), "left")
    val below = keyed.filter(col("__bb").isNull || col("__b") < col("__bb"))
    val boundary = keyed.filter(col("__b") === col("__bb"))
      .withColumn("__rs", sum(col(weightCol)).over(
        Window.partitionBy(col("__s")).orderBy(col("__h"), col(idCol))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("__rs") <= col("__rem"))
    below.select(original: _*).unionByName(boundary.select(original: _*))
  }

  /** Deterministic corpus shuffle: assigns every row its 1-based
    * position in (hash(id, seed), id) order — the reproducible global
    * training-order permutation a data loader consumes. A naive
    * `row_number() OVER (ORDER BY hash)` is a single-partition sort; at
    * 100 TB that is one task sorting the corpus. Instead the hash's
    * high bits bucket the rows (bucket order refines hash order), a
    * tiny ≤2^(60-shift)-row histogram yields each bucket's global
    * offset (the only global window runs over that histogram), and
    * positions are offset + rank within the row's own bucket — one
    * shuffle keyed by uniform buckets, max task ~n/2^(60-shift). */
  /** The bucket-size histogram [[shufflePositions]]'s only global
    * window runs over: one row per occupied hash bucket. The hash is
    * 60-bit, so the cardinality is ≤ 2^(60-boundaryShift) (+1 for the
    * null-id bucket) BY CONSTRUCTION — independent of row count, which
    * is exactly what makes the unpartitioned offsets window safe at any
    * corpus size. SamplingSpec pins the bound, and its growth
    * invariance, on this real construction. */
  private[graft] def shuffleBucketHistogram(df: DataFrame, idCol: String,
                                            seed: String,
                                            boundaryShift: Int): DataFrame = {
    val h = coalesce(hashKey(col(idCol), seed), lit(-1L))
    df.groupBy(shiftright(h, boundaryShift).as("__b"))
      .agg(count(lit(1)).as("__n"))
  }

  def shufflePositions(df: DataFrame, idCol: String, seed: String = "graft",
                       boundaryShift: Int = 50): DataFrame = {
    require(boundaryShift >= 30 && boundaryShift <= 59,
      s"boundaryShift=$boundaryShift outside [30, 59]")
    val h = coalesce(hashKey(col(idCol), seed), lit(-1L))
    val bucket = shiftright(h, boundaryShift)
    val histW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = shuffleBucketHistogram(df, idCol, seed, boundaryShift)
      .withColumn("__off", coalesce(sum(col("__n")).over(histW), lit(0L)))
      .select("__b", "__off")
    val rn = row_number().over(
      Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol)))
    df.withColumn("__h", h).withColumn("__b", bucket)
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("shuffle_pos", col("__off") + rn.cast("long"))
      .drop("__h", "__b", "__off")
  }

  /** Deterministic PRIORITY SAMPLING (Duffield, Lund & Thorup, "Priority
    * sampling for estimation of arbitrary subset sums", JACM 54(6),
    * 2007): a weight-sensitive k-row sample whose per-row estimator
    * `w_est = max(weight, τ)` makes any subset-sum estimate unbiased —
    * THE way to keep a fixed-size audit sample of a 100 TB corpus that
    * still answers "how many tokens does slice X hold" without a full
    * scan. Each row draws priority `weight / u` with `u ∈ (0,1]` derived
    * from [[hashKey]] — deterministic, so the sample is reproducible
    * across retries, engines, and re-partitionings (the same discipline
    * as every sampler here; randomized u is one seed swap away). τ is
    * the (k+1)-th largest priority (0 when the population has ≤ k rows,
    * where the sample is exact and `w_est = weight`).
    *
    * Cross-engine exactness without a single transcendental: `u =
    * (h+1)/2^60` is a round-to-nearest cast plus an exact power-of-two
    * scale, and `weight / u` is one correctly-rounded IEEE division —
    * every engine computing this expression produces bit-identical
    * doubles, so rank, τ, and estimator all replay exactly in the
    * oracle (q91). Contrast Efraimidis–Spirtes keys `u^(1/w)`: same
    * sampling power, but pow/ln are NOT correctly rounded and last-ulp
    * divergence would flip ranks cross-engine.
    *
    * Shape: the priority is a codegen'd projection; top-(k+1) is
    * TakeOrderedAndProject (per-partition heap of k+1, driver merge —
    * no global sort, no full shuffle); τ and the estimator are derived
    * on the ≤ k+1 survivors. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: String = "graft"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val u = (hashKey(col(idCol), seed) + lit(1L)).cast("double") /
      lit(Space.toDouble)
    val prio = df
      .withColumn("weight", col(weightCol).cast("double"))
      .withColumn("priority", col("weight") / u)
      .select(col(idCol), col("weight"), col("priority"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k + 1)
    val rn = row_number().over(
      Window.orderBy(col("priority").desc, col(idCol)))
    val ranked = prio.withColumn("rank", rn) // ≤ k+1 rows: tiny window
    val tau = ranked.filter(col("rank") === k + 1)
      .agg(coalesce(max(col("priority")), lit(0.0)).as("__tau"))
    ranked.filter(col("rank") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("w_est", greatest(col("weight"), col("__tau")))
      .select(col("rank"), col(idCol), col("weight"), col("priority"),
        col("w_est"))
  }

  /** Temperature-rebalanced source sampling — the multilingual/
    * multi-domain mixing rule (UniMax family): target share of source
    * s ∝ w_s^α, with α = 0.5 flattening the head so low-resource
    * sources are over-represented relative to raw token mass. Returns
    * the input rows that survive, each carrying its source's integer
    * `sample_thresh` for auditability.
    *
    * Per-row membership is the [[hashKey]] Bernoulli rule against a
    * per-source integer threshold, so the sample is deterministic,
    * retry/partitioning-stable, and monotone in `frac` (a grown budget
    * keeps every previously sampled row — q41's law, per source).
    *
    * Everything that crosses engines is exact: w_s are integer sums;
    * √w_s is IEEE-correctly-rounded and then 6-dp-rounded; the
    * normalizer Z is a DECIMAL sum of those roundings (order-free);
    * the rate arithmetic is a FIXED sequence of correctly-rounded
    * double ops; thresholds are floors. The oracle replays the whole
    * derivation, not a tolerance band.
    *
    * α is fixed at 0.5 because √ is the one power both engines compute
    * identically (IEEE sqrt is correctly rounded; pow(x, α) for
    * arbitrary α is not so guaranteed) — and 0.5 is also the common
    * production choice. Scale shape: source stats are one aggregate
    * (|sources| rows), the rate table broadcasts, membership is a
    * shuffle-free filter.
    *
    * NULL sources form their own group end to end: they enter the
    * stats (groupBy keeps the null group), and the membership join is
    * null-safe, so null-source rows are sampled at the null group's
    * own rate rather than silently dropped. */
  def temperatureSample(df: DataFrame, idCol: String, srcCol: String,
                        weightCol: String, frac: Double,
                        seed: String = "graft"): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac=$frac outside (0,1]")
    val stats = df.groupBy(col(srcCol).as("__src"))
      .agg(count(lit(1)).as("__ns"),
        sum(col(weightCol).cast("long")).as("__ws"))
    val z = stats.agg(
      sum(round(sqrt(col("__ws").cast("double")), 6).cast("decimal(18,6)"))
        .cast("decimal(28,6)").as("__z"),
      sum(col("__ns")).as("__n"))
    val rates = stats.crossJoin(broadcast(z))
      // ((frac · n) · √w_s) / z / n_s, capped at 1 — the oracle
      // mirrors this exact operation order
      .withColumn("__rate", least(lit(1.0),
        lit(frac) * col("__n").cast("double") *
          round(sqrt(col("__ws").cast("double")), 6) /
          col("__z").cast("double") / col("__ns").cast("double")))
      .select(col("__src"),
        floor(col("__rate") * lit(Space.toDouble)).cast("long")
          .as("sample_thresh"))
    // null-safe equality: a NULL source is a source like any other —
    // the stats aggregate above keeps the null group, so the
    // membership join must too, or null-source rows would be counted
    // in the normalizer Z and the global n yet never sampled (the
    // realized total silently undershooting frac·n).
    df.join(broadcast(rates), df(srcCol) <=> rates("__src"))
      .where(hashKey(col(idCol), seed) < col("sample_thresh"))
      .drop("__src")
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling" — the
    * public recipe): pick from the general pool the `k` documents
    * whose hashed-unigram distribution looks most target-like,
    * sampled PROPORTIONALLY to the importance weight rather than
    * top-k by it (top-k alone collapses onto near-clones of the
    * target; the Gumbel perturbation is what preserves diversity).
    *
    * Derivation, every step engine-exact so the oracle replays it:
    *  - feature: each token hashes to one of `buckets` buckets via
    *    the portable salted md5 ([[hashKey]] mod buckets) — the
    *    "hashed n-gram" trick that caps model size regardless of
    *    vocabulary (the 100 TB boundedness guarantee: the weight
    *    table is `buckets` rows, broadcastable, while a raw-vocab
    *    model grows with the corpus);
    *  - two add-one-smoothed unigram LMs over buckets: the target
    *    slice (`targetPred`) vs the WHOLE corpus as the raw pool;
    *    per-bucket log-importance = round-6 ln of each probability,
    *    differenced as DECIMAL (q100's rounded-ln discipline);
    *  - per-doc score = decimal sum of its tokens' bucket weights
    *    (occurrence-weighted, so the same estimator as the paper's
    *    product of unigram ratios, in log space);
    *  - Gumbel top-k: sampling without replacement proportional to
    *    exp(score) ≡ taking the k largest (score + gᵢ) with
    *    gᵢ = −ln(−ln uᵢ) — uᵢ the doc's portable hash folded to 6
    *    digits, both lns round-6, so the key is a DECIMAL with a
    *    total (key, id) order both engines agree on. The log-space
    *    form never materializes exp(score): weights spanning
    *    hundreds of nats cost nothing.
    *
    * Scale shape: two token-level aggregates (map-side combinable),
    * one broadcast join of the `buckets`-row weight table back onto
    * the token stream, one per-doc aggregate, and a k-row global
    * top-k (sort+limit pushdown) — no shuffle keyed on anything
    * wider than (bucket) and (doc). Candidates are the non-target
    * docs; token-less docs stay candidates at score 0. */
  def dsirSample(docs: DataFrame, idCol: String, srcCol: String,
                 textCol: String, targetPred: Column, buckets: Int,
                 k: Int, seed: String = "graft",
                 trainPred: Column = lit(true)): DataFrame = {
    // `trainPred` is the production train/serve split (the q109/q138
    // frozen-model discipline): BOTH bucket LMs estimate from the
    // train slice only, then every candidate — held-out rows included
    // — is scored through the frozen weight table. trainPred=true (the
    // default) degenerates to training on everything, bit-for-bit
    // (SamplingSpec law).
    val lw = dsirWeights(docs.filter(trainPred), idCol, textCol,
      targetPred, buckets, seed)
    val scored = dsirScore(docs.filter(!targetPred), idCol, srcCol,
      textCol, lw, buckets, seed)
    dsirTake(scored, idCol, srcCol, k, seed)
  }

  /** The frozen DSIR model: the full-spine (bucket, log-importance-
    * weight) table estimated from `docs` — pass the TRAIN slice; the
    * target/raw split inside it is `targetPred`. `buckets` rows
    * total, whatever the vocabulary (a bucket no train token ever
    * hit carries the zero-count smoothed weight, so a serving doc's
    * unseen vocabulary scores as "never seen in either LM" rather
    * than silently dropping out of its sum). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, buckets: Int,
                  seed: String = "graft"): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    val tok = docs.select(targetPred.as("__tgt"),
        filter(TextOps.tokens(col(textCol)), w => length(w) > 0).as("__w"))
      .select(col("__tgt"), explode(col("__w")).as("__tok"))
      .withColumn("__b", pmod(hashKey(col("__tok"), seed), lit(buckets.toLong)))
    val cr = tok.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val ct = tok.filter(col("__tgt")).groupBy("__b")
      .agg(count(lit(1)).as("__ct"))
    val tot = tok.agg(count(lit(1)).as("__nr"),
      count(when(col("__tgt"), 1)).as("__nt"))
    val spine = docs.sparkSession.range(buckets).select(col("id").as("__b"))
    spine.join(cr, Seq("__b"), "left").join(ct, Seq("__b"), "left")
      .na.fill(0L, Seq("__cr", "__ct"))
      .crossJoin(broadcast(tot))
      .select(col("__b"),
        (round(log((col("__ct") + 1).cast("double") /
            (col("__nt") + lit(buckets.toLong))), 6).cast("decimal(18,6)")
          - round(log((col("__cr") + 1).cast("double") /
            (col("__nr") + lit(buckets.toLong))), 6).cast("decimal(18,6)"))
          .as("__lw"))
  }

  /** Frozen scoring: every `docs` row through the weight table — no
    * target/train knowledge on this side, pure serving. Returns
    * (__id, __src, __ntok, __score); token-less docs score 0. */
  private def dsirScore(docs: DataFrame, idCol: String, srcCol: String,
                        textCol: String, lw: DataFrame, buckets: Int,
                        seed: String): DataFrame = {
    val t = docs.select(col(idCol).as("__id"), col(srcCol).as("__src"),
      filter(TextOps.tokens(col(textCol)), w => length(w) > 0).as("__w"))
    val perDoc = t
      .select(col("__id"), explode(col("__w")).as("__tok"))
      .withColumn("__b", pmod(hashKey(col("__tok"), seed), lit(buckets.toLong)))
      .join(broadcast(lw), Seq("__b"))
      .groupBy("__id")
      .agg(count(lit(1)).as("__ntok"),
        sum(col("__lw")).cast("decimal(28,6)").as("__score"))
    t.select(col("__id"), col("__src"))
      .join(perDoc, Seq("__id"), "left")
      .na.fill(0L, Seq("__ntok"))
      .withColumn("__score",
        coalesce(col("__score"), lit(0).cast("decimal(28,6)")))
  }

  /** Gumbel top-k over frozen scores: sampling without replacement
    * proportional to exp(score), in log space. */
  private def dsirTake(scored: DataFrame, idCol: String, srcCol: String,
                       k: Int, seed: String): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    // u folded to 6 digits: (h mod 10^6 + 0.5)/10^6 keeps every
    // intermediate exactly representable in double on both engines
    // (h itself exceeds double's 53-bit exact range) and keeps u
    // strictly inside (0,1) so neither ln can hit ±Inf
    val u = (pmod(hashKey(col("__id"), seed + "|g"), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    val gumbel = (-round(log(-round(log(u), 6)), 6)).cast("decimal(18,6)")
    scored
      .withColumn("__g", gumbel)
      .withColumn("__key", (col("__score") + col("__g")).cast("decimal(29,6)"))
      .orderBy(col("__key").desc, col("__id"))
      .limit(k)
      // bounded k-row window (the prioritySample idiom)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("__key").desc, col("__id")))
          .cast("long"))
      .select(col("rank"), col("__id").as(idCol), col("__src").as(srcCol),
        col("__ntok").as("n_tokens"),
        col("__score").cast("double").as("score"),
        col("__g").cast("double").as("gumbel"),
        col("__key").cast("double").as("sample_key"))
  }

  /** Persist the frozen DSIR model ([[dsirWeights]] of the given docs
    * — pass the train slice) as a parquet artifact: `buckets` rows,
    * one file — the centroid-table class of model state. Train once,
    * score batches forever ([[scoreDsirBatch]]). */
  def writeDsirWeights(docs: DataFrame, idCol: String, textCol: String,
                       targetPred: Column, buckets: Int, path: String,
                       seed: String = "graft"): Unit =
    dsirWeights(docs, idCol, textCol, targetPred, buckets, seed)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/weights")

  /** Score a NEW batch against a persisted DSIR model and draw its
    * Gumbel top-k — the serve path: no target labels, no training
    * corpus, just the `buckets`-row weight table read back and
    * broadcast. Bucket count comes from the artifact itself, so a
    * serving job cannot mis-hash against a model trained at a
    * different width. */
  /** Frozen per-doc scoring from a persisted model — [[scoreDsirBatch]]
    * without the top-k draw: every batch doc's (n_tokens, dsir_score)
    * under the stored weight table, the quality-annotation shape the
    * curation serve path joins ([[graft.operators.Curation]]). */
  def scoreDsirBatchAll(s: org.apache.spark.sql.SparkSession, path: String,
                        batch: DataFrame, idCol: String, srcCol: String,
                        textCol: String,
                        seed: String = "graft"): DataFrame = {
    val lw = s.read.parquet(s"$path/weights")
    val buckets = lw.count().toInt // model-sized: bounded driver read
    dsirScore(batch, idCol, srcCol, textCol, lw, buckets, seed)
      .select(col("__id").as(idCol), col("__src").as(srcCol),
        col("__ntok").as("n_tokens"),
        col("__score").cast("double").as("dsir_score"))
  }

  def scoreDsirBatch(s: org.apache.spark.sql.SparkSession, path: String,
                     batch: DataFrame, idCol: String, srcCol: String,
                     textCol: String, k: Int,
                     seed: String = "graft"): DataFrame = {
    val lw = s.read.parquet(s"$path/weights")
    val buckets = lw.count().toInt // model-sized: bounded driver read
    dsirTake(dsirScore(batch, idCol, srcCol, textCol, lw, buckets, seed),
      idCol, srcCol, k, seed)
  }
}
