package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1L to 5000L).map(i => (i, s"u${i % 97}",
    if (i % 10 < 2) "click" else if (i % 10 < 6) "view" else "scroll"))
  private def df = rows.toDF("id", "user", "kind")

  // 3 sources with strongly skewed token mass: A has 100× C's docs
  private def tempCorpus = (
    (1L to 1000L).map(i => (i, "A", 100L)) ++
    (2001L to 2100L).map(i => (i, "B", 100L)) ++
    (3001L to 3010L).map(i => (i, "C", 100L))).toDF("id", "src", "w")

  test("temperatureSample flattens shares toward sqrt(token mass)") {
    // frac low enough that no source caps (C's rate ≈ 0.78 < 1)
    val kept = Sampling.temperatureSample(tempCorpus, "id", "src", "w",
      frac = 0.1)
    val thresh = kept.groupBy("src").agg(min("sample_thresh"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-doc rate ∝ √w_s / n_s with equal per-doc weights ⇒
    // thresh_C / thresh_A = √(n_A/n_C) = 10 (raw mass ratio is 100)
    val ratio = thresh("C").toDouble / thresh("A")
    assert(ratio > 9.9 && ratio < 10.1, s"flattening ratio $ratio")
    // expected total = frac·n by construction: Σ r_s·n_s = frac·n
    val total = kept.count()
    assert(math.abs(total - 0.1 * 1110) < 0.1 * 1110 * 0.3,
      s"sampled $total of 1110 at frac=0.1")
  }

  test("temperatureSample caps a tiny source's rate at exactly 1") {
    // C's uncapped rate = frac·n·√w_C/(Z·n_C): with few enough C docs
    // it crosses 1 and must clamp to the full hash space
    val kept = Sampling.temperatureSample(tempCorpus, "id", "src", "w",
      frac = 0.9)
    val c = kept.filter(col("src") === "C")
    assert(c.count() == 10, "capped source must keep every row")
    assert(c.select(min("sample_thresh")).head().getLong(0) == Sampling.Space)
  }

  test("temperatureSample samples NULL-source rows at the null group's own rate") {
    // null is a source like any other: it must enter the stats AND the
    // membership join (null-safe), or the realized total silently
    // undershoots frac·n. 200 null-source docs next to A/B/C.
    val withNulls = tempCorpus.unionByName(
      (5001L to 5200L).map(i => (i, null: String, 100L)).toDF("id", "src", "w"))
    val kept = Sampling.temperatureSample(withNulls, "id", "src", "w",
      frac = 0.3)
    val nullKept = kept.filter(col("src").isNull).count()
    assert(nullKept > 0, "null-source rows were silently dropped")
    // the null group's realized rate tracks its own √-flattened share
    // (coarse band — hash membership is Bernoulli per row)
    val total = kept.count()
    assert(math.abs(total - 0.3 * 1310) < 0.3 * 1310 * 0.3,
      s"sampled $total of 1310 at frac=0.3 with a null source present")
  }

  test("temperatureSample is monotone in frac and repartition-stable") {
    def ids(frac: Double, parts: Int) =
      Sampling.temperatureSample(tempCorpus.repartition(parts), "id",
          "src", "w", frac)
        .select("id").collect().map(_.getLong(0)).toSet
    val small = ids(0.2, 1)
    val big = ids(0.4, 7)
    assert(small.subsetOf(big), "growing the budget dropped rows")
    assert(ids(0.2, 5) == small)
  }

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(df, "id", 0.2, "s1").select("id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(7), "id", 0.2, "s1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("hashSample rate is honored in expectation and monotone in rate") {
    val small = Sampling.hashSample(df, "id", 0.1, "s1").select("id")
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(df, "id", 0.3, "s1").select("id")
      .collect().map(_.getLong(0)).toSet
    // raising the rate only ADDS rows — incremental-pipeline stability
    assert(small.subsetOf(big))
    assert(math.abs(small.size / 5000.0 - 0.1) < 0.02)
    assert(math.abs(big.size / 5000.0 - 0.3) < 0.03)
  }

  test("different seeds give different (still deterministic) samples") {
    val a = Sampling.hashSample(df, "id", 0.2, "s1").select("id")
      .collect().map(_.getLong(0)).toSet
    val c = Sampling.hashSample(df, "id", 0.2, "s2").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a != c)
  }

  test("stratifiedSample hits the exact per-stratum quota") {
    val out = Sampling.stratifiedSample(df, "kind", "id",
      defaultFrac = 0.05, fracs = Map("click" -> 0.5))
    val got = out.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = df.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (k, n) =>
      val frac = if (k == "click") 0.5 else 0.05
      assert(got(k) == math.ceil(frac * n).toLong,
        s"stratum $k: got ${got(k)}, want ceil($frac*$n)")
    }
  }

  test("stratifiedSample keeps original columns and is deterministic") {
    val out = Sampling.stratifiedSample(df, "kind", "id", 0.1)
    assert(out.columns.toSeq == Seq("id", "user", "kind"))
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(df.repartition(11), "kind", "id", 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("stratifiedSample is monotone in fraction (superset under growth)") {
    // the ranking is fixed per stratum and only the quota grows, so a
    // larger fraction must keep every previously selected row — the
    // same incremental-pipeline stability hashSample guarantees
    val small = Sampling.stratifiedSample(df, "kind", "id", 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.stratifiedSample(df, "kind", "id", 0.4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(small.nonEmpty && big.size > small.size)
  }

  test("two-phase stratifiedSample equals the single-window reference") {
    import org.apache.spark.sql.expressions.Window
    // the pre-round-4 implementation, kept as the semantic reference:
    // rank the WHOLE stratum in one window and cut at the quota
    def reference(d: org.apache.spark.sql.DataFrame, frac: Double,
                  fracs: Map[String, Double], seed: String) = {
      val fracCol = fracs.foldLeft(lit(frac)) { case (acc, (k, v)) =>
        when(col("kind") === k, lit(v)).otherwise(acc)
      }
      val byStratum = Window.partitionBy(col("kind"))
      val ranked = byStratum.orderBy(Sampling.hashKey(col("id"), seed), col("id"))
      d.withColumn("__rn", row_number().over(ranked))
        .withColumn("__n", count(lit(1)).over(byStratum))
        .filter(col("__rn") <= ceil(fracCol * col("__n")))
        .drop("__rn", "__n")
    }
    // skewed data (one hot stratum), a null stratum, null ids (the
    // window reference sorts null hashes first and selects them), and
    // edge fractions
    val skewed = (1L to 4000L).map(i =>
        (i, if (i % 100 == 0) "rare" else "hot"))
      .map { case (i, k) => (i, if (i % 997 == 0) null else k) }
      .toDF("id", "kind")
      .union(Seq((null.asInstanceOf[java.lang.Long], "hot"),
        (null.asInstanceOf[java.lang.Long], "rare"))
        .toDF("id", "kind"))
    // multiset of (kind, id) — null ids are indistinguishable, so their
    // COUNT per stratum is the observable
    def keys(d: org.apache.spark.sql.DataFrame) =
      d.select("kind", "id").collect()
        .map(r => (Option(r.getString(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .groupBy(identity).view.mapValues(_.length).toMap
    for (frac <- Seq(0.0, 0.07, 0.5, 1.0); seed <- Seq("s1", "s2")) {
      val want = keys(reference(skewed, frac, Map("rare" -> 0.9), seed))
      val got = keys(Sampling.stratifiedSample(skewed, "kind", "id", frac,
        Map("rare" -> 0.9), seed))
      assert(got == want, s"frac=$frac seed=$seed: ${got.size} vs ${want.size}")
    }
    // a coarse shift exercises multi-row boundary buckets
    val coarse = keys(Sampling.stratifiedSample(skewed, "kind", "id", 0.07,
      Map("rare" -> 0.9), "s1", boundaryShift = 55))
    val want = keys(reference(skewed, 0.07, Map("rare" -> 0.9), "s1"))
    assert(coarse == want)
  }

  test("budgetTake equals the single-window prefix-take reference") {
    import org.apache.spark.sql.expressions.Window
    // semantic reference: cumulative weight over (hash, id) order per
    // stratum, keep while ≤ budget — the naive hot-stratum-sorting form
    def reference(d: org.apache.spark.sql.DataFrame, dflt: Long,
                  budgets: Map[String, Long], seed: String) = {
      val budgetCol = budgets.foldLeft(lit(dflt)) { case (acc, (k, v)) =>
        when(col("kind") === k, lit(v)).otherwise(acc)
      }
      val cum = sum(col("w")).over(Window.partitionBy(col("kind"))
        .orderBy(coalesce(Sampling.hashKey(col("id"), seed), lit(-1L)), col("id"))
        .rowsBetween(Window.unboundedPreceding, 0))
      d.withColumn("__cum", cum).filter(col("__cum") <= budgetCol)
        .drop("__cum")
    }
    // skew (one hot stratum), a null stratum, zero weights, and
    // budgets hitting all regimes: 0, mid-stratum, over-total
    val data = (1L to 3000L).map { i =>
      val kind = if (i % 50 == 0) "rare" else "hot"
      (i, if (i % 997 == 0) null else kind, (i % 7): Long)
    }.toDF("id", "kind", "w")
    def keys(d: org.apache.spark.sql.DataFrame) =
      d.select("kind", "id").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    for (dflt <- Seq(0L, 500L, 100000L); seed <- Seq("s1", "s2")) {
      val budgets = Map("rare" -> 40L)
      val want = keys(reference(data, dflt, budgets, seed))
      val got = keys(Sampling.budgetTake(data, "kind", "id", "w",
        dflt, budgets, seed))
      assert(got == want, s"dflt=$dflt seed=$seed: ${got.size} vs ${want.size}")
    }
    // coarse shift → multi-row boundary buckets exercise the running sum
    val want = keys(reference(data, 500L, Map("rare" -> 40L), "s1"))
    val coarse = keys(Sampling.budgetTake(data, "kind", "id", "w",
      500L, Map("rare" -> 40L), "s1", boundaryShift = 55))
    assert(coarse == want)
  }

  test("budgetTake honors the budget and is monotone in budget") {
    val docs = (1L to 1000L).map(i => (i, s"s${i % 3}", 10L))
      .toDF("id", "kind", "w")
    val out = Sampling.budgetTake(docs, "kind", "id", "w", 170L)
    val spent = out.groupBy("kind").agg(sum("w").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    spent.values.foreach(t => assert(t <= 170L && t > 0L))
    val small = out.select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.budgetTake(docs, "kind", "id", "w", 400L)
      .select("id").collect().map(_.getLong(0)).toSet
    // growing a budget only ADDS rows — mix-config stability
    assert(small.subsetOf(big) && big.size > small.size)
  }

  test("soft-mix composition: a cluster of N duplicates spends one " +
       "document of budget; naive pricing lets duplicates eat it") {
    // 40 distinct 5-token docs with disjoint shingles (so the only
    // near-dup pairs are exact copies); the dup corpus holds each doc
    // 4×. Costs are uniform and divide the budget exactly, so the
    // prefix counts are EXACT, not approximate.
    def text(i: Long) = (0 until 5).map(j => s"w${i}x$j").mkString(" ")
    val clean = (1L to 40L).map(i => (i, text(i), "s"))
      .toDF("doc_id", "text", "source")
    val dup = (1L to 160L).map(i => (i, text((i - 1) % 40 + 1), "s"))
      .toDF("doc_id", "text", "source")
    val budget = 12L * 5L * 1000000L // 12 documents of effective mass
    def softMix(docs: org.apache.spark.sql.DataFrame) = {
      val w = TextOps.softDedupWeights(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("source"), col("text")),
          Seq("doc_id"))
      Sampling.budgetTake(w, "source", "doc_id", "eff_tokens_ppm", budget)
    }
    val cleanKept = softMix(clean)
    val dupKept = softMix(dup)
    // same budget admits the same EFFECTIVE mass: 12 clean docs ≡ 48
    // quarter-weight duplicates — duplication doesn't eat the budget
    assert(cleanKept.count() == 12L)
    assert(dupKept.count() == 48L)
    val dupEff = dupKept.agg(sum("eff_tokens_ppm")).head.getLong(0)
    assert(dupEff == budget, s"effective spend $dupEff != budget $budget")
    // naive pricing (raw tokens, no weights): the dup corpus admits
    // only 12 ROWS — each copy costs a full document, so the realized
    // unique coverage collapses versus the soft mix's ≥ 12 clusters
    val naive = Sampling.budgetTake(
      dup.withColumn("tok_ppm", lit(5L * 1000000L)),
      "source", "doc_id", "tok_ppm", budget)
    assert(naive.count() == 12L)
    val softDistinct = dupKept.select("text").distinct().count()
    val naiveDistinct = naive.select("text").distinct().count()
    assert(softDistinct >= 12L && softDistinct >= naiveDistinct,
      s"soft=$softDistinct naive=$naiveDistinct unique docs")
  }

  test("shufflePositions is the exact permutation of the hash order") {
    val d = (1L to 2357L).map(i => (i, s"p$i")).toDF("id", "payload")
    val out = Sampling.shufflePositions(d, "id", "seed1")
    val rows = out.select("shuffle_pos", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // positions are exactly 1..n, each once
    assert(rows.map(_._1).sorted.toSeq == (1L to 2357L).toSeq)
    // position order IS (hash, id) order
    val byPos = rows.sortBy(_._1).map(_._2).toSeq
    val byHash = d.orderBy(Sampling.hashKey(col("id"), "seed1"), col("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(byPos == byHash)
    // deterministic under repartitioning, seed changes the permutation
    val again = Sampling.shufflePositions(d.repartition(13), "id", "seed1")
      .select("shuffle_pos", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == rows.toSet)
    val other = Sampling.shufflePositions(d, "id", "seed2")
      .select("shuffle_pos", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(other != rows.toSet)
  }

  test("tfidfTopTerms scores a tiny corpus as computed by hand") {
    val docs = Seq((1L, "a b b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(5)))
    // N=2; df: a=1 b=2 c=1; idf_a = ln(3), idf_b = ln(2), idf_c = ln(3)
    val lnRound = (x: Double) => math.round(x * 1e6) / 1e6
    assert(out.toSeq == Seq(
      (1L, 1L, "b", lnRound(2 * math.log(2.0))),
      (1L, 2L, "a", lnRound(math.log(3.0))),
      (2L, 1L, "c", lnRound(math.log(3.0))),
      (2L, 2L, "b", lnRound(math.log(2.0)))))
  }

  test("splitAssign partitions every row; fractions approximately honored") {
    val df = spark.range(2000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val m = Sampling.splitAssign(df, "id", splits)
      .groupBy("split").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m.values.sum == 2000 && m.keySet == Set("train", "val", "test"))
    // hash-uniformity: train ≈ 1600 within a generous tolerance
    assert(math.abs(m("train") - 1600L) < 150,
      s"train split far from its fraction: $m")
  }

  test("splitAssign is invariant under repartitioning and corpus growth") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assigned(df: org.apache.spark.sql.DataFrame) =
      Sampling.splitAssign(df, "id", splits)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val small = assigned(spark.range(500).toDF("id"))
    val grown = assigned(spark.range(1500).toDF("id").repartition(13))
    // a given id NEVER changes split — growth only adds assignments
    assert(small.forall { case (id, s) => grown(id) == s })
  }

  test("stratumCap equals the single-window reference; 0 drops, big cap keeps all") {
    import org.apache.spark.sql.expressions.Window
    val caps = Map("s1" -> 1000L, "s2" -> 0L)
    val df = (1 to 300).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "src")
    // reference: rank the whole stratum in one window, cut at the cap
    val capCol = caps.foldLeft(lit(7L)) { case (acc, (k, v)) =>
      when(col("src") === k, lit(v)).otherwise(acc)
    }
    val ranked = Window.partitionBy(col("src"))
      .orderBy(Sampling.hashKey(col("id"), "graft"), col("id"))
    val want = df.withColumn("__rn", row_number().over(ranked))
      .filter(col("__rn") <= capCol).drop("__rn")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = Sampling.stratumCap(df, "src", "id", defaultCap = 7L, caps)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    assert(!got.exists(_._2 == "s2"), "cap 0 must drop the stratum")
    assert(got.count(_._2 == "s1") == 100, "cap above size must keep all")
    assert(got.count(_._2 == "s0") == 7, "default cap must bind")
  }

  test("splitAssign sends a null id to the last split, deterministically") {
    val df = Seq[java.lang.Long](1L, 2L, null).toDF("id")
    val splits = Seq("train" -> 0.5, "test" -> 0.5)
    val got = Sampling.splitAssign(df, "id", splits)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1))).toMap
    assert(got(-1L) == "test", s"null id must land in the last split: $got")
  }

  test("splitAssign rejects fractions that do not sum to 1") {
    val df = spark.range(10).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(df, "id", Seq("a" -> 1.2, "b" -> -0.2))
    }
  }

  test("shufflePositions' global-window histogram is bounded by " +
       "2^(60-shift) buckets regardless of row count") {
    // the construction whose size makes the offsets window safe: the
    // 60-bit hash shifted right leaves ≤ 2^(60-shift) possible buckets
    // (+1 for the null-id bucket) — row count cannot move it, which is
    // the documented contract for running an unpartitioned window here
    val shift = 52 // 2^8 = 256 possible buckets — observable with 20k rows
    val bound = (1L << (60 - shift)) + 1
    val small = spark.range(5000).toDF("id")
    val large = spark.range(20000).toDF("id")
    val hSmall = Sampling.shuffleBucketHistogram(small, "id", "graft", shift)
    val hLarge = Sampling.shuffleBucketHistogram(large, "id", "graft", shift)
    val (nS, nL) = (hSmall.count(), hLarge.count())
    assert(nS <= bound && nL <= bound,
      s"histogram exceeded its structural bound: $nS / $nL vs $bound")
    // 4x the rows, same histogram size (every bucket already occupied)
    assert(nL == nS,
      s"row growth moved the histogram size ($nS -> $nL) — the bound " +
        "must come from the hash width, never the data")
    // and the histogram accounts for every row
    assert(hLarge.agg(sum(col("__n"))).head().getLong(0) == 20000L)
  }

  test("prioritySample: τ is the (k+1)-th priority, every kept priority " +
       "is ≥ τ, and the estimator floors at the weight") {
    val df = (1L to 200L).map(i => (i, 1L + i % 17)).toDF("id", "w")
    val k = 12
    val out = Sampling.prioritySample(df, "id", "w", k, seed = "ps-law")
      .orderBy("rank").collect()
    assert(out.length == k)
    // recompute every priority naively and check τ against rank k+1
    val all = df.withColumn("__p",
        col("w").cast("double") /
          ((Sampling.hashKey(col("id"), "ps-law") + lit(1L)).cast("double") /
            lit(Sampling.Space.toDouble)))
      .orderBy(col("__p").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val tau = all(k)._2
    out.zip(all.take(k)).foreach { case (got, (id, p)) =>
      assert(got.getAs[Long]("id") == id && got.getAs[Double]("priority") == p,
        s"rank ${got.getAs[Int]("rank")}: got $got expected ($id, $p)")
      assert(p >= tau, "kept priority below τ")
      assert(got.getAs[Double]("w_est") ==
        math.max(got.getAs[Double]("weight"), tau))
    }
  }

  test("prioritySample with k ≥ population keeps everything exactly " +
       "(τ = 0, estimator = weight) and is repartition-invariant") {
    val df = (1L to 9L).map(i => (i, 2L * i)).toDF("id", "w")
    val out = Sampling.prioritySample(df, "id", "w", k = 20, seed = "ps-all")
      .collect()
    assert(out.length == 9)
    out.foreach(r => assert(
      r.getAs[Double]("w_est") == r.getAs[Double]("weight"),
      s"τ must be 0 when the sample is the population: $r"))
    val big = (1L to 500L).map(i => (i, 1L + i % 23)).toDF("id", "w")
    val a = Sampling.prioritySample(big, "id", "w", 15, "ps-inv")
      .collect().map(_.toString).sorted
    val b = Sampling.prioritySample(big.repartition(13), "id", "w", 15, "ps-inv")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "sample changed under repartitioning")
  }

  test("dsirSample: target docs are never candidates, ranks are " +
       "contiguous, k caps the draw, deterministic and " +
       "repartition-stable") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.dsirSample(df, "doc_id", "source", "text",
        col("source").isin("src0", "src1"), buckets = 64, k = 25)
    val out = run(d).collect()
    assert(out.length == 25)
    assert(out.map(_.getLong(0)).toSeq == (1L to 25L))
    assert(out.forall(r => r.getString(2) != "src0" && r.getString(2) != "src1"))
    val again = run(d.repartition(13)).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "sample changed under repartitioning / re-run")
  }

  test("dsirSample prefers target-like documents: a wide score gap " +
       "beats every possible Gumbel perturbation") {
    // target speaks vocabulary A; the pool splits into A-speakers and
    // B-speakers. 400 A-tokens per doc build a score gap of hundreds
    // of nats, while the Gumbel key perturbation is bounded by
    // (-ln(-ln u)) over u ∈ (5e-7, 1-5e-7) ⊂ (-2.7, 14.6) — so every
    // A-speaking pool doc MUST outrank every B-speaking one.
    val aText = Seq.fill(400)("alpha beta gamma").mkString(" ")
    val bText = Seq.fill(400)("omega psi chi").mkString(" ")
    val docs = ((1L to 5L).map(i => (i, "target", aText)) ++
      (11L to 20L).map(i => (i, "poolA", aText)) ++
      (21L to 30L).map(i => (i, "poolB", bText)))
      .toDF("doc_id", "source", "text")
    val got = Sampling.dsirSample(docs, "doc_id", "source", "text",
      col("source") === "target", buckets = 32, k = 20).collect()
    assert(got.length == 20, "pool has exactly 20 candidates")
    val (top10, bottom10) = got.sortBy(_.getLong(0)).splitAt(10)
    assert(top10.forall(_.getString(2) == "poolA"),
      s"top half must be A-speakers: ${top10.map(_.getString(2)).toSeq}")
    assert(bottom10.forall(_.getString(2) == "poolB"))
  }

  test("dsirSample split degeneracy: trainPred = everything ≡ no split, " +
       "bit-for-bit; unseen-vocabulary docs score through the spine") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val base = Sampling.dsirSample(d, "doc_id", "source", "text",
      col("source").isin("src0", "src1"), buckets = 64, k = 25)
      .collect().map(_.toString).toSeq
    val degen = Sampling.dsirSample(d, "doc_id", "source", "text",
      col("source").isin("src0", "src1"), buckets = 64, k = 25,
      trainPred = lit(true))
      .collect().map(_.toString).toSeq
    assert(base == degen, "explicit all-train differs from the default")
    // a pool doc whose vocabulary the train slice never saw still gets
    // a full score via the bucket spine's zero-count smoothed weights
    // (an observed-buckets-only weight table would drop its tokens)
    val docs = ((1L to 4L).map(i => (i * 2, "t", "alpha beta")) ++
      Seq((10L, "pool", "foo bar foo qux"),   // in the train slice
        (101L, "pool", "qwxyzzq jjqqkk")))    // train slice: doc_id % 2 = 0
      .toDF("doc_id", "source", "text")
    val got = Sampling.dsirSample(docs, "doc_id", "source", "text",
      col("source") === "t", buckets = 16, k = 5,
      trainPred = pmod(col("doc_id"), lit(2)) === 0).collect()
    assert(got.length == 2)
    val unseen = got.find(_.getLong(1) == 101L).get
    assert(unseen.getLong(3) == 2L, "both unseen tokens must count")
    // its buckets carry the zero-count weight ln((nr+B)/(nt+B)) =
    // ln(28/24) per token — nonzero because the train slice's raw
    // pool is bigger than its target slice
    assert(math.abs(unseen.getDouble(4)) > 0.0,
      "unseen-vocab doc must carry the smoothed (nonzero) score")
  }

  test("DSIR store roundtrip: scoreDsirBatch over the stored model ≡ " +
       "dsirSample, bit-for-bit; the artifact is exactly buckets rows") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val tgt = col("source").isin("src0", "src1")
    val path = java.nio.file.Files
      .createTempDirectory("graft-dsir-rt").toString
    Sampling.writeDsirWeights(d, "doc_id", "text", tgt,
      buckets = 64, path = path)
    assert(spark.read.parquet(s"$path/weights").count() == 64,
      "weight artifact must be exactly the bucket spine")
    val served = Sampling.scoreDsirBatch(spark, path, d.filter(!tgt),
        "doc_id", "source", "text", k = 25)
      .collect().map(_.toString).toSeq
    val direct = Sampling.dsirSample(d, "doc_id", "source", "text", tgt,
        buckets = 64, k = 25)
      .collect().map(_.toString).toSeq
    assert(served == direct,
      "serving from the parquet model diverged from the one-shot path")
  }

  test("prioritySample subset-sum estimates are unbiased across seeds " +
       "(Duffield–Lund–Thorup estimator sweep)") {
    // fixed seed list → deterministic test; the MEAN total-weight
    // estimate over seeds must sit near the true total even though any
    // single seed's estimate is noisy
    val df = (1L to 300L).map(i => (i, 1L + (i * i) % 29)).toDF("id", "w")
    val truth = df.agg(sum(col("w"))).head().getLong(0).toDouble
    val ests = (1 to 50).map { s =>
      Sampling.prioritySample(df, "id", "w", k = 40, seed = s"sweep-$s")
        .agg(sum(col("w_est"))).head().getDouble(0)
    }
    val mean = ests.sum / ests.size
    assert(math.abs(mean - truth) / truth < 0.05,
      s"mean estimate $mean drifted from truth $truth")
  }
}
