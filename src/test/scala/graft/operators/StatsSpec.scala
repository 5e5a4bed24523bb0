package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("groupedQuantiles interpolates with the R-7 convention") {
    // group a: values 10,20,30,40 → p50 = 25 (index 1.5), p25 = 17.5
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0),
      ("b", 5.0)).toDF("g", "v")
    val out = Stats.groupedQuantiles(df, "g", "v", Seq(0.25, 0.5))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a") == (17.5, 25.0))
    assert(out("b") == (5.0, 5.0)) // single value: every quantile is it
  }

  test("approxGroupedQuantiles tracks the exact form within rank tolerance") {
    // 10k values per group, deliberately skewed (quadratic ramp) so a
    // sloppy sketch would visibly drift at the upper quantiles
    val df = (1 to 10000).flatMap(i =>
        Seq(("a", (i.toDouble * i) / 10000.0), ("b", i.toDouble)))
      .toDF("g", "v")
    val ps = Seq(0.5, 0.9, 0.99)
    val exact = Stats.groupedQuantiles(df, "g", "v", ps).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Stats.approxGroupedQuantiles(df, "g", "v", ps, accuracy = 10000)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    // schema parity with the exact form
    assert(Stats.approxGroupedQuantiles(df, "g", "v", ps).columns.toSeq ==
      Stats.groupedQuantiles(df, "g", "v", ps).columns.toSeq)
    for (g <- exact.keys; i <- ps.indices) {
      // rank error ≤ 1/accuracy ⇒ value error bounded by the local value
      // spread around the quantile; 1% of the group's range is generous
      val spread = (exact(g).max - exact(g).min).max(1.0) // values span the ramp
      assert(math.abs(approx(g)(i) - exact(g)(i)) <= 0.01 * spread + 1e-6,
        s"group $g p=${ps(i)}: approx ${approx(g)(i)} vs exact ${exact(g)(i)}")
    }
  }

  // deliberately adversarial corpus for the two-phase exact path:
  // heavy ties, a massive skewed group, a tiny group, a 2-row group,
  // a null group, and an all-equal group
  private def rankCorpus = {
    val rnd = new scala.util.Random(7)
    val hot = (1 to 5000).map(_ => ("hot", math.floor(rnd.nextDouble() * 50) / 7.0))
    val tiny = Seq(("tiny", 3.0), ("tiny", 1.0), ("tiny", 2.0))
    val pair = Seq(("pair", -5.5), ("pair", 5.5))
    val nul = (1 to 40).map(i => (null: String, i.toDouble % 11))
    val flat = (1 to 300).map(_ => ("flat", 42.0))
    (hot ++ tiny ++ pair ++ nul ++ flat).toDF("g", "v")
  }

  private def naiveRank(rows: Seq[(String, Double)], g: String, k: Long): Double =
    rows.filter(_._1 == g).map(_._2).sorted.apply(k.toInt - 1)

  test("exactGroupedRankValues equals the naive sorted-rank reference " +
       "(deep narrowing forced)") {
    val data = rankCorpus.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val ns = data.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def ranks(n: Long) = Seq(("first", 1L), ("med", (n + 1) / 2), ("last", n))
    // buckets=4, cutoff=2 forces multi-level histogram recursion on
    // every non-trivial group — the convergence path, not the shortcut
    val out = Stats.exactGroupedRankValues(rankCorpus, "g", "v", ranks,
        buckets = 4, cutoff = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((g, n) <- ns; (stat, k) <- ranks(n)) {
      val expected = naiveRank(data, g, k)
      assert(out((g, stat)) == expected,
        s"group $g $stat (rank $k): got ${out((g, stat))}, want $expected")
    }
    assert(out.size == ns.size * 3)
  }

  test("weighted exactGroupedRankValues ≡ unweighted over the " +
       "weight-expanded corpus (seeded, deep narrowing forced)") {
    // the defining law: a row of weight w is w unit-weight copies.
    // random shapes with ties + skewed weights, adversarial sizing.
    val rnd = new scala.util.Random(123)
    for (trial <- 1 to 3) {
      val rows = (1 to 400 + rnd.nextInt(400)).map { _ =>
        (s"g${rnd.nextInt(4)}",
          math.floor(rnd.nextDouble() * 40) / 2.0, // heavy ties
          1L + rnd.nextInt(7))
      }
      val df = rows.toDF("g", "v", "w").repartition(1 + rnd.nextInt(6))
      val expanded = rows.flatMap { case (g, v, w) => Seq.fill(w.toInt)((g, v)) }
        .toDF("g", "v")
      def ranks(n: Long) = Seq(("p25", (n + 3) / 4), ("med", (n + 1) / 2),
        ("last", n))
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      val weighted = canon(Stats.exactGroupedRankValues(df, "g", "v", ranks,
        buckets = 4, cutoff = 3, weightCol = Some("w")))
      val unit = canon(Stats.exactGroupedRankValues(expanded, "g", "v", ranks,
        buckets = 4, cutoff = 3))
      assert(weighted == unit, s"trial $trial: weighted != expanded-unit")
    }
  }

  test("weighted exactGroupedRankValues: all-1 weights ≡ unweighted; " +
       "null/zero-weight rows carry no mass") {
    def ranks(n: Long) = Seq(("med", (n + 1) / 2))
    val withOnes = rankCorpus.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(
      canon(Stats.exactGroupedRankValues(withOnes, "g", "v", ranks,
        weightCol = Some("w"))) ==
      canon(Stats.exactGroupedRankValues(rankCorpus, "g", "v", ranks)))
    // zero/null weight rows are excluded from mass AND total
    val mixed = Seq(("a", 1.0, 5L), ("a", 2.0, 0L), ("a", 3.0, 5L))
      .toDF("g", "v", "w")
      .union(Seq(("a", 9.0)).toDF("g", "v")
        .withColumn("w", org.apache.spark.sql.functions.lit(null: java.lang.Long)))
    val got = canon(Stats.exactGroupedRankValues(mixed, "g", "v",
      n => { assert(n == 10L, s"total mass $n != 10"); Seq(("med", 5L)) },
      weightCol = Some("w")))
    assert(got(("a", "med")) == 1.0) // cum weight reaches 5 at v=1.0
  }

  test("equiDepthHistogram ≡ naive edge reference; distinct values " +
       "balance bins; total ties collapse to bin 0") {
    val rnd = new scala.util.Random(77)
    val rows = (1 to 3000).map { i =>
      val g = s"g${i % 3}"
      val v = if (g == "g2") 5.0 // total-tie group
              else if (rnd.nextBoolean()) rnd.nextInt(12).toDouble // ties
              else rnd.nextDouble() * 100
      (g, v)
    }
    val bins = 4
    val got = Stats.equiDepthHistogram(rows.toDF("g", "v"), "g", "v",
        bins, buckets = 4, cutoff = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    for ((g, vs0) <- rows.groupBy(_._1)) {
      val vs = vs0.map(_._2).sorted
      val n = vs.size.toLong
      val edges = (1 until bins).map(j => vs(((j * n + bins - 1) / bins).toInt - 1))
      val naive = vs.groupBy(v => edges.count(_ < v).toLong)
        .view.mapValues(_.size.toLong).toMap
      val gotBins = got.collect { case ((`g`, b), t) => b -> t }.toMap
      assert(gotBins.view.mapValues(_._1).toMap == naive,
        s"group $g: got ${gotBins.view.mapValues(_._1).toMap}, want $naive")
      gotBins.foreach { case (b, (_, lo, hi)) =>
        if (b >= 1) assert(lo.contains(edges(b.toInt - 1)))
        else assert(lo.isEmpty)
        if (b < bins - 1) assert(hi.contains(edges(b.toInt)))
        else assert(hi.isEmpty)
      }
    }
    // the all-tied group is one bin holding everything
    val g2 = got.keys.filter(_._1 == "g2").toSeq
    assert(g2 == Seq(("g2", 0L)), s"tie group split: $g2")
    // distinct values balance: sizes in {floor, ceil}
    val distinctRows = (1 to 1000).map(i => ("d", i * 1.5))
    val bal = Stats.equiDepthHistogram(distinctRows.toDF("g", "v"), "g", "v", 8)
      .collect().map(_.getLong(2))
    assert(bal.forall(c => c == 125L), s"distinct 1000/8 bins not balanced: ${bal.toSeq}")
  }

  test("exactGroupedRankValues at default sizing equals the forced-deep run") {
    def ranks(n: Long) = Seq(("q1", (n + 3) / 4), ("med", (n + 1) / 2))
    def run(b: Int, c: Long) =
      Stats.exactGroupedRankValues(rankCorpus, "g", "v", ranks, b, c)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(run(1024, 4096) == run(4, 2))
    assert(run(1024, 4096) == run(16, 1))
  }

  test("exactGroupedQuantilesScalable is bit-identical to groupedQuantiles") {
    val ps = Seq(0.25, 0.5, 0.9, 0.99)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (1 to ps.size).map(i => if (r.isNullAt(i)) null else r.getDouble(i))).toMap
    val corpus = rankCorpus.where(col("g").isNotNull) // percentile agg keys parity on non-null groups
    val exact = Stats.groupedQuantiles(corpus, "g", "v", ps)
    val scaled = Stats.exactGroupedQuantilesScalable(corpus, "g", "v", ps)
    assert(scaled.columns.toSeq == exact.columns.toSeq, "schema parity")
    assert(canon(scaled) == canon(exact),
      "two-phase quantiles drifted from the percentile reference")
    // and under forced deep narrowing
    val deep = Stats.exactGroupedQuantilesScalable(corpus, "g", "v", ps,
      buckets = 4, cutoff = 2)
    assert(canon(deep) == canon(exact))
  }

  test("exactGroupedRankValues fails fast past maxGroups, naming the sketch path") {
    val e = intercept[IllegalArgumentException] {
      Stats.exactGroupedRankValues(rankCorpus, "g", "v",
        n => Seq(("med", (n + 1) / 2)), maxGroups = 3)
    }
    assert(e.getMessage.contains("approxGroupedQuantiles"),
      s"overflow error must name the unbounded-key alternative: ${e.getMessage}")
    // at the boundary (4 named groups + the null group = 5) it still runs
    assert(Stats.exactGroupedRankValues(rankCorpus, "g", "v",
      n => Seq(("med", (n + 1) / 2)), maxGroups = 5).count() == 5)
  }

  test("two-phase result plan: no Window, no global sort, bounded aggregates") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val out = Stats.exactGroupedRankValues(rankCorpus, "g", "v",
      n => Seq(("med", (n + 1) / 2)))
    val wins = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty, "the targeted-select phase must not use a window")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"global sort crept into the rank select:\n$plan")
  }

  test("winsorize clips each group to its own band, interior untouched") {
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i * 1000.0))).toDF("g", "v")
    val out = Stats.winsorize(df, "g", "v", 0.05, 0.95)
    val a = out.filter(col("g") === "a").select("clipped")
      .collect().map(_.getDouble(0))
    // R-7 on 1..100: p05 = 5.95, p95 = 95.05
    assert(a.min == 5.95 && a.max == 95.05)
    // interior values (6..95) pass through untouched
    assert(a.count(v => v > 5.95 && v < 95.05) == 90)
    // group b is clipped against ITS band, not a's: R-7 on 1k..10k
    val b = out.filter(col("g") === "b").select("clipped")
      .collect().map(_.getDouble(0))
    assert(b.min == 1450.0 && b.max == 9550.0)
    // no row leaves its group band
    assert(out.filter(col("clipped") < 5.95 && col("g") === "a").isEmpty)
  }

  test("histogram buckets are exact width multiples with sparse gaps") {
    val df = Seq(("a", 0.0), ("a", 9.99), ("a", 10.0), ("a", 35.0),
      ("b", -0.5)).toDF("g", "v")
    val out = Stats.histogram(df, "g", "v", 10.0)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(out(("a", 0.0)) == 2)   // 0.0 and 9.99
    assert(out(("a", 10.0)) == 1)  // boundary value starts the next bucket
    assert(out(("a", 30.0)) == 1)  // gap: no 20.0 bucket emitted
    assert(out(("b", -10.0)) == 1) // floor semantics for negatives
    assert(!out.contains(("a", 20.0)))
  }

  test("sketchAccuracy: exact values exact, sketches within tolerance") {
    // two groups with very different cardinalities and value ranges
    val df = ((1 to 20000).map(i => ("big", (i % 4831).toLong, i * 0.5)) ++
      (1 to 200).map(i => ("small", (i % 7).toLong, i * 100.0)))
      .toDF("g", "u", "v")
    val out = Stats.sketchAccuracy(df, "g", "u", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out("big")._1 == 4831L && out("small")._1 == 7L)
    // the flags are the oracle surface — they must hold at any scale
    assert(out.values.forall(t => t._2 && t._3),
      s"sketch outside tolerance: $out")
  }

  test("topKPerGroup equals the per-group sorted take; small groups keep all") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (i.toLong, s"g${i % 5}", (i * 37 % 101).toDouble)) ++
      Seq((900L, "tiny", 1.0), (901L, "tiny", 2.0))
    val df = rows.toDF("id", "grp", "v")
    val got = Stats.topKPerGroup(df, "grp", 3,
        Seq(col("v").desc, col("id")))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    val want = rows.groupBy(_._2).flatMap { case (g, rs) =>
      rs.sortBy(t => (-t._3, t._1)).take(3).zipWithIndex
        .map { case ((id, _, _), i) => (g, id, (i + 1).toLong) }
    }.toSet
    assert(got == want)
    assert(got.count(_._1 == "tiny") == 2, "k past group size keeps the whole group")
  }

  test("skewAudit surfaces the hot key with exact ppm shares and " +
       "consistent bucket bookkeeping") {
    import spark.implicits._
    val rows = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(40)("c")
    val out = Stats.skewAudit(rows.toDF("k"), "k", parts = 4, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    val hot = out.head
    assert(hot.getLong(0) == 1L && hot.getLong(2) == 100L)
    assert(hot.getLong(3) == 500000L) // 100 of 200 rows = half the corpus
    out.foreach { r =>
      // a key's rows are inside its bucket's rows, and hot_fraction is
      // the exact floor-div ratio of the two
      assert(r.getLong(5) >= r.getLong(2))
      assert(r.getLong(8) == r.getLong(2) * 1000000L / r.getLong(5))
      assert(r.getLong(4) >= 0L && r.getLong(4) < 4L)
    }
  }

  test("skewAudit with k covering every key accounts for the whole " +
       "corpus and is repartition-stable") {
    import spark.implicits._
    val df = (1 to 64).flatMap(i => Seq.fill(10)(s"k$i")).toDF("k")
    val out = Stats.skewAudit(df, "k", parts = 8, k = 64)
      .orderBy("rank").collect()
    assert(out.length == 64)
    assert(out.map(_.getLong(2)).sum == 640L, "every key's rows surface")
    assert(out.map(r => (r.getLong(4), r.getLong(5)))
      .distinct.map(_._2).sum == 640L,
      "distinct buckets partition the corpus rows exactly")
    assert(out.map(r => (r.getLong(4), r.getLong(6)))
      .distinct.map(_._2).sum == 64L,
      "distinct buckets partition the key set exactly")
    val re = Stats.skewAudit(df.repartition(7), "k", parts = 8, k = 64)
      .orderBy("rank").collect()
    assert(out.map(_.toString).toSeq == re.map(_.toString).toSeq)
  }
}
