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
}
