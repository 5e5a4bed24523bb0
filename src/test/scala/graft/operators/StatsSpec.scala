package graft.operators

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
}
