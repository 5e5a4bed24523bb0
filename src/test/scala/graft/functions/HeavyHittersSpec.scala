package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def mgItems(df: org.apache.spark.sql.DataFrame, k: Int) = {
    HeavyHittersFunctions.register(spark)
    df.groupBy("g")
      .agg(HeavyHittersFunctions.heavyHitters(col("item"), k).as("hh"))
      .select(col("g"), col("hh"))
      .collect()
      .map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => s.getString(0) -> s.getLong(1))
      }.toMap
  }

  test("MG guarantee: every item above n/k survives, across partitionings") {
    // planted heavies: "hot" 30%, "warm" 12%; tail of 500 distinct items
    val rows = (1 to 5000).map { i =>
      val item =
        if (i % 10 < 3) "hot"
        else if (i % 100 < 12) "warm"
        else s"tail${i % 500}"
      ("g1", item)
    }
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("g", "item").repartition(parts)
      val got = mgItems(df, k = 8)("g1").toMap
      // freq("hot") = 0.3 > 1/8, freq("warm") ≈ 0.084 — only "hot" is
      // guaranteed; assert the guarantee, tolerate extras
      assert(got.contains("hot"),
        s"item above n/k missing at parts=$parts: $got")
      // count error bound: est <= true, true - est <= n/k
      val trueHot = rows.count(_._2 == "hot").toLong
      val est = got("hot")
      assert(est <= trueHot && trueHot - est <= 5000 / 8,
        s"estimate $est outside [true - n/k, true] = [${trueHot - 625}, $trueHot]")
    }
  }

  test("small exact case: under-capacity groups count exactly") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "item")
    val got = mgItems(df, k = 10)
    // capacity 9 ≥ distinct items: MG degenerates to exact counting
    assert(got("a").toMap == Map("x" -> 2L, "y" -> 1L))
    assert(got("b").toMap == Map("z" -> 1L))
    // deterministic order: est desc, item asc
    assert(got("a").map(_._1) == Seq("x", "y"))
  }

  test("heavyTokens audit: exact heavy set complete, mg_found all true") {
    val docs = Seq(
      (1L, "spark spark spark join scan", "s1"),
      (2L, "spark filter join spark agg", "s1"),
      (3L, "alpha beta gamma delta epsilon", "s2"),
      (4L, "alpha zeta eta theta iota", "s2"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.TextOps
      .heavyTokens(docs, "source", "text", k = 10, reportFrac = 4)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    // s1: 10 tokens, threshold > 2.5 → spark (3+2 = 5 hits); s2: alpha
    // has 2 hits, not above 2.5 → absent
    assert(out.toSeq == Seq(("s1", "spark", 5L, true)))
  }

  test("reportFrac above k is rejected (guarantee would be void)") {
    val docs = Seq((1L, "a b", "s")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException] {
      graft.operators.TextOps.heavyTokens(docs, "source", "text",
        k = 10, reportFrac = 20)
    }
  }
}
