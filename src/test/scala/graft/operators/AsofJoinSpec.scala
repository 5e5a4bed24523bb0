package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    (1L, 100L, 10L, "f1"), // key 100 at t=10
    (2L, 100L, 25L, "f2"),
    (3L, 100L, 5L, "f3"),  // before any dim row → null match
    (4L, 200L, 50L, "f4"),
    (5L, 300L, 50L, "f5")  // key with no dim rows at all
  ).toDF("fid", "k", "t", "payload")

  private def dim = Seq(
    (100L, 10L, "v1"), // equal time → matches (≤ semantics)
    (100L, 20L, "v2"),
    (200L, 40L, "v3")
  ).toDF("k", "dt", "dval")

  test("asofJoin picks the latest dim row at-or-before each fact time") {
    val out = Joins.asofJoin(fact, dim, "k", "t", "dt", Seq("dval", "dt"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) null else r.getString(4))).toMap
    assert(out == Map(
      1L -> "v1", // t=10 matches dt=10 (≤)
      2L -> "v2", // t=25 matches dt=20
      3L -> null, // t=5 precedes all dim rows
      4L -> "v3",
      5L -> null  // key never in dim
    ))
  }

  test("asofJoin preserves all fact rows and columns (left-join shape)") {
    val out = Joins.asofJoin(fact, dim, "k", "t", "dt", Seq("dval", "dt"))
    assert(out.count() == fact.count())
    assert(out.columns.toSeq == Seq("fid", "k", "t", "payload", "dval", "dt"))
  }

  test("asofJoinBucketed ≡ asofJoin on the base fixture, all widths") {
    for (w <- Seq(1L, 7L, 100L, 1000L)) {
      val plain = Joins.asofJoin(fact, dim, "k", "t", "dt", Seq("dval", "dt"))
        .collect().map(_.toSeq).toSet
      val bucketed = Joins.asofJoinBucketed(
        fact, dim, "k", "t", "dt", Seq("dval", "dt"), w)
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain, s"bucketWidth=$w diverged")
    }
  }

  test("asofJoinBucketed ≡ asofJoin on a hot-key skewed fixture") {
    // one key carries 95% of the rows — the shape the bucket guard
    // exists for. Deterministic congruential series, dim times
    // deliberately sparse so most fact buckets need a carry-in.
    val hotFacts = (1L to 2000L).map(i =>
      (i, if (i % 20 == 0) 7L + i % 3 else 42L, (i * 37) % 911, s"p$i"))
    val facts = hotFacts.toDF("fid", "k", "t", "payload")
    val dims = ((1L to 40L).map(i => (42L, i * 23 % 907, s"v$i")) ++
      Seq((7L, 3L, "a"), (8L, 100L, "b"), (9L, 5L, "c")))
      .toDF("k", "dt", "dval")
      // contract: dim unique per (key, time)
      .groupBy("k", "dt").agg(org.apache.spark.sql.functions.min("dval").as("dval"))
    val plain = Joins.asofJoin(facts, dims, "k", "t", "dt", Seq("dval", "dt"))
      .collect().map(_.toSeq).toSet
    for (w <- Seq(1L, 13L, 64L, 1000L)) {
      val bucketed = Joins.asofJoinBucketed(
        facts, dims, "k", "t", "dt", Seq("dval", "dt"), w)
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain, s"bucketWidth=$w diverged on skewed data")
    }
  }

  test("asofJoinBucketed ≡ asofJoin on seeded random data, odd widths") {
    val rnd = new scala.util.Random(0xA50F)
    val facts = (1 to 5000).map { i =>
      (i.toLong, (rnd.nextInt(40) + 1).toLong, rnd.nextLong(1000000L), s"f$i")
    }.toDF("fid", "k", "t", "payload")
    val dims = (1 to 2000).map { i =>
      ((rnd.nextInt(40) + 1).toLong, rnd.nextLong(1000000L), s"d$i")
    }.toDF("k", "dt", "dval")
      .groupBy("k", "dt")
      .agg(org.apache.spark.sql.functions.min("dval").as("dval"))
    val plain = Joins.asofJoin(facts, dims, "k", "t", "dt", Seq("dval", "dt"))
      .collect().map(_.toSeq).toSet
    for (w <- Seq(1L, 997L, 32768L, 1000003L)) {
      val bucketed = Joins.asofJoinBucketed(
        facts, dims, "k", "t", "dt", Seq("dval", "dt"), w)
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain, s"random-data divergence at width=$w")
    }
  }

  test("asofJoinBucketed partitions the window by (key, bucket)") {
    val plan = Joins.asofJoinBucketed(
      fact, dim, "k", "t", "dt", Seq("dval"), 10L)
      .queryExecution.executedPlan.toString
    // the final window's partition spec must include the bucket column —
    // that IS the skew guard; key-only partitioning would regress it
    assert(plan.contains("__b"), "bucket column missing from physical plan")
    // two windows exist: the inner carry-resolution one (key-only, over
    // metadata-scale bucket summaries — fine) and the outer row-level
    // one, which MUST partition by (key, bucket): that is the skew guard
    val windowLines = plan.linesIterator.filter(l =>
      l.contains("Window") && l.contains("__matched")).toSeq
    assert(windowLines.exists(l =>
        l.contains("partitionBy") || // plan-format drift guard
          l.matches(""".*windowspecdefinition\(__k#\d+L?, __b#\d+L?,.*""")),
      s"no window partitioned by (key, bucket):\n${windowLines.mkString("\n")}")
  }
}
