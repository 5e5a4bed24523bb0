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
}
