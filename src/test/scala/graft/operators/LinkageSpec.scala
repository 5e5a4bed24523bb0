package graft.operators

import graft.SparkSpec

/** Laws for [[Linkage.blockedFuzzyPairs]] — blocking, the
  * deterministic cap, normalization, and the distance itself (checked
  * against an independent DP implementation). */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)],
                    blockPrefix: Int = 4, comparePrefix: Int = 32,
                    maxDist: Int = 10, maxBlockSize: Int = 64) =
    Linkage.blockedFuzzyPairs(rows.toDF("id", "text"), "id", "text",
        blockPrefix, comparePrefix, maxDist, maxBlockSize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("near-identical docs pair with the exact DP distance") {
    val a = "alpha beta gamma delta epsilon"
    val b = "alpha beta gamma delta epsilXn"
    val got = pairs(Seq((1L, a), (2L, b)))
    assert(got == Set((1L, 2L, lev(a.take(32), b.take(32)).toLong)))
  }

  test("normalization: case and whitespace runs do not count as edits") {
    val got = pairs(Seq((1L, "Alpha  Beta\tGamma"), (2L, "alpha beta gamma")))
    assert(got == Set((1L, 2L, 0L)))
  }

  test("different block prefixes never pair, however close the rest") {
    // differ in char 1 → different 4-char blocks; identical afterwards
    val got = pairs(Seq((1L, "aXXX common tail"), (2L, "bXXX common tail")))
    assert(got.isEmpty)
  }

  test("pairs past maxDist are cut by the threshold'd DP") {
    val a = "same same completely different tail A B C D E"
    val b = "same same nothing alike whatsoever Z Y X W V U"
    assert(pairs(Seq((1L, a), (2L, b)), maxDist = 3).isEmpty)
    val wide = pairs(Seq((1L, a), (2L, b)), maxDist = 32)
    assert(wide.size == 1 && wide.head._3 == lev(a.take(32), b.take(32)).toLong)
  }

  test("a degenerate block is capped to the smallest ids") {
    // 6 identical docs, cap 3 → only the 3 smallest ids survive →
    // C(3,2)=3 pairs, never C(6,2)=15
    val rows = (1L to 6L).map(i => (i, "identical document text"))
    val got = pairs(rows, maxBlockSize = 3)
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }

  test("deterministic under repartitioning") {
    val rows = (1L to 40L).map(i =>
      (i, s"prefix block ${i % 5} payload word${i % 7} tail"))
    val df = rows.toDF("id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Linkage.blockedFuzzyPairs(d, "id", "text", 4, 32, 10, 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(df) == run(df.repartition(7)))
  }
}
