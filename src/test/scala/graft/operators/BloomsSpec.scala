package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "payload")
  private lazy val probe = (1L to 5000L by 50).map(i => i).toDF("pk") // 100 keys

  test("bloomPrefilter never loses a matching row (no false negatives)") {
    val kept = Blooms.bloomPrefilter(big, probe, "k", "pk", expectedItems = 128)
      .select("k").as[Long].collect().toSet
    val matches = (1L to 5000L by 50).toSet
    assert(matches.subsetOf(kept),
      s"bloom dropped real matches: ${(matches -- kept).take(5)}")
  }

  test("bloomPrefilter actually prunes (false-positive rate bounded)") {
    val kept = Blooms.bloomPrefilter(big, probe, "k", "pk", expectedItems = 128)
      .count()
    // 100 true matches out of 5000; allow a generous FP margin — the
    // default sizing targets ~3% FPP, assert well under half survive
    assert(kept < 2500, s"bloom pruned nothing: $kept of 5000 rows survive")
  }

  test("bloomSemiJoin equals the plain left-semi join") {
    val plain = big.join(probe, big("k") === probe("pk"), "left_semi")
      .select("k", "payload").collect().toSet
    val bloomed = Blooms.bloomSemiJoin(big, probe, "k", "pk", 128)
      .select("k", "payload").collect().toSet
    assert(bloomed == plain && plain.size == 100)
  }

  test("the bloom is an in-plan scalar subquery, not a driver collect") {
    val df = Blooms.bloomPrefilter(big, probe, "k", "pk", 128)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("scalar-subquery"),
      s"bloom should enter the plan as a scalar subquery:\n$analyzed")
  }
}
