package graft.operators

import graft.SparkSpec

/** Laws for the funnel/cohort pair. The q107/q108 oracles certify the
  * composition over the events table; these pin the ordering and
  * counting semantics on hand-built streams. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def depth(rows: Seq[(Long, String, Long, Long)],
                    steps: Seq[String]): Map[Long, Int] =
    Events.funnelDepth(
      rows.toDF("user", "etype", "ts", "eid"),
      "user", "etype", "ts", "eid", steps)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private val ABC = Seq("A", "B", "C")

  test("funnelDepth: order matters, not mere presence") {
    val rows = Seq(
      (1L, "A", 1L, 1L), (1L, "B", 2L, 2L), (1L, "C", 3L, 3L), // full
      (2L, "B", 1L, 4L), (2L, "A", 2L, 5L), (2L, "C", 3L, 6L), // B before A
      (3L, "A", 5L, 7L),                                       // A only
      (4L, "B", 1L, 8L))                                       // never A
    // user 2 did all three types but B precedes A: the chain stops at
    // depth 1 — C alone cannot advance a funnel whose step 2 is unmet
    assert(depth(rows, ABC) == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("funnelDepth: a later copy of an early step can re-qualify") {
    // B before A, but a second B AFTER A → depth 2
    val rows = Seq(
      (1L, "B", 1L, 1L), (1L, "A", 2L, 2L), (1L, "B", 3L, 3L))
    assert(depth(rows, ABC) == Map(1L -> 2))
  }

  test("funnelDepth: same-timestamp ties break on the tiebreaker, strictly") {
    // B at the same ts as A: only the copy with the LARGER eid is
    // 'strictly after'
    val after = Seq((1L, "A", 5L, 10L), (1L, "B", 5L, 11L))
    val before = Seq((1L, "A", 5L, 10L), (1L, "B", 5L, 9L))
    assert(depth(after, ABC) == Map(1L -> 2))
    assert(depth(before, ABC) == Map(1L -> 1))
  }

  test("funnelDepth: greedy earliest step-1 is what later steps chain from") {
    // A@1 and A@10; B@5 — chains from the EARLIEST A, so B counts
    val rows = Seq((1L, "A", 1L, 1L), (1L, "A", 10L, 2L), (1L, "B", 5L, 3L))
    assert(depth(rows, ABC) == Map(1L -> 2))
  }

  test("cohortRetention: hand-computed weekly matrix, distinct per period") {
    val rows = Seq(
      (1L, 0L), (1L, 0L), (1L, 1L),           // cohort 0, back in week 1
      (2L, 0L),                               // cohort 0, never back
      (3L, 1L), (3L, 3L), (3L, 3L), (3L, 3L)) // cohort 1, back in week 3
      .toDF("user", "week")
    val got = Events.cohortRetention(rows, "user", "week")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (0L, 0L, 2L),  // users 1 and 2 in their own week
      (0L, 1L, 1L),  // user 1 returns (dup rows count once)
      (1L, 0L, 1L),
      (1L, 2L, 1L))) // user 3 returns two weeks later
  }

  test("funnel and cohort are deterministic under repartitioning") {
    val rows = (1L to 200L).map(i =>
      (i % 20, if (i % 3 == 0) "A" else if (i % 3 == 1) "B" else "C",
        i, i))
    val df = rows.toDF("user", "etype", "ts", "eid")
    def run(d: org.apache.spark.sql.DataFrame) =
      Events.funnelDepth(d, "user", "etype", "ts", "eid", ABC)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(run(df) == run(df.repartition(7)))
  }
}
