package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // a two-key change log: key "a" flips states with a consecutive
  // repeat in the middle; key "b" never changes
  private def log = Seq(
    (1L, "a", 10L, "red"),
    (2L, "a", 20L, "red"), // consecutive repeat — must collapse
    (3L, "a", 30L, "blue"),
    (4L, "a", 40L, "red"), // back to red — NEW version, not merged
    (5L, "b", 10L, "green"),
    (6L, "b", 50L, "green")
  ).toDF("id", "k", "t", "state")

  private def history = Cdc.scd2(log, Seq("k"), "t", Seq(col("id")), Seq("state"))

  test("scd2 collapses consecutive repeats but reopens on a revisit") {
    val a = history.filter($"k" === "a")
      .select("version", "state", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().sortBy(_._1)
    assert(a.toSeq == Seq(
      (1L, "red", 10L, Some(30L)),
      (2L, "blue", 30L, Some(40L)),
      (3L, "red", 40L, None)))
  }

  test("scd2 effective ranges tile the timeline: valid_to = next valid_from, one current per key") {
    val rows = history.select("k", "version", "valid_from", "valid_to", "is_current")
      .as[(String, Long, Long, Option[Long], Boolean)].collect()
    rows.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(prev, next) => assert(prev._4.contains(next._3))
        case _ =>
      }
      assert(sorted.count(_._5) == 1 && sorted.last._5,
        "exactly the last version must be current")
    }
  }

  test("scd2 change detection is null-safe (null state is a state, not a wildcard)") {
    val withNulls = Seq(
      (1L, "k", 10L, Option("x")),
      (2L, "k", 20L, Option.empty[String]), // x -> null: a change
      (3L, "k", 30L, Option.empty[String]), // null -> null: collapse
      (4L, "k", 40L, Option("x"))           // null -> x: a change
    ).toDF("id", "k", "t", "state")
    val h = Cdc.scd2(withNulls, Seq("k"), "t", Seq(col("id")), Seq("state"))
      .select("version", "state").as[(Long, Option[String])].collect().sortBy(_._1)
    assert(h.toSeq == Seq((1L, Some("x")), (2L, None), (3L, Some("x"))))
  }

  private def oldSnap = Seq(
    (1L, "stays", 1.0),
    (2L, "changes", 2.0),
    (3L, "goes", 3.0)
  ).toDF("k", "tag", "v")

  private def newSnap = Seq(
    (1L, "stays", 1.0),
    (2L, "changes", 2.5),
    (4L, "arrives", 4.0)
  ).toDF("k", "tag", "v")

  test("snapshotDiff classifies inserted / deleted / changed / unchanged") {
    val out = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("tag", "v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "deleted", 4L -> "inserted"))
  }

  test("snapshotDiff carries old and new values on every present side") {
    val changed = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("tag", "v"))
      .filter($"status" === "changed")
      .select("old_v", "new_v").as[(Double, Double)].head()
    assert(changed == ((2.0, 2.5)))
    val inserted = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("tag", "v"))
      .filter($"status" === "inserted")
      .select("old_v", "new_v").as[(Option[Double], Option[Double])].head()
    assert(inserted == ((None, Some(4.0))))
  }

  test("snapshotDiff compare is null-safe per column") {
    val o = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("k", "tag")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "tag")
    val out = Cdc.snapshotDiff(o, n, Seq("k"), Seq("tag"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed"))
  }
}
