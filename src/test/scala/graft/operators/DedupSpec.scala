package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    // (key1, key2, version, payload)
    ("a", "x", 1L, "old"),
    ("a", "x", 3L, "new"),
    ("a", "x", 2L, "mid"),
    ("a", "y", 1L, "only"),
    ("b", "x", 5L, "b1"),
    ("b", "x", 5L, "b2") // tie on version → tiebreak on payload desc
  ).toDF("k1", "k2", "v", "p")

  test("keepLast retains the greatest-version row per key") {
    val out = Dedup.keepLast(sample, Seq("k1", "k2"), Seq(col("v"), col("p")))
      .select("k1", "k2", "p").as[(String, String, String)].collect().toSet
    assert(out == Set(("a", "x", "new"), ("a", "y", "only"), ("b", "x", "b2")))
  }

  test("keepLast tie-break is deterministic via secondary ordering") {
    (1 to 3).foreach { _ =>
      val out = Dedup.keepLast(sample, Seq("k1", "k2"), Seq(col("v"), col("p")))
        .filter($"k1" === "b").select("p").first().getString(0)
      assert(out == "b2")
    }
  }

  test("keepLast is idempotent") {
    val once = Dedup.keepLast(sample, Seq("k1", "k2"), Seq(col("v"), col("p")))
    val twice = Dedup.keepLast(once, Seq("k1", "k2"), Seq(col("v"), col("p")))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("keepLastMaxBy agrees with the window formulation on unique ordering keys") {
    val df = sample.withColumn("ord", struct(col("v"), col("p")))
    val a = Dedup.keepLast(sample, Seq("k1", "k2"), Seq(col("v"), col("p")))
      .select("k1", "k2", "v", "p").collect().toSet
    val b = Dedup.keepLastMaxBy(df, Seq("k1", "k2"), col("ord"))
      .select("k1", "k2", "v", "p").collect().toSet
    assert(a == b)
  }
}
