package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("maxWatermark returns None on empty input, Some(max) otherwise") {
    val empty = Seq.empty[(Long, String)].toDF("v", "p")
    assert(Incremental.maxWatermark(empty, "v").isEmpty)
    val df = Seq((1L, "a"), (7L, "b")).toDF("v", "p")
    assert(Incremental.maxWatermark(df, "v").contains(7L))
  }

  test("newerThan with no watermark passes everything through") {
    val df = Seq((1L, "a"), (7L, "b")).toDF("v", "p")
    assert(Incremental.newerThan(df, "v", None).count() == 2)
    assert(Incremental.newerThan(df, "v", Some(1L)).count() == 1)
  }

  /** The reference's core correctness claim, stated as a law
    * (SURVEY.md §5.3): replaying increments through the watermark+append+
    * dedup loop converges to the same table as one full refresh. */
  test("incremental replay ≡ full refresh (the create-DAG/update-DAG law)") {
    val root = Files.createTempDirectory("graft-inc").toString
    val store = TableStore(spark, root)
    // version-stamped stream with duplicate keys across batches
    val all = (1 to 200).map { v =>
      (v.toLong, s"k${v % 17}", s"t${v % 5}", s"payload$v")
    }
    val keys = Seq("k", "t")
    val ordering = Seq(col("v"))

    // full refresh: one-shot keep-last
    val full = Dedup.keepLast(
      all.toDF("v", "k", "t", "p"), keys, ordering)

    // replay in 7 uneven batches, some overlapping (late duplicates)
    val batches = Seq(1 to 40, 30 to 90, 80 to 120, 121 to 121,
      122 to 170, 150 to 199, 200 to 200)
    var last = full.limit(0)
    batches.foreach { range =>
      val b = range.map { v =>
        (v.toLong, s"k${v % 17}", s"t${v % 5}", s"payload$v")
      }.toDF("v", "k", "t", "p")
      last = store.incrementalUpsert("prod", "events", b, "v", keys, ordering)
    }
    assert(last.collect().toSet == full.collect().toSet)
  }
}
