package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def row(v: Long, k: String, jd: String, x: Double) = (v, k, jd, x)

  test("partition-pruned upsert only rewrites touched partitions") {
    val root = Files.createTempDirectory("graft-part").toString
    val store = TableStore(spark, root)
    val keys = Seq("k")
    val ord = Seq(col("v"))

    val initial = Seq(
      row(1, "a", "1401/01", 1.0), row(2, "b", "1401/01", 2.0),
      row(3, "c", "1401/02", 3.0), row(4, "d", "1401/03", 4.0)
    ).toDF("v", "k", "j_month", "x")
    store.incrementalUpsertPartitioned("prod", "t", initial, "v", keys, ord, "j_month")

    val tablePath = s"$root/prod/t"
    def partFile(p: String) =
      Option(new java.io.File(s"$tablePath/j_month=$p").listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet")).head
    val untouchedBefore = partFile("1401%2F03").lastModified()
    Thread.sleep(1100)

    // batch touches only 1401/01 (update k=a) and 1401/02 (new key)
    val batch = Seq(
      row(10, "a", "1401/01", 10.0), row(11, "e", "1401/02", 11.0)
    ).toDF("v", "k", "j_month", "x")
    store.incrementalUpsertPartitioned("prod", "t", batch, "v", keys, ord, "j_month")

    val out = store.read("prod", "t")
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 10L, "b" -> 2L, "c" -> 3L, "d" -> 4L, "e" -> 11L))

    // the untouched partition's file was not rewritten
    assert(partFile("1401%2F03").lastModified() == untouchedBefore,
      "untouched partition was rewritten")
  }

  test("partitioned upsert result equals global keep-last dedup") {
    val root = Files.createTempDirectory("graft-part2").toString
    val store = TableStore(spark, root)
    val rnd = new scala.util.Random(5)
    val all = (1 to 150).map { v =>
      (v.toLong, s"k${rnd.nextInt(12)}", s"1401/0${1 + rnd.nextInt(3)}", rnd.nextDouble())
    }
    val keys = Seq("k", "j_month") // dedupe within partition keys
    val ord = Seq(col("v"))
    val full = Dedup.keepLast(all.toDF("v", "k", "j_month", "x"), keys, ord)
    Seq(all.slice(0, 60), all.slice(40, 110), all.slice(100, 150)).foreach { b =>
      store.incrementalUpsertPartitioned("prod", "t2",
        b.toDF("v", "k", "j_month", "x"), "v", keys, ord, "j_month")
    }
    assert(store.read("prod", "t2").select("v", "k", "j_month").collect().toSet ==
      full.select("v", "k", "j_month").collect().toSet)
  }
}
