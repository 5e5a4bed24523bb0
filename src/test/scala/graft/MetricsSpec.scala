package graft

import java.nio.file.Files

import graft.operators.TableStore

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("schema-evolving read unions appended columns, old rows null-filled") {
    val root = Files.createTempDirectory("graft-evolve").toString
    val store = TableStore(spark, root)
    store.replace("source", "t", Seq((1L, "a")).toDF("id", "name"))
    store.append("source", "t",
      Seq((2L, "b", 9.5)).toDF("id", "name", "score"))
    val merged = store.readMerged("source", "t")
    assert(merged.columns.toSet == Set("id", "name", "score"))
    val byId = merged.collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("score"))) None
         else Some(r.getAs[Double]("score")))).toMap
    assert(byId(1L).isEmpty && byId(2L).contains(9.5))
  }

  test("RowCountListener observes write row counts without extra passes") {
    val listener = Metrics.attach(spark)
    val out = Files.createTempDirectory("graft-metrics").toString
    val df = spark.range(123).toDF("id")
    df.write.mode("overwrite").parquet(s"$out/t")
    // listener callbacks fire asynchronously; poll for delivery
    val deadline = System.currentTimeMillis() + 10000
    while (!listener.lastCounts.values.exists(_ == 123L) &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(listener.lastCounts.values.exists(_ == 123L),
      s"counts seen: ${listener.lastCounts}")
  }
}
