package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.KeepLastStream.KeyedEvent

class KeepLastStreamSpec extends SparkSpec {
  import spark.implicits._

  test("keepLastUpdates emits the running per-key winner across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = KeepLastStream.keepLastUpdates(input.toDS())
      .writeStream.format("memory").queryName("kl")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(
        KeyedEvent(1, "a", 1, 10.0), KeyedEvent(1, "a", 3, 30.0),
        KeyedEvent(2, "b", 1, 1.0))
      q.processAllAvailable()
      // late/lower version must NOT displace the state
      input.addData(KeyedEvent(1, "a", 2, 20.0), KeyedEvent(2, "b", 5, 5.0))
      q.processAllAvailable()
      val last = spark.table("kl").groupBy("key1", "key2")
        .agg(max_by(struct(col("version"), col("value")), col("version")).as("kept"))
        .select(col("key1"), col("kept.version").as("v"), col("kept.value").as("val"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(last == Set((1L, 3L, 30.0), (2L, 5L, 5.0)))
    } finally q.stop()
  }

  test("run(): availableNow batch over a parquet dir lands deduped appends") {
    val src = Files.createTempDirectory("kl-src").toString
    val dest = Files.createTempDirectory("kl-dest").toString
    val ckpt = Files.createTempDirectory("kl-ckpt").toString
    val batch = Seq(
      (1L, "x", 1L, 1.0), (1L, "x", 2L, 2.0), (2L, "y", 1L, 9.0)
    ).toDF("key1", "key2", "version", "value")
    batch.write.mode("overwrite").parquet(src)
    KeepLastStream.run(spark, src, dest, ckpt,
      keys = Seq("key1", "key2"), versionCol = "version", schema = batch.schema)
    val out = spark.read.parquet(dest)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out == Set((1L, 2L), (2L, 1L))) // keep-last per key within the batch
  }
}
