package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only adjudication probe for q141's rep bimodality (r15 verdict
  * #3): same backlog, same query, 6 reps against a disk-backed temp
  * checkpoint vs a tmpfs one — if the spread collapses on tmpfs, the
  * slow mode is state-store/checkpoint fsync, not join work. */
object DevQ141 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.withGraftConfs(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val backlog = s"${System.getProperty("java.io.tmpdir")}/dev-q141-backlog"
    if (!new java.io.File(backlog).exists()) {
      Tables.events(spark, dir)
        .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
        .select("event_id", "event_time", "user_id", "event_type", "value")
        .repartition(8)
        .write.mode("overwrite").parquet(backlog)
    }
    var n = 0L
    def rep(tag: String): Double = {
      n += 1
      val t0 = System.nanoTime()
      val out = streaming.EventTimeStreams.runAttributionBacklog(spark,
        backlog, "event_time", horizon = "4 hours",
        lateness = "600 days", filesPerBatch = 8,
        queryName = s"devq141_${tag}_$n")
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    rep("warm")
    Seq("disk" -> System.getProperty("java.io.tmpdir"),
        "shm" -> "/dev/shm/dev-q141-ckpt").foreach { case (tag, loc) =>
      new java.io.File(loc).mkdirs()
      spark.conf.set("spark.sql.streaming.checkpointLocation", "")
      if (tag == "shm")
        spark.conf.set("spark.sql.streaming.checkpointLocation", loc)
      else spark.conf.unset("spark.sql.streaming.checkpointLocation")
      val ts = (1 to 6).map(_ => rep(tag))
      println(f"[devq141] $tag reps=${ts.map(t => f"$t%.2f").mkString(",")} " +
        f"median=${ts.sorted.apply(3)}%.2f spread=${ts.max - ts.min}%.2f")
    }
    spark.stop()
  }
}
