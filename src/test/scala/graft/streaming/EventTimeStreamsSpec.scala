package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventTimeStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  case class Ev(event_time: Timestamp, event_type: String, value: Double, key: Long)
  case class E(user_id: Long, event_time: Timestamp)
  case class Raw(event_id: Long, user_id: Long, event_time: Timestamp,
                 value: Double)

  test("tumbling 15-minute windows aggregate by event time across batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventTimeStreams.tumblingCounts(in.toDF(), "event_time",
      lateness = "10 minutes", windowLen = "15 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(Ev(ts(1), "a", 1.0, 1), Ev(ts(14), "a", 2.0, 2), Ev(ts(16), "a", 4.0, 3))
      q.processAllAvailable()
      in.addData(Ev(ts(5), "a", 8.0, 4)) // late but within watermark → same window
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .groupBy("window_start", "event_type")
        .max("n_events", "sum_value")
        .collect().map(r => r.getTimestamp(0).toString.take(16) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(rows("2024-01-01 10:00") == (3L, 11.0)) // 1+2+8 in [10:00,10:15)
      assert(rows("2024-01-01 10:15") == (1L, 4.0))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses dupes inside the horizon") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventTimeStreams.dedupWithinWatermark(in.toDF(), "event_time",
      keys = Seq("key"), lateness = "30 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Ev(ts(1), "a", 1.0, 42), Ev(ts(2), "a", 9.0, 42))
      q.processAllAvailable()
      in.addData(Ev(ts(3), "a", 5.0, 42), Ev(ts(4), "b", 7.0, 7))
      q.processAllAvailable()
      val keys = spark.table("dedup_stream").select("key")
        .collect().map(_.getLong(0)).toSeq
      assert(keys.count(_ == 42L) == 1) // all 42-dupes within horizon suppressed
      assert(keys.count(_ == 7L) == 1)
    } finally q.stop()
  }

  test("streaming sessionize ≡ batch q33 on the events fixture (law)") {
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val gapUs = 3600L * 1000000L
    // batch truth: (user, start_us, end_us, n_events) from the q33 shape
    val batch = graft.SparkEntry.queries("q33_sessionization")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2)))
      .toSet
    // same fixture through the streaming operator (Complete mode emits
    // every session, including those the watermark hasn't finalized)
    val rows = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "ts DIV 1000 AS ts_us")
      .collect().map { r =>
        val us = r.getLong(1)
        val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
        E(r.getLong(0), t)
      }
    val in = MemoryStream[E]
    val q = EventTimeStreams.sessionize(in.toDF(), "event_time", "user_id",
      gap = "1 hour", lateness = "1 hour")
      .writeStream.format("memory").queryName("sessions_law")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("sessions_law")
        .selectExpr("user_id", "unix_micros(session_start) AS start_us",
          "unix_micros(session_end) AS end_us", "n_events")
        .collect()
        // session_window end = last event + gap; q33 end = last event
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) - gapUs, r.getLong(3)))
        .toSet
      assert(streamed == batch,
        s"batch ${batch.size} sessions vs streamed ${streamed.size}; " +
          s"only-batch=${(batch -- streamed).take(3)} only-stream=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("runTumblingBacklog over a multi-file backlog ≡ one batch aggregate " +
       "(streamed-batch law through the real engine)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val backlog = java.nio.file.Files
      .createTempDirectory("graft-backlog-law").toString
    graft.Tables.events(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .select("event_time", "event_type", "value")
      .repartition(4)
      .write.mode("overwrite").parquet(backlog)
    // one file per micro-batch: the watermark advances between batches
    // and the window state merges partial DECIMAL sums across them
    val streamed = EventTimeStreams.runTumblingBacklog(spark, backlog,
        "event_time", lateness = "10 minutes", windowLen = "15 minutes",
        filesPerBatch = 1, queryName = "backlog_law")
      .select("window_start", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    val batch = spark.read.parquet(backlog)
      .groupBy(window(col("event_time"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} windows vs batch ${batch.size}; " +
        s"only-streamed=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }

  test("attributionJoin boundary semantics: strictly after the view, " +
       "inclusive at view + horizon (MemoryStream)") {
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[Raw]
    val purchases = MemoryStream[Raw]
    val q = EventTimeStreams.attributionJoin(
        views.toDF(), purchases.toDF(), "event_time",
        horizon = "1 hour", lateness = "1 day")
      .writeStream.format("memory").queryName("attr_bounds")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      views.addData(Raw(1, 7, t(10, 0), 0.0))
      purchases.addData(
        Raw(100, 7, t(10, 0), 1.0),  // == view ts: NOT strictly after
        Raw(101, 7, t(10, 1), 2.0),  // inside
        Raw(102, 7, t(11, 0), 3.0),  // == view + horizon: inclusive
        Raw(103, 7, t(11, 1), 4.0),  // past the horizon
        Raw(104, 8, t(10, 1), 5.0))  // other user
      q.processAllAvailable()
      val matched = spark.table("attr_bounds")
        .select("purchase_id").collect().map(_.getLong(0)).toSet
      assert(matched == Set(101L, 102L),
        s"expected {101, 102}, got $matched")
    } finally q.stop()
  }

  test("runAttributionBacklog ≡ batch interval self-join, invariant to " +
       "micro-batch boundaries (streamed-batch law through the real engine)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val backlog = java.nio.file.Files
      .createTempDirectory("graft-attr-law").toString
    graft.Tables.events(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .select("event_id", "event_time", "user_id", "event_type", "value")
      .repartition(4)
      .write.mode("overwrite").parquet(backlog)
    def streamedRun(filesPerBatch: Int, name: String): Set[(Long, Long)] =
      EventTimeStreams.runAttributionBacklog(spark, backlog, "event_time",
          horizon = "4 hours", lateness = "600 days",
          filesPerBatch = filesPerBatch, queryName = name)
        .select("view_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val onePerBatch = streamedRun(1, "attr_law_1")
    val threePerBatch = streamedRun(3, "attr_law_3")
    val ev = spark.read.parquet(backlog)
    val batch = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("event_time").as("view_ts"))
      .join(ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user_id"),
            col("event_time").as("purchase_ts")),
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 4 hours"))
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture produced no attribution pairs")
    assert(onePerBatch == batch,
      s"streamed ${onePerBatch.size} pairs vs batch ${batch.size}; " +
        s"only-streamed=${(onePerBatch -- batch).take(3)} " +
        s"only-batch=${(batch -- onePerBatch).take(3)}")
    assert(threePerBatch == batch,
      "micro-batch boundary changed the appended result")
  }

  test("tight-lateness join state plateaus on an in-order backlog while " +
       "the wide-lateness shape grows, with identical appended output") {
    // the q141 production claim, measured through the engine's own
    // StreamingQueryProgress: the interval condition doubles as the
    // retention policy, so under tight lateness a buffered row dies
    // once the other side's watermark passes its match window — state
    // is O(horizon × rate) however long the stream — while the
    // certification shape (lateness ≥ span) never evicts. In-order
    // delivery (one time-sorted file per replica, ascending mtimes)
    // also pins the strongest corollary: with nothing arriving late,
    // tight lateness drops NOTHING, so both shapes append the same
    // rows and differ only in state.
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .select("event_id", "event_time", "user_id", "event_type", "value")
      .localCheckpoint(eager = true)
    val b = ev.agg(min(unix_micros(col("event_time"))).as("lo"),
      max(unix_micros(col("event_time"))).as("hi"),
      (max("event_id") + 1).as("idoff")).first()
    val gapUs = (b.getLong(1) - b.getLong(0)) + 86400L * 1000000L
    val backlog = java.nio.file.Files
      .createTempDirectory("graft-attr-state").toString + "/backlog"
    val replicas = 4
    (0 until replicas).foreach { r =>
      ev.select((col("event_id") + lit(r * b.getLong(2))).as("event_id"),
          timestamp_micros(unix_micros(col("event_time")) + lit(r * gapUs))
            .as("event_time"),
          col("user_id"), col("event_type"), col("value"))
        .coalesce(1).sortWithinPartitions("event_time")
        .write.mode("append").parquet(backlog)
    }
    def run(name: String, lateness: String) =
      EventTimeStreams.runAttributionBacklogMetered(spark, backlog,
        "event_time", horizon = "4 hours", lateness = lateness,
        filesPerBatch = 1, queryName = s"attr_state_$name")
    val (wideDf, wideMs) = run("wide", "3650 days")
    val (tightDf, tightMs) = run("tight", "30 minutes")
    val wide = wideDf.collect().map(_.toString).sorted.toSeq
    val tight = tightDf.collect().map(_.toString).sorted.toSeq
    assert(wide.nonEmpty, "state law vacuous: no attribution pairs")
    assert(tight == wide,
      "in-order backlog lost rows under tight lateness")
    val wMax = wideMs.map(_.stateRows).max
    val tMax = tightMs.map(_.stateRows).max
    // wide keeps every input row buffered forever (~4 replicas of
    // state at the end); tight holds at most ~one replica's tail
    assert(tMax * 2 < wMax,
      s"tight-lateness state did not plateau: tight max $tMax vs " +
        s"wide max $wMax over ${tightMs.size}/${wideMs.size} batches")
  }

  test("session_window sessionization merges runs and splits on gaps") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    // 5-minute gap: events at :01 :03 :06 are one session (gaps 2, 3);
    // :20 starts a new one. key 2 has a lone event → its own session.
    val q = EventTimeStreams.sessionize(in.toDF(), "event_time", "key",
      gap = "5 minutes", lateness = "10 minutes", sumCol = Some("value"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Ev(ts(1), "a", 1.0, 1), Ev(ts(3), "a", 2.0, 1), Ev(ts(6), "a", 4.0, 1),
        Ev(ts(20), "a", 8.0, 1), Ev(ts(2), "a", 16.0, 2))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(16)) ->
          (r.getLong(3), r.getDouble(4))).toMap
      assert(rows((1L, "2024-01-01 10:01")) == (3L, 7.0))  // merged run
      assert(rows((1L, "2024-01-01 10:20")) == (1L, 8.0))  // after the gap
      assert(rows((2L, "2024-01-01 10:02")) == (1L, 16.0))
      assert(rows.size == 3)
    } finally q.stop()
  }
}
