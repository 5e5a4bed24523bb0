package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Idiomatic event-time streaming (SURVEY.md §2.9 "idiomatic level").
  *
  * The reference approximates streaming with a 15-minute cron + full
  * dedup rewrite; Structured Streaming expresses the same cadence as
  * event-time tumbling windows with a lateness bound, and the duplicate
  * repair as state-store dedup — O(state) per batch instead of O(table).
  *
  * These are `DataFrame => DataFrame` so the same code runs on
  * `readStream` inputs (tests drive them with MemoryStream) and,
  * degenerately, on batch frames.
  */
object EventTimeStreams {

  /** Tumbling event-time aggregation with a watermark: one row per
    * (window, event_type) with count + sum. `lateness` bounds how long
    * out-of-order events are accepted (the reference has no bound — its
    * "late" data simply wins the next full dedup; the watermark is what
    * makes bounded state possible on an unbounded stream). */
  def tumblingCounts(events: DataFrame, tsCol: String, lateness: String,
                     windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      // decimal-summed (q07/q25 money discipline): the streaming state
      // merges partial sums in micro-batch arrival order — a double
      // sum would expose that order in the last ulp, a decimal sum is
      // order-exact, so streamed ≡ batch holds bit-for-bit (q93's law)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming dedup within the watermark horizon: exactly-once per key
    * for any duplicate arriving within `lateness` of the original —
    * the streaming form of the reference's per-batch duplicate repair. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keys: Seq[String], lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Drive [[tumblingCounts]] through the REAL streaming engine over a
    * parquet backlog directory: `readStream` file source →
    * watermarked stateful aggregation → `Trigger.AvailableNow`, which
    * walks the backlog in bounded micro-batches (`filesPerBatch` at a
    * time) and stops — the batch-backfill shape of the production
    * query, state-store checkpointing, watermark advancement between
    * batches and all. This is what lets the driver oracle certify the
    * streaming engine itself (q93): every other streaming surface here
    * is MemoryStream-specced because a forever-running query has no
    * final answer to hash, but an AvailableNow run TERMINATES, and in
    * Complete output its final table is exactly the batch aggregate
    * over the whole backlog — whatever micro-batch boundaries the file
    * listing produced (the decimal-sum discipline in tumblingCounts is
    * what makes that equality bit-exact, not just approximate).
    *
    * Complete mode + a memory sink is the CERTIFICATION harness, not
    * the production deployment: state is one row per (window,
    * event_type) — bounded by the time span, not the data — and the
    * memory sink holds only that same aggregate. A production run
    * swaps the sink for parquet/Kafka in Append mode (emit-on-
    * watermark, the semantics EventTimeStreamsSpec pins with
    * MemoryStream) and drops AvailableNow for a continuous trigger;
    * the aggregation plan — the part that matters at 100 TB — is
    * IDENTICAL in both shapes. */
  def runTumblingBacklog(s: SparkSession, backlogDir: String,
                         tsCol: String, lateness: String, windowLen: String,
                         filesPerBatch: Int, queryName: String): DataFrame = {
    val schema = s.read.parquet(backlogDir).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerBatch)
      .parquet(backlogDir)
    val q = tumblingCounts(src, tsCol, lateness, windowLen)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      // explicit scratch checkpoint (callers pass a fresh queryName per
      // run): the default temp dir lives on /tmp, whose fsync stalls
      // made every stateful backlog replay bimodal (q141 bisection)
      .option("checkpointLocation",
        graft.Engine.streamCheckpointDir(queryName))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(queryName)
  }

  /** Stream-stream event-time interval join (view→purchase
    * attribution): each purchase pairs with every earlier view by the
    * same user within `horizon` — strictly after the view, at most
    * `horizon` later. The reference's cron shape can only express this
    * as a periodic full self-join of the events table; Structured
    * Streaming holds BOTH sides as watermark-bounded state and emits a
    * match the micro-batch its second half arrives, so steady-state
    * cost is O(new events × matched state), never O(table²).
    *
    * The time-range predicate is what makes the state bounded: with
    * watermarks on both inputs Spark derives that a buffered view is
    * dead once the purchase-side watermark passes `view_ts + horizon`
    * (and a buffered purchase once the view-side watermark passes its
    * own ts) and evicts it — the join condition doubles as the state
    * retention policy. Inner join ⇒ Append output; every match is
    * emitted exactly once.
    *
    * Inputs must each carry an `event_id`, `user_id`, `tsCol` and
    * `value`; output columns are renamed to the view_/purchase_ sides
    * so the joined row is self-describing (and hashable by the driver
    * oracle against the batch interval join, which is the law: over a
    * finite backlog with lateness covering its span, streamed ≡ batch
    * exactly — same discipline as [[tumblingCounts]]/q93). */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
                      tsCol: String, horizon: String,
                      lateness: String): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id"),
        col(tsCol).as("view_ts"))
      .withWatermark("view_ts", lateness)
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col(tsCol).as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", lateness)
    v.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"))
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        col("view_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** Drive [[attributionJoin]] through the REAL streaming engine over
    * a parquet backlog: two independent `readStream` file sources over
    * the same directory (each side filters its own event type),
    * watermarked interval join, `Trigger.AvailableNow` in Append mode
    * to a memory sink. Same certification-vs-production split as
    * [[runTumblingBacklog]]: the harness passes a `lateness` covering
    * the whole backlog span so no file-listing order can make a row
    * late (streamed ≡ batch holds bit-exact for the driver oracle);
    * a production deployment uses a tight lateness and accepts the
    * documented drop-after-watermark semantics in exchange for state
    * that stays O(horizon × rate) forever. The join plan — the part
    * that matters at 100 TB — is identical in both shapes. */
  def runAttributionBacklog(s: SparkSession, backlogDir: String,
                            tsCol: String, horizon: String,
                            lateness: String, filesPerBatch: Int,
                            queryName: String): DataFrame =
    runAttributionBacklogMetered(s, backlogDir, tsCol, horizon, lateness,
      filesPerBatch, queryName)._1

  /** One micro-batch's state telemetry: join-state rows buffered after
    * the batch, rows the batch appended, and the watermark that governed
    * eviction (epoch millis; 0 until the first batch sets it). */
  final case class BatchStateMetric(batchId: Long, stateRows: Long,
                                    outputRows: Long, watermarkMs: Long)

  /** [[runAttributionBacklog]] plus the per-batch state telemetry the
    * 100 TB retention claim rests on. Under a TIGHT lateness the join
    * condition doubles as the retention policy: a buffered view dies
    * once the purchase watermark passes `view_ts + horizon`, so state
    * rows must PLATEAU at O(horizon × rate) however long the backlog —
    * while the certification shape (lateness covering the whole span)
    * never evicts and grows linearly with input. The Stress `attr`
    * storm measures both on the same replicated backlog and SCALE.md
    * tabulates the plateau-vs-linear split; the spec asserts it on a
    * small backlog. Metrics come from the engine's own
    * `StreamingQueryProgress` (`stateOperators.allUpdatesTimeMs`
    * sibling fields), not from any instrumentation of the plan. */
  def runAttributionBacklogMetered(s: SparkSession, backlogDir: String,
                                   tsCol: String, horizon: String,
                                   lateness: String, filesPerBatch: Int,
                                   queryName: String)
      : (DataFrame, Seq[BatchStateMetric]) = {
    val schema = s.read.parquet(backlogDir).schema
    // Two independent sources by MEASUREMENT, not oversight (round 14):
    // the single-source self-join variant ("share one backlog scan")
    // was tried and is ~1.7× SLOWER here — the self-joined source
    // serializes both sides' state commits into one lineage, while two
    // sources let the join consume both sides of a micro-batch
    // concurrently. The per-trigger listing the two sources duplicate
    // is the cheaper term.
    def side(eventType: String): DataFrame =
      s.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerBatch)
        .parquet(backlogDir)
        .filter(col("event_type") === eventType)
    val q = attributionJoin(side("view"), side("purchase"),
        tsCol, horizon, lateness)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      // see runTumblingBacklog: scratch checkpoint, fresh per queryName
      .option("checkpointLocation",
        graft.Engine.streamCheckpointDir(queryName))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val metrics = q.recentProgress.toSeq.map { p =>
      val wm = Option(p.eventTime.get("watermark"))
        .map(java.time.Instant.parse(_).toEpochMilli).getOrElse(0L)
      BatchStateMetric(p.batchId,
        p.stateOperators.map(_.numRowsTotal).sum,
        p.sink.numOutputRows, wm)
    }
    (s.table(queryName), metrics)
  }

  /** Gap-based sessionization on an unbounded stream: Spark's native
    * `session_window` merges events per user into sessions that close
    * after `gap` of event-time silence; the watermark both bounds state
    * and decides when a session is final. The streaming counterpart of
    * the batch q33 operator, equal by law (EventTimeStreamsSpec runs
    * both over the events fixture): a session is a maximal run of
    * events with inter-event gaps strictly below `gap` — a session
    * spans [first, last + gap), so an event at exactly last + gap
    * SPLITS in both shapes. */
  def sessionize(events: DataFrame, tsCol: String, userCol: String,
                 gap: String, lateness: String,
                 sumCol: Option[String] = None): DataFrame = {
    val aggs = count(lit(1)).as("n_events") +:
      sumCol.map(c => sum(col(c)).as(s"sum_$c")).toSeq
    val outCols = Seq(col(userCol),
      col("session_window.start").as("session_start"),
      col("session_window.end").as("session_end"),
      col("n_events")) ++ sumCol.map(c => col(s"sum_$c"))
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(outCols: _*)
  }
}
