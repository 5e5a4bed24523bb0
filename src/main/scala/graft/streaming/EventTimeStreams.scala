package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
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
