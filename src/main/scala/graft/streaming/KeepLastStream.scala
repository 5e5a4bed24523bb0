package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.operators.Dedup

/** Structured-Streaming re-expression of the reference's hand-rolled
  * micro-batch loop (SURVEY.md §2.9; mabna_tables_update.py:383-410).
  *
  * The reference approximates a stream with: cron every 15 min →
  * watermark probe (MAX(meta.version)) → filtered re-fetch → append →
  * full-table keep-last rewrite. Idiomatically that is exactly
  * `readStream → dropDuplicates / mapGroupsWithState → append sink`,
  * with Spark's checkpoint as the watermark store instead of the
  * destination table, and per-key state instead of an O(table) rewrite
  * per batch — the difference between O(total) and O(batch) at 100 TB.
  */
object KeepLastStream {

  /** Typed record for the keep-last state machine: a version-stamped
    * keyed event (the fixture realization of the reference's
    * (j_date,name) × meta.version semantics). */
  case class KeyedEvent(key1: Long, key2: String, version: Long, value: Double)
  case class KeptState(version: Long, value: Double)

  /** Emit the running keep-last winner per key on every batch that
    * STRICTLY advances it (an at-least-once redelivery of the current
    * winner is a no-op, not a duplicate emission). State is one
    * (version, value) per key — bounded by key cardinality, not stream
    * length. */
  def keepLastUpdates(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.key1, e.key2))
      .flatMapGroupsWithState[KeptState, KeyedEvent](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case ((k1, k2), batch, state: GroupState[KeptState]) =>
          val incoming = batch.maxByOption(_.version)
          val current = state.getOption
          incoming match {
            case Some(e) if current.forall(_.version < e.version) =>
              state.update(KeptState(e.version, e.value))
              Iterator(KeyedEvent(k1, k2, e.version, e.value))
            case _ => Iterator.empty
          }
      }
  }

  /** The fidelity-level pipeline as one streaming query: parquet-dir
    * source → event-time watermark → append to a layered store via
    * foreachBatch running the same batch dedup the engine uses (W1).
    * `availableNow` processes the backlog then stops — the Trigger
    * equivalent of the reference's cron batch. */
  def run(spark: SparkSession, srcDir: String, destDir: String,
          checkpoint: String, keys: Seq[String], versionCol: String,
          schema: org.apache.spark.sql.types.StructType): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged = Dedup.keepLast(
          batch, keys, Seq(col(versionCol)))
        merged.write.mode("append").parquet(destDir)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
