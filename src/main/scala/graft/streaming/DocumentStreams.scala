package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming corpus prep: the training-mix gates on an UNBOUNDED
  * document stream — the shape a continuous crawl feeds.
  *
  * The quality and language gates are row-local codegen'd selects
  * ([[TextOps.gateDocuments]]), so they run unchanged under
  * micro-batching — no state, no shuffle, each batch gates its own
  * rows. Dedup is the part that genuinely changes shape: the batch
  * keep-first window becomes `dropDuplicatesWithinWatermark` on the
  * normalized content hash — exact keep-first within the lateness
  * horizon, with state BOUNDED by the watermark (the unbounded-state
  * exact form would OOM on an endless crawl; a re-crawl duplicate
  * arriving after the horizon re-emits, which is the standard
  * streaming-dedup trade and the reason batch compaction still runs
  * downstream at 100 TB).
  */
object DocumentStreams {

  /** Gate + dedup a document stream. `tsCol` is the event-time column
    * the watermark rides on; duplicates (same normalized content)
    * within `lateness` of each other emit once. */
  def gatedDedupedDocs(docs: DataFrame, tsCol: String, textCol: String,
                       minQuality: Double, keepLangs: Seq[String],
                       lateness: String): DataFrame =
    TextOps.gateDocuments(docs, textCol, minQuality, keepLangs)
      .withColumn("__content", md5(TextOps.normalizeText(col(textCol))))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__content")
      .drop("__content")
}
