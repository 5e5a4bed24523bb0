package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextOps

/** Continuous retrieval-index maintenance: the incremental posting-
  * index append (q87's TextOps.appendToPostingIndex) mounted as a
  * streaming sink, so the serving index tracks an unbounded document
  * stream — the "crawl lands, becomes searchable" loop, closed.
  *
  * `foreachBatch` is the right integration point, not a custom sink:
  * the append is already an idempotent-per-batch BATCH write into
  * term-hash partitions (it touches only the partitions the batch's
  * terms hash into, and merged (df, stats) state is additive), and
  * foreachBatch gives it exactly-once batch boundaries against the
  * checkpoint. Re-delivery of a completed epoch after a crash is the
  * one at-least-once hole (the standard foreachBatch contract) — a
  * production deployment fences on `batchId` (e.g. a committed-batch
  * marker next to the store) the same way every idempotent-sink
  * recipe does; the contract is documented here rather than hidden.
  *
  * Scale shape: each micro-batch pays O(batch) tokenize + one
  * partitioned append; the standing store is never read, let alone
  * rewritten — identical economics to the q87 batch loop, just driven
  * by a trigger instead of a scheduler. Query side is unchanged
  * (bm25TopKIndexed), which is the point: readers cannot tell whether
  * a scheduler or a stream maintains their index.
  */
object IndexStream {

  /** Start the maintenance query. Documents must carry `idCol` +
    * `textCol`; batches must be doc-disjoint (the upstream keep-first
    * dedup — DocumentStreams/KeepLastStream — is the usual guard).
    * Empty micro-batches are skipped entirely: no empty files, no
    * zero-contribution stats rows. */
  def maintainPostingIndex(docs: DataFrame, idCol: String, textCol: String,
                           path: String, parts: Int,
                           checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          TextOps.appendToPostingIndex(batch, idCol, textCol, path, parts)
      }
      .start()
}
