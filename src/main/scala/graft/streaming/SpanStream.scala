package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.SpanDedup

/** Continuous exact-substring span dedup over a stream of crawl
  * batches — [[CurationStream]]'s absorb-as-you-serve discipline
  * applied to the gram store: each micro-batch is cut against every
  * PRIOR batch's grams (never its own — the batchCut redelivery
  * fence), its cleaned docs land under `clean/b=<id>`, and the grams
  * of the CLEAN text (the corpus as stored, including seams the cut
  * created) absorb under `grams/b=<id>` so any later batch that
  * repeats a surviving passage loses it. All writes are idempotent
  * dynamic partition overwrites; the commit marker is last; a crashed
  * attempt redelivers to a bit-identical store.
  *
  * The bloom sketch's coverage stays where the last
  * [[SpanDedup.writeGramBloom]] sweep put it — freshly absorbed
  * batches serve through the residual plain semi-join until the next
  * sweep, so absorption never blocks on a corpus-sized aggregate. */
object SpanStream {

  /** Seed the store: history's grams under b=0, bloom swept to 0. */
  def init(histDocs: DataFrame, idCol: String, textCol: String,
           k: Int, path: String): Unit = {
    val s = histDocs.sparkSession
    SpanDedup.writeGramStore(s, histDocs, idCol, textCol, k, path)
    markCommitted(s, path, 0L)
  }

  private def markCommitted(s: SparkSession, path: String,
                            batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_committed/$batchId")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Serve + absorb one micro-batch; skip if committed (redelivery). */
  def applyBatch(batchDocs: DataFrame, idCol: String, textCol: String,
                 k: Int, path: String, batchId: Long): Unit = {
    val s = batchDocs.sparkSession
    require(batchId >= 1, s"batchId=$batchId collides with the b=0 seed")
    if (CurationStream.committed(s, path, batchId)) return
    if (!batchDocs.isEmpty) {
      val cleaned = SpanDedup.serveSpanCut(s, path, batchDocs,
          idCol, textCol, k, batchCut = Some(batchId))
        .localCheckpoint(eager = true)
      cleaned.withColumn("b", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("b").parquet(s"$path/clean")
      SpanDedup.appendGrams(
        cleaned.select(col(idCol), col("clean_text").as(textCol)),
        idCol, textCol, k, path, batchId)
    }
    markCommitted(s, path, batchId)
  }

  /** The real streaming loop: one [[applyBatch]] per micro-batch. */
  def maintain(docs: DataFrame, idCol: String, textCol: String,
               k: Int, path: String, checkpoint: String,
               batchIdOffset: Long = 1L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF().localCheckpoint(true)
            .select(col(idCol), col(textCol)),
          idCol, textCol, k, path, batchId + batchIdOffset)
      }
      .start()
}
