package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Clustering, Similarity}

/** Continuous semantic dedup: the persisted sem store (q127's
  * discipline) maintained by a vector stream — each micro-batch is
  * (1) DEDUP-PROBED against the store as it stood before the batch
  * (near-dup pairs land in `path/pairs/b=<batchId>`), then
  * (2) routed through the frozen centroids and added to the members —
  * the "crawl lands, gets semantically deduped against everything
  * before it" loop, closed.
  *
  * Effectively-once, by the IndexStream mechanisms: every artifact of
  * a batch lives under a `b=<batchId>` partition written with DYNAMIC
  * partition overwrite (a redelivered batch — including one whose
  * earlier attempt failed partway — replaces its own partitions with
  * identical content), and a committed-batch marker turns redelivery
  * of a completed batch into a metadata no-op. Replaying ANY prefix of
  * batches leaves members AND pairs identical (law in SemStreamSpec).
  *
  * Store layout: [[init]] writes the frozen centroids and the seed
  * corpus's members under `b=0`; stream batches add `b=1, 2, …`
  * (members partitioned (b, cluster)). [[Similarity.probeSemStore]]
  * reads either layout — it selects columns, never the partition
  * scheme — so the batch probe API serves stream-built stores
  * unchanged. The trade vs the batch store's cluster-first layout:
  * purge prunes by batch rather than by cluster here; a retention
  * fold (the q115 move) re-layouts when history grows.
  *
  * Determinism contract: routing and pairing are pure per-row
  * functions of the frozen centroids, so the final members equal the
  * batch build over the union, and each batch's pairs equal a batch
  * probe against the prior members — HOW the stream was micro-batched
  * is unobservable in any result (the law SemStreamSpec pins).
  */
object SemStream {

  /** Has `batchId` been fully applied (artifacts + marker)? */
  def committed(s: SparkSession, path: String, batchId: Long): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_committed/$batchId")
    p.getFileSystem(s.sessionState.newHadoopConf()).exists(p)
  }

  private def markCommitted(s: SparkSession, path: String,
                            batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_committed/$batchId")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Build the stream-layout store: frozen centroids trained on the
    * seed corpus, members under b=0. Batches then start at id 1
    * (foreachBatch ids start at 0 — pass `batchIdOffset = 1` below,
    * the default). */
  def init(corpus: DataFrame, idCol: String, vecCol: String,
           k: Int, iters: Int, path: String): Unit = {
    val s = corpus.sparkSession
    val (av, cents) = Clustering.kmeansQuantized(corpus, idCol, vecCol,
      k, iters, keepVec = true)
    import s.implicits._
    cents.map { case (c, v) => (c, v.toSeq) }.toDF("cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    av.withColumn("b", lit(0L))
      .write.mode("overwrite").partitionBy("b", "cluster")
      .parquet(s"$path/members")
    markCommitted(s, path, 0L)
  }

  /** Apply one micro-batch: skip if committed; else probe the batch
    * against the CURRENT members (pairs → `pairs/b=`), route it and
    * add its member rows (`members/b=`), both idempotent dynamic
    * overwrites, then the marker. Within-batch duplicates are not
    * paired (they arrive together); the upstream keep-first guard is
    * the usual answer, same contract as IndexStream. Empty batches
    * commit their marker only. */
  def applyBatch(batch: DataFrame, idCol: String, vecCol: String,
                 path: String, thrNum: Long, thrDen: Long,
                 clusterCap: Long, seed: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    require(batchId >= 1, s"batchId=$batchId collides with the b=0 seed")
    if (committed(s, path, batchId)) return
    if (!batch.isEmpty) {
      Similarity.probeSemStore(s, path, batch, idCol, vecCol,
          thrNum, thrDen, clusterCap, seed)
        .withColumn("b", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("b").parquet(s"$path/pairs")
      Clustering.assignToCentroidsKeepVec(batch, idCol, vecCol,
          Similarity.readSemCents(s, path))
        .withColumn("b", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("b", "cluster").parquet(s"$path/members")
    }
    markCommitted(s, path, batchId)
  }

  /** Start the maintenance query over a vector stream. `batchIdOffset`
    * shifts foreachBatch's 0-based ids past the b=0 seed. */
  def maintainSemStore(vecs: DataFrame, idCol: String, vecCol: String,
                       path: String, thrNum: Long, thrDen: Long,
                       clusterCap: Long, seed: String,
                       checkpoint: String,
                       batchIdOffset: Long = 1L): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), idCol, vecCol, path, thrNum, thrDen,
          clusterCap, seed, batchId + batchIdOffset)
      }
      .start()
}
