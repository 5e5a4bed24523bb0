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
    * against the members of batches BEFORE it (`batchCut = batchId` —
    * pairs → `pairs/b=`), route it and add its member rows
    * (`members/b=`), both idempotent dynamic overwrites, then the
    * marker. The batch cut is the redelivery fence: a crashed attempt
    * may have landed its own `b=batchId` member rows before the
    * marker, and an unfenced re-probe would pair the batch against
    * itself (self-pairs at cosine 1) — with the cut, the re-probe sees
    * exactly the prior members and rewrites `pairs/b=` with identical
    * content (law in SemStreamSpec, including the marker-missing
    * crash window). Within-batch duplicates are not paired (they
    * arrive together); the upstream keep-first guard is the usual
    * answer, same contract as IndexStream. Empty batches commit their
    * marker only. */
  def applyBatch(batch: DataFrame, idCol: String, vecCol: String,
                 path: String, thrNum: Long, thrDen: Long,
                 clusterCap: Long, seed: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    require(batchId >= 1, s"batchId=$batchId collides with the b=0 seed")
    if (committed(s, path, batchId)) return
    if (!batch.isEmpty) {
      Similarity.probeSemStore(s, path, batch, idCol, vecCol,
          thrNum, thrDen, clusterCap, seed, batchCut = Some(batchId))
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

  /** Retention fold for the stream-maintained sem store — the q115
    * lifecycle move ported to the (b, cluster) layout: merge every
    * members/pairs batch `b ≤ upTo` into ONE base snapshot labeled
    * `b = upTo`, leaving batches `> upTo` untouched. Batches hold
    * doc-disjoint rows routed through the SAME frozen centroids, so
    * folding is a pure relabel-union — no recompute, no re-route — and
    * every read that doesn't cut below the fold point is IDENTICAL
    * before and after (law in SemStreamSpec): the un-cut
    * [[Similarity.probeSemStore]], and any `batchCut > upTo`. History
    * BELOW the fold point is forfeited by contract (a cut ≤ upTo sees
    * only batches that escaped folding), same retention semantics as
    * the posting-index fold.
    *
    * The fold keeps the `b=` level (members fold INTO `b=upTo/
    * cluster=…`) rather than dropping to the batch store's bare
    * cluster-first layout: later stream batches keep writing
    * `b=<id>/…` next to it, and mixing a bare layout with partitioned
    * directories under one root is exactly the corruption the posting
    * store's legacy-layout fence exists to refuse. Committed-batch
    * markers are KEPT for folded batches — they fence a redelivering
    * producer from re-applying a batch the fold already absorbed.
    *
    * Crash recovery is exact here, BETTER than the posting fold's
    * double-count window: a failure between the overwrite and the
    * stale-dir delete leaves the folded rows present twice (under
    * `b=upTo` and under their stale dirs), but members dedupe by `id`
    * and pairs by their full row — both unique keys whose payloads are
    * deterministic — so the re-run converges to the clean fold
    * bit-for-bit instead of summing duplicates. */
  def foldSemStore(s: SparkSession, path: String, upTo: Long): Unit = {
    val hconf = s.sessionState.newHadoopConf()
    def artifact(sub: String): Option[org.apache.hadoop.fs.Path] = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (p.getFileSystem(hconf).exists(p)) Some(p) else None
    }
    def batchesOf(sub: String): Seq[Long] = artifact(sub).toSeq.flatMap { p =>
      p.getFileSystem(hconf).listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("b="))
        .map(_.getPath.getName.stripPrefix("b=").toLong)
    }
    def deleteBelow(sub: String): Unit = artifact(sub).foreach { p =>
      val fs = p.getFileSystem(hconf)
      fs.listStatus(p)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("b="))
        .filter(_.getPath.getName.stripPrefix("b=").toLong < upTo)
        .foreach(st => fs.delete(st.getPath, true))
    }
    // Fold-safety fence (round-14 advice): the fold relabels every
    // batch b ≤ upTo into b=upTo — if a producer crashed mid-batch
    // (member rows landed under b=k, marker missing) and the fold ran
    // before redelivery, the fold would absorb the partial rows into
    // b=upTo while the KEPT markers no longer fence batch k; the
    // redelivery then re-applies k (batchCut excludes b=upTo), and the
    // batch's docs exist under BOTH b=k and b=upTo — duplicate ids,
    // duplicate probe pairs, effectively-once silently broken. So:
    // every batch with rows on disk at or below the fold point must
    // carry its commit marker, and the fold point itself must not sit
    // above the last committed batch (folding "the future" would
    // relabel history to a b that later batches' batchCut excludes,
    // leaving them nothing to probe against). Fail loudly, same
    // discipline as the posting store's lifecycle fences.
    val present = (batchesOf("members") ++ batchesOf("pairs"))
      .distinct.filter(_ <= upTo)
    val uncommitted = present.filterNot(committed(s, path, _)).sorted
    require(uncommitted.isEmpty,
      s"foldSemStore(upTo=$upTo): batch(es) ${uncommitted.mkString(", ")} " +
        s"have rows under $path but no commit marker — a producer " +
        "crashed mid-batch; let redelivery complete them before folding")
    val committedMax: Long = {
      val p = new org.apache.hadoop.fs.Path(s"$path/_committed")
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) -1L
      else fs.listStatus(p).toSeq
        .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
        .foldLeft(-1L)(math.max)
    }
    require(upTo <= committedMax,
      s"foldSemStore(upTo=$upTo): fold point is above the last committed " +
        s"batch ($committedMax) — folding ahead of the stream relabels " +
        "history to a partition future batchCuts exclude")
    def fold(sub: String, parts: Seq[String], dedupKeys: Seq[String],
             shuffleKey: Option[String]): Unit =
      if (batchesOf(sub).count(_ <= upTo) > 1) {
        val read = s.read.parquet(s"$path/$sub")
          .filter(col("b").cast("long") <= upTo).drop("b")
          .dropDuplicates(dedupKeys) // exact: crash-rerun sees each row twice
          .withColumn("b", lit(upTo))
        val merged = shuffleKey.fold(read)(k => read.repartition(col(k)))
          .localCheckpoint() // materialize BEFORE touching source dirs
        merged.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(parts: _*).parquet(s"$path/$sub")
        deleteBelow(sub)
      }
    fold("members", Seq("b", "cluster"), Seq("id"), Some("cluster"))
    fold("pairs", Seq("b"), Seq("cluster", "store_id", "batch_id"), None)
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
