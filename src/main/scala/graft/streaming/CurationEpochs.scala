package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Versioned curation-store epochs: the drift→retrain loop closed.
  *
  * q151's drift report says WHEN to retrain the frozen models; this is
  * HOW the retrained artifacts reach a RUNNING [[CurationStream]]
  * without stopping it — the reference's create-DAG-refreshes-what-the-
  * update-DAG-serves contract (mabna_tables_create.py:303 rebuilds the
  * tables mabna_tables_update.py:383 serves from) lifted to the
  * curation engine:
  *
  *  - an offline retrain builds a COMPLETE new store under
  *    `root/epochs/e=<n>` ([[CurationStream.init]] — frozen models +
  *    b=0 seed, commit-marked like any batch);
  *  - [[publish]] then swaps the serving pointer ATOMICALLY: the
  *    pointer is the existence of one empty marker file
  *    `root/_published/<n>`, and a single file create either happened
  *    or didn't — there is no partially-swapped state a crash can
  *    expose ([[currentEpoch]] = max published marker);
  *  - a running [[maintain]] picks the swap up at the NEXT batch
  *    boundary: each micro-batch reads `currentEpoch` once and PINS its
  *    choice durably (`root/_epoch_of/<batchId>.<epoch>`, again one
  *    atomic create) BEFORE serving, so the whole batch — serve,
  *    curated write, absorption — runs against exactly one epoch's
  *    store, and a crashed batch's redelivery reuses the pin even if
  *    the pointer moved in between. Mixed-epoch batches are impossible
  *    by construction: every artifact write is addressed through the
  *    pinned epoch's path.
  *
  * Laws (CurationStreamSpec): a post-swap batch's curated output is
  * byte-equal to [[graft.operators.Curation.serveBatch]] against the
  * freshly-trained store directly; an UNPUBLISHED epoch (the crash-
  * mid-swap window: store built, marker missing) changes nothing — the
  * batch serves entirely from the old epoch; redelivery across a swap
  * honors the pin. The driver oracle (q154) replays pre-swap batch +
  * retrain + post-swap batch as two independent serve chains.
  *
  * Scale: the swap costs one file create regardless of store size; the
  * old epoch keeps serving until the new one is COMPLETE, so retraining
  * (hours at 100 TB) never blocks the 15-minute serve cadence, and a
  * failed retrain leaves an unpublished directory with zero effect on
  * serving. Old epochs stay readable for audit/rollback until an
  * explicit [[dropEpoch]]. */
object CurationEpochs {

  def epochPath(root: String, epoch: Long): String = s"$root/epochs/e=$epoch"

  private def fsOf(s: SparkSession, p: Path) =
    p.getFileSystem(s.sessionState.newHadoopConf())

  /** Every published epoch, ascending (may include superseded ones —
    * they remain valid, fully-built stores until dropped). */
  def publishedEpochs(s: SparkSession, root: String): Seq[Long] = {
    val p = new Path(s"$root/_published")
    val fs = fsOf(s, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .sorted
  }

  /** The serving epoch: the highest published marker. */
  def currentEpoch(s: SparkSession, root: String): Long = {
    val es = publishedEpochs(s, root)
    require(es.nonEmpty, s"no published epoch under $root — init first")
    es.last
  }

  /** The atomic swap: publish `epoch` as the serving version. Refuses
    * an incomplete store (its b=0 seed must carry the commit marker —
    * the same fence [[CurationStream.foldStore]] applies to batches).
    * Idempotent: re-publishing an already-published epoch is a no-op. */
  def publish(s: SparkSession, root: String, epoch: Long): Unit = {
    require(CurationStream.committed(s, epochPath(root, epoch), 0L),
      s"publish(epoch=$epoch): store ${epochPath(root, epoch)} is not " +
        "complete (b=0 seed has no commit marker) — a half-built epoch " +
        "must never become the serving version")
    val p = new Path(s"$root/_published/$epoch")
    val fs = fsOf(s, p)
    fs.mkdirs(p.getParent)
    if (!fs.exists(p)) fs.create(p, false).close()
  }

  /** Build AND publish an epoch: train every frozen model on the given
    * history and seed the store ([[CurationStream.init]]), then swap.
    * Epoch 0 is the bootstrap; later calls are the scheduled offline
    * retrain (triggered by q151's drift report), typically on history ∪
    * everything curated since ([[readCurated]]). */
  def initEpoch(histDocs: DataFrame, histVecs: DataFrame,
                idCol: String, vecCol: String, labelCol: String,
                textCol: String, k: Int, iters: Int,
                numMerges: Int, maxWords: Int,
                dsirTarget: Column, dsirBuckets: Int,
                root: String, epoch: Long,
                seed: String = "graft"): Unit = {
    CurationStream.init(histDocs, histVecs, idCol, vecCol, labelCol,
      textCol, k, iters, numMerges, maxWords, dsirTarget, dsirBuckets,
      epochPath(root, epoch), seed)
    publish(histDocs.sparkSession, root, epoch)
  }

  /** The pin a batch recorded, if any (file `<batchId>.<epoch>`). */
  private def pinnedEpoch(s: SparkSession, root: String,
                          batchId: Long): Option[Long] = {
    val p = new Path(s"$root/_epoch_of")
    val fs = fsOf(s, p)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$batchId."))
      .flatMap(n => scala.util.Try(n.drop(s"$batchId.".length).toLong).toOption)
      .sorted.headOption
  }

  /** Read-or-record the batch→epoch pin. First attempt reads
    * `currentEpoch` and records it with one atomic exclusive create;
    * redelivery (even after a swap) reads the recorded pin back. A
    * crash BEFORE the pin is harmless — nothing was served, redelivery
    * re-chooses; a crash AFTER it replays against the same epoch. */
  private def pinEpoch(s: SparkSession, root: String, batchId: Long): Long =
    pinnedEpoch(s, root, batchId).getOrElse {
      val e = currentEpoch(s, root)
      val p = new Path(s"$root/_epoch_of/$batchId.$e")
      val fs = fsOf(s, p)
      fs.mkdirs(p.getParent)
      try { fs.create(p, false).close(); e }
      catch { case ex: java.io.IOException =>
        // an exclusive-create failure is a LOST RACE only if a pin now
        // exists — then the recorded pin wins. Any other IOException
        // (transient FS error, no durable pin) must PROPAGATE: serving
        // unpinned would let a crash + swap + redelivery re-choose a
        // newer epoch, violating the pin-across-swap law and stranding
        // the first attempt's absorption in the old epoch's store
        // (round-15 advice)
        pinnedEpoch(s, root, batchId).getOrElse(throw ex)
      }
    }

  /** Apply one micro-batch against the PINNED epoch's store
    * ([[CurationStream.applyBatch]] — serve, curated write, absorption,
    * marker, all under `epochs/e=<pin>`). Returns the epoch served. */
  def applyBatchEpoch(batchDocs: DataFrame, batchVecs: DataFrame,
                      idCol: String, vecCol: String, labelCol: String,
                      srcCol: String, textCol: String,
                      root: String, thrNum: Long, thrDen: Long,
                      clusterCap: Long, seed: String, batchId: Long,
                      lexicalLane: Boolean = false): Long = {
    val s = batchDocs.sparkSession
    val e = pinEpoch(s, root, batchId)
    CurationStream.applyBatch(batchDocs, batchVecs, idCol, vecCol,
      labelCol, srcCol, textCol, epochPath(root, e), thrNum, thrDen,
      clusterCap, seed, batchId, lexicalLane = lexicalLane)
    e
  }

  /** The epoch-aware [[CurationStream.maintain]]: same document stream,
    * same effectively-once contract, but every batch resolves its store
    * through the published pointer — a [[publish]] while the query runs
    * takes effect at the next batch boundary with no restart. */
  def maintain(docs: DataFrame, idCol: String, vecCol: String,
               labelCol: String, srcCol: String, textCol: String,
               root: String, thrNum: Long, thrDen: Long,
               clusterCap: Long, seed: String, checkpoint: String,
               batchIdOffset: Long = 1L,
               lexicalLane: Boolean = false): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.toDF().localCheckpoint(true)
        applyBatchEpoch(
          b.select(col(idCol), col(srcCol), col(labelCol), col(textCol)),
          b.select(col(idCol), col(vecCol)),
          idCol, vecCol, labelCol, srcCol, textCol,
          root, thrNum, thrDen, clusterCap, seed,
          batchId + batchIdOffset, lexicalLane = lexicalLane): Unit
      }
      .start()

  /** Epochs whose curated output has been compacted into
    * `curated_archive/` and whose stores are retired (or mid-retirement
    * — the marker is created BEFORE the store drop). */
  def archivedEpochs(s: SparkSession, root: String): Seq[Long] = {
    val p = new Path(s"$root/_archived")
    val fs = fsOf(s, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .sorted
  }

  /** All curated output across epochs, each row carrying the epoch that
    * served it (the verdict's "curated output carries the serving
    * epoch"): live epochs read from their stores, archived ones from
    * the consolidated `curated_archive/` — [[foldEpochs]] is INVISIBLE
    * here (law in CurationStreamSpec). The archive is read only for
    * MARKED epochs (partition pruning on `epoch`), so a crash
    * mid-archive-write — partition present, marker absent — never
    * double-counts: the live copy is still the one read. Epochs with no
    * served batches contribute nothing. */
  def readCurated(s: SparkSession, root: String): DataFrame = {
    val archived = archivedEpochs(s, root)
    val liveParts = publishedEpochs(s, root)
      .filterNot(archived.toSet).flatMap { e =>
        val cur = new Path(s"${epochPath(root, e)}/curated")
        if (!fsOf(s, cur).exists(cur)) None
        else Some(s.read.parquet(cur.toString).withColumn("epoch", lit(e)))
      }
    val arch = new Path(s"$root/curated_archive")
    val archPart =
      if (archived.isEmpty || !fsOf(s, arch).exists(arch)) None
      else Some(s.read.parquet(arch.toString)
        .filter(col("epoch").cast("long").isin(archived: _*))
        .withColumn("epoch", col("epoch").cast("long")))
    val parts = liveParts ++ archPart
    require(parts.nonEmpty, s"no curated output under $root yet")
    parts.reduce(_.unionByName(_))
  }

  /** Epoch retention — the [[graft.streaming.CurationStream.foldStore]]
    * move applied to the EPOCH chain (round-15 verdict #5: without it
    * the published-epoch list, the [[readCurated]] union's file count,
    * and the superseded stores' disk footprint all grow without bound
    * at a 100 TB retrain cadence). Keeps the serving epoch plus the
    * `keep - 1` most recent others; every older published epoch is
    * retired in three idempotent steps, oldest first:
    *
    *   1. its curated output is compacted into the consolidated
    *      `curated_archive/` (partitioned by epoch, dynamic overwrite —
    *      a re-run rewrites the partition byte-identically);
    *   2. one atomic `_archived/<e>` marker create flips reads to the
    *      archive;
    *   3. [[dropEpoch]] deletes the full store and published marker.
    *
    * Crash windows: before the marker, the live store is still the copy
    * [[readCurated]] serves (the partial archive partition is invisible
    * — unmarked epochs are pruned out) and a re-run redoes step 1;
    * between marker and drop, the archive is already authoritative and
    * a re-run completes the delete. Serving batches are untouched: the
    * serving epoch can never be retired, and retired epochs' pins stay
    * as history. Callers must not fold while a redelivery against a
    * to-be-retired epoch is in flight — the same in-flight fence
    * [[CurationStream.foldStore]] documents for batches. */
  def foldEpochs(s: SparkSession, root: String, keep: Int): Unit = {
    require(keep >= 1, s"foldEpochs(keep=$keep): must keep the serving epoch")
    val published = publishedEpochs(s, root)
    val retire = published.dropRight(keep)
    val serving = currentEpoch(s, root)
    retire.foreach { e =>
      require(e != serving, s"foldEpochs: refusing to retire serving epoch $e")
      val cur = new Path(s"${epochPath(root, e)}/curated")
      if (fsOf(s, cur).exists(cur)) {
        s.read.parquet(cur.toString)
          .withColumn("epoch", lit(e))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("epoch")
          .parquet(s"$root/curated_archive")
      }
      val m = new Path(s"$root/_archived/$e")
      val fs = fsOf(s, m)
      fs.mkdirs(m.getParent)
      if (!fs.exists(m)) fs.create(m, false).close()
      dropEpoch(s, root, e)
    }
  }

  /** Drift-gated retrain: q151's signal CONSUMED — the scheduled
    * offline move run end to end. Scores `corpusDocs` twice — through
    * the SERVING epoch's stored NB (the frozen artifact, bit-identical
    * to in-query training by the q146 roundtrip law) and through a
    * candidate retrained on the corpus itself — and takes the
    * exact-integer disagreement in basis points as the drift. If
    * `drift ≥ thresholdBp`, a COMPLETE new epoch trains on the corpus
    * and publishes (the atomic swap); below threshold nothing changes.
    * Either way the decision lands in `root/_gate` — the append-only
    * audit trail of every retrain decision: (gate_seq, threshold_bp,
    * drift_bp, published 0/1, serving_epoch after the gate). All-integer
    * arithmetic end to end, so the driver oracle replays both the
    * signal and the decision (q156). `gateSeq` is the caller's
    * scheduler tick — the log is a log, a re-run gate appends. */
  def retrainIfDrifted(corpusDocs: DataFrame, corpusVecs: DataFrame,
                       idCol: String, vecCol: String, labelCol: String,
                       textCol: String, k: Int, iters: Int,
                       numMerges: Int, maxWords: Int,
                       dsirTarget: Column, dsirBuckets: Int,
                       root: String, newEpoch: Long, thresholdBp: Long,
                       gateSeq: Long, seed: String = "graft"): (Long, Boolean) = {
    val s = corpusDocs.sparkSession
    reconcileGate(s, root)
    val cur = currentEpoch(s, root)
    val row = driftSignal(s, s"${epochPath(root, cur)}/nb", corpusDocs,
      idCol, labelCol, textCol).head()
    val (n, drift) = (row.getLong(0), row.getLong(2))
    require(n > 0, "retrainIfDrifted: drift gate over an empty corpus")
    val published = drift >= thresholdBp
    // ordering is the crash contract (round-15 advice): (1) build the
    // COMPLETE new store — unpublished, so invisible to serving; (2)
    // append the decision row; (3) swap. A crash after (1) re-runs the
    // whole gate next tick (init is pure overwrite — idempotent); a
    // crash between (2) and (3) leaves a logged publish with an unmoved
    // pointer, which the NEXT gate's [[reconcileGate]] completes before
    // reading `currentEpoch` — so a published epoch can never be
    // missing from the audit log, and a logged publish is completed at
    // the latest one tick later while the old epoch keeps serving.
    if (published) {
      CurationStream.init(corpusDocs, corpusVecs, idCol, vecCol, labelCol,
        textCol, k, iters, numMerges, maxWords, dsirTarget, dsirBuckets,
        epochPath(root, newEpoch), seed)
      crashPoint("graft.epochs.crashAfterBuild", gateSeq)
    }
    s.range(1).select(
        lit(gateSeq).as("gate_seq"),
        lit(thresholdBp).as("threshold_bp"),
        lit(drift).as("drift_bp"),
        lit(if (published) 1L else 0L).as("published"),
        lit(if (published) newEpoch else cur).as("serving_epoch"))
      .write.mode("append").parquet(s"$root/_gate")
    if (published) {
      crashPoint("graft.epochs.crashAfterGate", gateSeq)
      publish(s, root, newEpoch)
    }
    (drift, published)
  }

  /** The drift SIGNAL alone, replay-only: `corpusDocs` scored twice —
    * through the stored NB at `nbPath` (the frozen artifact,
    * bit-identical to in-query training by the q146 roundtrip law) and
    * through a candidate retrained on the corpus itself — reduced to
    * one row (n_docs, n_agree, drift_bp; floor-div basis points, exact
    * integers end to end). Publishes nothing, mutates nothing —
    * idempotent per evaluation, so the bench can band the EXPENSIVE
    * part of the gate (the two full scoring passes) that q156's
    * once-per-JVM log read-back cannot see (round-15 verdict #4).
    * [[retrainIfDrifted]] consumes exactly this row, so q157's band
    * and q156's decision log certify one derivation. */
  def driftSignal(s: SparkSession, nbPath: String, corpusDocs: DataFrame,
                  idCol: String, labelCol: String,
                  textCol: String): DataFrame = {
    val frozen = graft.operators.TextOps
      .scoreNbBatch(s, nbPath, corpusDocs, idCol, textCol)
      .select(col(idCol), col("pred").as("__pf"))
    val cand = graft.operators.TextOps.nbTrainPredict(
        corpusDocs, corpusDocs, idCol, labelCol, textCol)
      .select(col(idCol), col("pred").as("__pr"))
    frozen.join(cand, Seq(idCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__pf") === col("__pr"), 1L).otherwise(0L))
          .as("n_agree"))
      .withColumn("drift_bp",
        expr("(n_docs - n_agree) * 10000 DIV n_docs"))
  }

  /** Crash injection for the epoch-swap storm (Stress mode "gatecrash"):
    * `-Dgraft.epochs.crashAfterBuild=<gateSeq>` halts right after the
    * candidate store is built (pre-log, pre-swap),
    * `-Dgraft.epochs.crashAfterGate=<gateSeq>` after the decision row
    * lands but BEFORE the pointer moves — the two worst-ordered windows
    * the gate ordering must survive. halt (not exit) so no shutdown
    * hook tidies the simulated kill. */
  private def crashPoint(prop: String, gateSeq: Long): Unit =
    if (sys.props.get(prop).exists(_.toLong == gateSeq))
      Runtime.getRuntime.halt(137)

  /** Heal the logged-but-unswapped crash window: any `_gate` row with
    * `published = 1` whose epoch has a COMPLETE store (b=0 seed commit
    * marker) but no published marker gets its [[publish]] completed —
    * idempotent, one marker create per healed epoch. Run at the top of
    * every gate tick; safe to call any time (the gate log is
    * decisions-sized, so the collect is bounded by ticks, not data). */
  def reconcileGate(s: SparkSession, root: String): Unit = {
    val p = new Path(s"$root/_gate")
    if (!fsOf(s, p).exists(p)) return
    val logged = s.read.parquet(s"$root/_gate")
      .filter(col("published") === 1L)
      .select(col("serving_epoch")).distinct()
      .collect().map(_.getLong(0))
    val already = publishedEpochs(s, root).toSet
    logged.filterNot(already).sorted.foreach { e =>
      if (CurationStream.committed(s, epochPath(root, e), 0L))
        publish(s, root, e)
    }
  }

  /** Retire a superseded epoch: refuse the serving one, delete the
    * store and the marker. Pins referencing it stay — they are history
    * (a batch THAT ran against epoch e ran against epoch e). */
  def dropEpoch(s: SparkSession, root: String, epoch: Long): Unit = {
    require(epoch != currentEpoch(s, root),
      s"dropEpoch($epoch): refusing to drop the serving epoch")
    val store = new Path(epochPath(root, epoch))
    val marker = new Path(s"$root/_published/$epoch")
    val fs = fsOf(s, store)
    fs.delete(store, true)
    fs.delete(marker, false): Unit
  }
}
