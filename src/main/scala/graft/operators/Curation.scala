package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frozen-artifact incremental curation — the q139 closed loop split
  * into train-once / serve-forever, the production shape: each stage's
  * model already had a persisted form (sem store, NB tables, BPE
  * merges, DSIR weights); this composes them so a NEW crawl batch is
  * curated against FROZEN artifacts with no retraining — q58's
  * replay-≡-full-refresh discipline lifted to the curation level.
  *
  * Reference semantics: the reference's update loop
  * (mabna_tables_update.py:1-436) re-reads only the new rows and
  * serves them against state computed by the create pass — this is
  * that contract for a curation pipeline: history is touched only
  * through its frozen artifacts.
  *
  * Store layout under `path/`:
  *   hashes/  — one row per distinct normalized-content md5 in history
  *              (corpus-sized; the only artifact that is not
  *              model-sized, read only as an equi-join side)
  *   sem/     — [[Similarity.writeSemStore]]: frozen centroids +
  *              uncapped routed members
  *   nb/      — [[TextOps.writeNbModel]]: K-row classes + (lab, tok)
  *              log-likelihoods
  *   bpe/     — [[TextOps.writeBpeMerges]]: the ordered merge list
  *   dsir/    — [[Sampling.writeDsirWeights]]: the bucket-spine weight
  *              table
  *
  * Serve stages (q139's order, per batch):
  *   1. exact dedup — within-batch keepers, then drop any whose
  *      normalized hash exists in history (`hashes` anti-join);
  *   2. within-batch semantic dedup — route the batch through the
  *      frozen centroids, [[Similarity.semPairsWithin]], drop losers;
  *   3. history semantic dedup — [[Similarity.probeSemStore]]; a batch
  *      doc near-dup of ANY stored member drops (store always wins);
  *   4. quality — [[TextOps.scoreNbBatch]], keep pred == label;
  *   5. annotate — frozen-BPE token counts + frozen-DSIR score.
  *
  * Scale: every stage is the already-audited operator — equi-joins on
  * hash/cluster/token keys, broadcast model tables, per-doc codegen'd
  * projections; the only driver reads are model-sized (centroids,
  * merges). Nothing about the batch's size leaks into history cost:
  * history is read as the hash join side and the capped member lists
  * of the batch's own clusters.
  *
  * Law (CurationSpec): serve(batch) ⊆ recurate(history ∪ batch)
  * restricted to the batch, where recurate composes the SAME frozen
  * models over the union. Holds exactly because per-doc stages (NB,
  * BPE, DSIR) are pure functions of the frozen tables, and the dedup
  * stages can only drop MORE in serve than in recurate: a batch doc's
  * rank in any per-cluster cap can only improve when history rows
  * leave the competition, so every pair recurate examines and loses,
  * serve examines too — and serve additionally drops on any
  * history-side hash or near-dup hit. */
object Curation {

  /** Freeze every model the serve path needs, trained on history ONLY.
    * `histDocs` are the curated history documents (id, label, source,
    * text); `histVecs` their embeddings (id, vec). */
  def writeCurationStore(histDocs: DataFrame, histVecs: DataFrame,
                         idCol: String, vecCol: String, labelCol: String,
                         textCol: String, k: Int, iters: Int,
                         numMerges: Int, maxWords: Int,
                         dsirTarget: Column, dsirBuckets: Int,
                         path: String, seed: String = "graft"): Unit = {
    val s = histDocs.sparkSession
    histDocs
      .select(md5(TextOps.normalizeText(col(textCol))).as("content_hash"))
      .distinct()
      .write.mode("overwrite").parquet(s"$path/hashes")
    writeHashBloom(s, path, coveredUpTo = Long.MaxValue)
    Similarity.writeSemStore(histVecs, idCol, vecCol, k, iters, s"$path/sem")
    TextOps.writeNbModel(histDocs, labelCol, textCol, s"$path/nb")
    TextOps.writeBpeMerges(s,
      TextOps.bpeLearnMerges(histDocs, textCol, numMerges, maxWords),
      s"$path/bpe")
    Sampling.writeDsirWeights(histDocs, idCol, textCol, dsirTarget,
      dsirBuckets, s"$path/dsir", seed)
  }

  /** (Re)build the persisted hash-log bloom sketch (`hashbloom/`): one
    * binary row — Spark's own [[org.apache.spark.sql.catalyst
    * .expressions.aggregate.BloomFilterAggregate]] over
    * `xxhash64(content_hash)` for every log row with `b ≤ coveredUpTo`
    * (the whole log for batch-layout stores, which carry no `b`) — plus
    * the coverage bound serve needs to split covered from
    * since-absorbed hashes. Built at store-init and REBUILT at fold
    * time ([[graft.streaming.CurationStream.foldStore]]); between
    * rebuilds the artifact goes stale-but-correct, because serve runs
    * the residual `b > covered_up_to` slice through a plain exact
    * anti-join. Sizing: exact item count, Spark's default ~3% fpp
    * (items beyond the conf's bloom cap only raise the fpp — false
    * positives fall through to the exact join, so correctness never
    * depends on the sketch). An empty log writes no sketch. */
  def writeHashBloom(s: SparkSession, path: String,
                     coveredUpTo: Long): Unit = {
    val hashes = s.read.parquet(s"$path/hashes")
    val slice =
      if (hashes.columns.contains("b"))
        hashes.filter(col("b").cast("long") <= coveredUpTo)
      else hashes
    val n = slice.count()
    if (n > 0) {
      Blooms.register(s)
      slice
        .agg(call_function("graft_bloom_agg",
          xxhash64(col("content_hash")), lit(n)).as("bf"))
        .withColumn("covered_up_to", lit(coveredUpTo))
        .withColumn("n_items", lit(n))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/hashbloom")
    }
  }

  /** The history hash log, cut to batches `b < batchCut` for
    * stream-layout stores (the redelivery fence); batch-layout stores
    * carry no `b` and take the whole log. */
  private def cutHashes(s: SparkSession, path: String,
                        batchCut: Option[Long]): DataFrame = {
    val raw = s.read.parquet(s"$path/hashes")
    batchCut.fold(raw)(c => raw.filter(col("b").cast("long") < lit(c)))
  }

  /** The persisted hash-log bloom ([[writeHashBloom]]) as an in-plan
    * scalar + its coverage bound — None when absent, unreadable (e.g. a
    * mid-rebuild crash; the caller falls back to the plain join) or
    * smaller than `bloomMinItems` (below which the sketch's fixed
    * overhead costs more than the shuffle it saves). */
  private def readBloomArt(s: SparkSession, path: String,
                           bloomMinItems: Long): Option[(Column, Long)] = {
    val bp = new org.apache.hadoop.fs.Path(s"$path/hashbloom")
    if (!bp.getFileSystem(s.sessionState.newHadoopConf()).exists(bp)) None
    else scala.util.Try {
      val art = s.read.parquet(s"$path/hashbloom")
      val meta = art.select(col("covered_up_to"), col("n_items")).head()
      Blooms.register(s)
      (art.select(col("bf")).scalar(), meta.getLong(0), meta.getLong(1))
    }.toOption.collect {
      case (bf, covered, n) if n >= bloomMinItems => (bf, covered)
    }
  }

  /** The batch's vector dimension, peeked ONCE per serve/audit on the
    * raw vec scan (one metadata-scale take) — the knownDim both pair
    * fences consume. None on an all-null/empty batch: the fences then
    * fall back to their own peek, which over an empty pair input is a
    * no-op check, exactly the pre-round-19 behavior. */
  private def batchDim(batchVecs: DataFrame, vecCol: String): Option[Int] =
    batchVecs.filter(col(vecCol).isNotNull)
      .select(col(vecCol)).limit(1).collect()
      .headOption.filter(!_.isNullAt(0)).map(_.getSeq[Any](0).size)

  /** Stage 1's history check, SHARED by [[serveBatch]] and
    * [[auditBatch]] (round-15 verdict: the audit must never re-shuffle
    * the log the serve path no longer touches): the within-batch
    * keepers that are FRESH against the (cut) history hash log. With a
    * bloom artifact, bloom MISSES are definitely fresh (no false
    * negatives) and skip the join; only the HITS reach an exact
    * anti-join whose log side is first pruned to dup-sized by an
    * in-plan bloom of the hit hashes; hashes absorbed after the
    * sketch's fold point (`b > covered`) are a residual
    * absorption-sized plain anti-join. Result ≡ the plain anti-join for
    * ANY sketch state (law in CurationSpec). Callers localCheckpoint
    * `keepers` when passing a bloom artifact — it is consumed three
    * times here. */
  private def hashFreshKeepers(keepers: DataFrame, hashes: DataFrame,
                               bloomArt: Option[(Column, Long)]): DataFrame =
    bloomArt.fold(
      keepers.join(hashes.select("content_hash"), Seq("content_hash"),
        "left_anti")
    ) { case (bf, covered) =>
      val hasB = hashes.columns.contains("b")
      val coveredSlice =
        if (hasB) hashes.filter(col("b").cast("long") <= covered) else hashes
      val recentSlice =
        if (hasB) hashes.filter(col("b").cast("long") > covered)
        else hashes.limit(0)
      val might = call_function("graft_might_contain", bf,
        xxhash64(col("content_hash")))
      val exactKeep = keepers.where(might)
        .join(Blooms.bloomPrefilter(coveredSlice.select("content_hash"),
            keepers.where(might), "content_hash", "content_hash",
            expectedItems = 1000000L),
          Seq("content_hash"), "left_anti")
      keepers.where(not(might)).unionByName(exactKeep)
        .join(recentSlice.select("content_hash"), Seq("content_hash"),
          "left_anti")
    }

  /** Curate ONE new batch against the frozen store. Returns the
    * surviving docs annotated with their frozen-model artifacts:
    * (id, source, label, cluster, bpe_tokens, dsir_score).
    *
    * `batchCut`: for stream-maintained stores whose `hashes` and
    * `sem/members` carry `b=<batchId>` partitions
    * ([[graft.streaming.CurationStream]]), serve only against batches
    * `b < batchCut`. This is the redelivery fence: a crashed attempt
    * may have ABSORBED its own survivors (hashes + member rows under
    * `b = batchId`) before the commit marker, and an unfenced re-serve
    * would then exact-drop and near-dup-drop the whole batch against
    * itself. Batch-layout stores ([[writeCurationStore]]) have no `b`
    * column — leave batchCut empty there.
    *
    * Vectorless batch docs are REJECTED by default (documented
    * contract): a doc with no non-null `vecCol` row cannot take part in
    * semantic dedup, so it is dropped by a batch-sized semi join right
    * after stage 1 — deterministically, like a failed media decode
    * drops at the decode filter. It still COMPETES in within-batch
    * exact dedup first: the min-id copy is a content group's
    * representative whether or not it carries a vector, so a group
    * whose representative is vectorless is rejected whole (the keeper
    * convention the oracle replays). Before round 15 such docs flowed
    * through four stages and silently vanished at the final annotation
    * join; now the rejection is explicit and early, and callers needing
    * the rejected set can anti-join the input against the output ids.
    * (`batchVecs` carries at most one row per id, as everywhere in the
    * sem family.)
    *
    * `lexicalLane = true` (round-15 verdict #7) opts vectorless keepers
    * into a LEXICAL lane instead: a real crawl pipeline still curates
    * the docs its embedder has not reached through every stage that
    * needs no vector. The lane runs stages 1, 4 and 5 only (exact
    * dedup incl. the shared bloom-split history check, frozen-NB
    * quality, frozen-BPE/DSIR annotation) and emits `cluster = null`;
    * the vectored lane's plan is byte-identical to the default path
    * (law in CurationSpec: lane-on restricted to vectored ids ≡
    * lane-off, and the lexical rows ≡ the hand-composed 3-stage
    * chain). Lane cost is batch-sized: one extra NB/BPE/DSIR pass over
    * the vectorless slice against the same broadcast model tables —
    * nothing history-sized is re-read. */
  def serveBatch(s: SparkSession, path: String,
                 batchDocs: DataFrame, batchVecs: DataFrame,
                 idCol: String, vecCol: String, labelCol: String,
                 srcCol: String, textCol: String,
                 thrNum: Long, thrDen: Long, clusterCap: Long,
                 seed: String = "graft",
                 batchCut: Option[Long] = None,
                 bloomMinItems: Long = 1000000L,
                 lexicalLane: Boolean = false): DataFrame = {
    // vectorless docs still COMPETE in within-batch exact dedup (the
    // min-id copy is the content's representative whether or not it
    // carries a vector — the oracle's keeper convention); the covered
    // semi join rejects vectorless KEEPERS right after stage 1
    val coveredIds = batchVecs.filter(col(vecCol).isNotNull)
      .select(col(idCol))
    // one cheap peek of the batch's vector dimension on the RAW vec
    // scan — it feeds the overflow fences of both pair stages below
    // (knownDim), replacing two executeTake cascades over composed
    // serve-chain plans (measured: 15 jobs / 1.3 s of an 8.4 s serve)
    // with a single take against the scan. Same dimension the fences
    // peeked before: quantization preserves length, and the pair
    // stages only ever see (a subset of) these vectors.
    val fenceDim = batchDim(batchVecs, vecCol)
    // 1. exact: within-batch keepers, minus history content. The hash
    // log is the one corpus-sized serve-side artifact; at 100 TB a
    // plain anti-join shuffles it against every batch. The persisted
    // bloom ([[writeHashBloom]], rebuilt at init/fold time) prefilters
    // the batch — bloom MISSES are definitely fresh (no false
    // negatives) and skip the join entirely; only the HITS (true dups
    // + ~3% fp) reach an exact anti-join, whose log side is first
    // pruned to dup-sized by an IN-PLAN bloom of the hit hashes, so
    // neither join side is history-sized at the shuffle. Hashes
    // absorbed after the sketch's fold point (covered_up_to < b <
    // batchCut) are a residual absorption-sized slice handled by a
    // plain exact anti-join. Result ≡ the plain anti-join for ANY
    // sketch state (law in CurationSpec); a missing/unreadable sketch
    // falls back to the plain join — the bloom is an access-path
    // choice, never a correctness dependency. SIZE GATE: the sketch's
    // extra stages cost ~2 s of fixed overhead per serve (measured,
    // SCALE.md curbloom storm), worth paying only when the log is big
    // enough that its shuffle dominates — below `bloomMinItems`
    // (default 1M ≈ tens of MB) the plain join wins and the sketch is
    // ignored; the storm forces it with bloomMinItems = 0.
    val hashes = cutHashes(s, path, batchCut)
    val bloomArt = readBloomArt(s, path, bloomMinItems)
    // the bloom split consumes the exactDedup hub three times (the
    // might/not-might splits plus the prefilter probe) — cut it ONCE
    // (the q139 localCheckpoint-hub discipline; round-15 advice found
    // the batch aggregation recomputed per consumer)
    val keepers0 = TextOps.exactDedup(batchDocs, idCol, textCol)
    val keepers =
      if (bloomArt.isDefined) keepers0.localCheckpoint(eager = true)
      else keepers0
    // with the lexical lane on, the hash-fresh keepers feed BOTH lanes
    // (vectored semi + vectorless anti) — cut the hub once
    val b1kept0 = hashFreshKeepers(keepers, hashes, bloomArt)
    val b1kept =
      if (lexicalLane) b1kept0.localCheckpoint(eager = true) else b1kept0
    val b1 = b1kept.select(col("keeper_id").as(idCol))
      .join(coveredIds, Seq(idCol), "left_semi")
    // 2. within-batch semantic dedup under the FROZEN centroids.
    // localCheckpoint at the multi-consumer hubs (the q139 discipline):
    // the routed assignment feeds the within-batch pairs, the store
    // probe AND the final cluster annotation — without the cut, every
    // consumer replays routing and everything above it
    val cents = Similarity.readSemCents(s, s"$path/sem")
    val assign = Clustering.assignToCentroidsKeepVec(
        batchVecs.join(b1.select(col(idCol).as("__k")),
          col(idCol) === col("__k")).drop("__k"),
        idCol, vecCol, cents)
      .localCheckpoint(eager = true)
    val wdrop = Similarity
      .semPairsWithin(assign, thrNum, thrDen, clusterCap, seed,
        knownDim = fenceDim)
      .select(col("drop_id").as(idCol)).distinct()
    // b2 derives from the CUT assignment, not from b1: assign's id set
    // IS b1 (every b1 id is covered, so its vector quantizes non-null
    // and survives routing), and reading it from the checkpoint spares
    // a second run of the stage-1 anti-join subtree — b1's only
    // remaining consumer is the routing input above (round-19).
    val b2 = assign.select(col("id").as(idCol))
      .join(wdrop, Seq(idCol), "left_anti")
    // 3. history semantic dedup: near-dup of any stored member drops.
    // The probe reuses the ALREADY-ROUTED assignment restricted to b2
    // (routing is per-row pure: route(vecs ⋈ b2) ≡ route(vecs ⋈ b1) ⋈
    // b2 — law in SimilaritySpec), instead of re-quantizing and
    // re-routing the batch inside the probe (round-19: one kernel pass
    // and one batch join per serve removed).
    val pdrop = Similarity.probeSemStoreRouted(s, s"$path/sem",
        assign.join(b2.select(col(idCol).as("__k")),
          col("id") === col("__k")).drop("__k"),
        thrNum, thrDen, clusterCap, seed,
        batchCut = batchCut, knownDim = fenceDim)
      .select(col("batch_id").as(idCol)).distinct()
    val b3docs = batchDocs.join(b2.join(pdrop, Seq(idCol), "left_anti"),
        Seq(idCol))
      .localCheckpoint(eager = true) // NB scoring + survivor join
    // 4. quality: frozen NB, keep self-consistent labels
    val pred = TextOps.scoreNbBatch(s, s"$path/nb", b3docs, idCol, textCol)
    val b4 = b3docs.join(pred, Seq(idCol))
      .filter(col("pred") === col(labelCol))
      .select(idCol, srcCol, labelCol, textCol)
      .localCheckpoint(eager = true) // BPE counts + DSIR score + output
    // 5. annotate: frozen BPE token counts + frozen DSIR score
    val merges = TextOps.readBpeMerges(s, s"$path/bpe")
    val counted = TextOps.bpeTokenCounts(b4, idCol, textCol, merges)
    val scored = Sampling.scoreDsirBatchAll(s, s"$path/dsir", b4,
      idCol, srcCol, textCol, seed)
    val vectored = b4.join(counted, Seq(idCol))
      .join(scored.select(col(idCol), col("dsir_score")), Seq(idCol))
      .join(assign.select(col("id").as(idCol),
        col("cluster").cast("int").as("cluster")), Seq(idCol))
      .select(col(idCol), col(srcCol), col(labelCol), col("cluster"),
        col("bpe_tokens"), col("dsir_score"))
    if (!lexicalLane) vectored
    else {
      // lexical lane: hash-fresh keepers with NO vector run stages
      // 4 + 5 only (no cluster to route, no pairs to lose) and carry a
      // null cluster — the frozen models are the same broadcast tables
      // the vectored lane reads, so the lane adds batch-sized work only
      val lexDocs = batchDocs
        .join(b1kept.select(col("keeper_id").as(idCol))
          .join(coveredIds, Seq(idCol), "left_anti"), Seq(idCol))
        .localCheckpoint(eager = true) // NB scoring + survivor join
      val lpred = TextOps.scoreNbBatch(s, s"$path/nb", lexDocs,
        idCol, textCol)
      val l4 = lexDocs.join(lpred, Seq(idCol))
        .filter(col("pred") === col(labelCol))
        .select(idCol, srcCol, labelCol, textCol)
        .localCheckpoint(eager = true) // BPE counts + DSIR score
      val lexical = l4
        .join(TextOps.bpeTokenCounts(l4, idCol, textCol, merges),
          Seq(idCol))
        .join(Sampling.scoreDsirBatchAll(s, s"$path/dsir", l4,
            idCol, srcCol, textCol, seed)
          .select(col(idCol), col("dsir_score")), Seq(idCol))
        .select(col(idCol), col(srcCol), col(labelCol),
          lit(null).cast("int").as("cluster"),
          col("bpe_tokens"), col("dsir_score"))
      vectored.unionByName(lexical)
    }
  }

  /** Per-doc serve AUDIT: every batch doc labeled with the FIRST stage
    * that dropped it — the "why was my doc rejected" answer a
    * production curation pipeline owes its producers (the round-14
    * advice found vectorless docs vanishing with "no dedup or quality
    * reason on record"; this is the record). Verdicts, in the serve
    * path's stage order:
    *
    *   exact_dup_batch    — another batch doc with the same normalized
    *                        content is the keeper (min id wins)
    *   exact_dup_history  — the content hash is already in the log
    *   vectorless         — no non-null embedding row (see
    *                        [[serveBatch]]'s rejection contract;
    *                        lexicalLane = false only)
    *   near_dup_batch     — within-batch semantic dedup dropped it
    *   near_dup_history   — near-dup of a stored member (store wins)
    *   quality            — frozen-NB prediction ≠ its label (with the
    *                        lane on, vectorless keepers reach this too)
    *   survived           — in [[serveBatch]]'s output
    *   vectorless_curated — lexicalLane = true only: a vectorless
    *                        keeper that passed stages 1, 4 and 5 — in
    *                        the lane-on serve's output with
    *                        cluster = null
    *
    * Composes the SAME frozen-model primitives in the same order, with
    * the same parameters AND through the same access paths as
    * [[serveBatch]]: the history-hash check is the shared
    * [[hashFreshKeepers]] bloom split (round-15's verdict found the
    * audit re-shuffling the full hash log the serve path no longer
    * touches — a per-batch audit cadence put the scale-killer right
    * back on the 15-minute path; verdicts are unchanged by the ≡-plain
    * law, since bloom misses are `exact_dup_history`-false by
    * no-false-negatives). CurationSpec pins the lockstep law
    * `survived` ≡ serveBatch ids, and the q155 oracle hash-pins every
    * verdict. Cost: the serve chain once, plus batch-sized labeling
    * joins — nothing history-sized beyond what serve itself reads, now
    * including the hash check. */
  def auditBatch(s: SparkSession, path: String,
                 batchDocs: DataFrame, batchVecs: DataFrame,
                 idCol: String, vecCol: String, labelCol: String,
                 textCol: String,
                 thrNum: Long, thrDen: Long, clusterCap: Long,
                 seed: String = "graft",
                 batchCut: Option[Long] = None,
                 bloomMinItems: Long = 1000000L,
                 lexicalLane: Boolean = false): DataFrame = {
    val hashes = cutHashes(s, path, batchCut)
    val bloomArt = readBloomArt(s, path, bloomMinItems)
    // the audit always has 2+ consumers of the exactDedup hub (the
    // keeper labeling join + the hash check) — cut it once
    val keepers = TextOps.exactDedup(batchDocs, idCol, textCol)
      .localCheckpoint(eager = true)
    val keeperIds = keepers.select(col("keeper_id").as(idCol))
    // 2 consumers always (labeling join + covered split), 3 with the
    // lane on (the NB score slice) — cut the bloom-split plan once
    val hashOk = hashFreshKeepers(keepers, hashes, bloomArt)
      .select(col("keeper_id").as(idCol))
      .localCheckpoint(eager = true)
    val coveredIds = batchVecs.filter(col(vecCol).isNotNull)
      .select(col(idCol))
    // same single-peek fence dimension as serveBatch (see batchDim)
    val fenceDim = batchDim(batchVecs, vecCol)
    val b1 = hashOk.join(coveredIds, Seq(idCol), "left_semi")
    val assign = Clustering.assignToCentroidsKeepVec(
        batchVecs.join(b1.select(col(idCol).as("__k")),
          col(idCol) === col("__k")).drop("__k"),
        idCol, vecCol, Similarity.readSemCents(s, s"$path/sem"))
      .localCheckpoint(eager = true)
    val wdrop = Similarity
      .semPairsWithin(assign, thrNum, thrDen, clusterCap, seed,
        knownDim = fenceDim)
      .select(col("drop_id").as(idCol)).distinct()
    // b2 from the cut assignment (assign ids ≡ b1), as in serveBatch
    val b2 = assign.select(col("id").as(idCol))
      .join(wdrop, Seq(idCol), "left_anti")
    // routed-probe reuse, as in serveBatch (lockstep access paths)
    val pdrop = Similarity.probeSemStoreRouted(s, s"$path/sem",
        assign.join(b2.select(col(idCol).as("__k")),
          col("id") === col("__k")).drop("__k"),
        thrNum, thrDen, clusterCap, seed,
        batchCut = batchCut, knownDim = fenceDim)
      .select(col("batch_id").as(idCol)).distinct()
    val b3docs = batchDocs
      .join(b2.join(pdrop, Seq(idCol), "left_anti"), Seq(idCol))
    // with the lane on, vectorless keepers reach the NB filter too —
    // score them in the same pass (scoreNbBatch is per-doc pure, so the
    // union leaves every covered doc's prediction unchanged)
    val scoreDocs =
      if (!lexicalLane) b3docs
      else b3docs.unionByName(batchDocs.join(
        hashOk.join(coveredIds, Seq(idCol), "left_anti"), Seq(idCol)))
    val pred = TextOps.scoreNbBatch(s, s"$path/nb", scoreDocs,
      idCol, textCol)
    val vectorlessVerdict: Column =
      if (lexicalLane)
        when(col("pred") =!= col(labelCol), lit("quality"))
          .otherwise(lit("vectorless_curated"))
      else lit("vectorless")
    def tag(ids: DataFrame, name: String) =
      ids.select(col(idCol), lit(true).as(name))
    batchDocs.select(col(idCol), col(labelCol))
      .join(tag(keeperIds, "__keeper"), Seq(idCol), "left")
      .join(tag(hashOk, "__hashok"), Seq(idCol), "left")
      .join(tag(coveredIds, "__cov"), Seq(idCol), "left")
      .join(tag(wdrop, "__wd"), Seq(idCol), "left")
      .join(tag(pdrop, "__pd"), Seq(idCol), "left")
      .join(pred, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__keeper").isNull, lit("exact_dup_batch"))
          .when(col("__hashok").isNull, lit("exact_dup_history"))
          .when(col("__cov").isNull, vectorlessVerdict)
          .when(col("__wd").isNotNull, lit("near_dup_batch"))
          .when(col("__pd").isNotNull, lit("near_dup_history"))
          .when(col("pred") =!= col(labelCol), lit("quality"))
          .otherwise(lit("survived"))
          .as("verdict"))
  }
}
