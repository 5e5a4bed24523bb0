package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Frozen-artifact curation laws. The load-bearing one is containment:
  * serving a new batch against artifacts frozen on history can only be
  * MORE conservative than recurating the union with the same frozen
  * models — per-doc stages (NB, BPE, DSIR) are pure functions of the
  * stored tables, and every dedup cap a batch doc must survive is
  * easier in the union (more competitors can only push it OUT of a
  * cap, never in), so every pair the union run examines and the doc
  * loses, the serve run examines too — plus the serve run drops on
  * history hits the union run may resolve the other way. */
class CurationSpec extends SparkSpec {

  private val (thrNum, thrDen, cap, seed) = (49L, 400L, 48L, "graft-mix")
  private val sf = "/root/testdata/sf0.01"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id").as("doc_id"), col("embedding"))

  // one store serves both tests: the artifacts are frozen by contract,
  // so sharing them is exactly the production shape
  private lazy val storePath: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-curation").toString
    val path = s"$dir/store"
    Curation.writeCurationStore(
      docs.filter(col("doc_id") % 4 =!= 3),
      vecs.filter(col("doc_id") % 4 =!= 3),
      "doc_id", "embedding", "lang", "text",
      k = 8, iters = 3, numMerges = 32, maxWords = 100000,
      dsirTarget = col("source").isin("src0", "src1"),
      dsirBuckets = 256, path = path, seed = seed)
    path
  }

  test("containment law: serve(batch) ⊆ recurate(history ∪ batch) " +
       "with the same frozen models, restricted to the batch") {
    val path = storePath
    val batchDocs = docs.filter(col("doc_id") % 4 === 3)
    val batchVecs = vecs.filter(col("doc_id") % 4 === 3)
    val served = Curation.serveBatch(spark, path, batchDocs, batchVecs,
        "doc_id", "embedding", "lang", "source", "text",
        thrNum, thrDen, cap, seed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // frozen-recurate over the union: the same stages, same stored
    // models, every doc treated symmetrically (no history/batch split)
    val keepers = TextOps.exactDedup(docs, "doc_id", "text")
      .select(col("keeper_id").as("doc_id"))
    val cents = Similarity.readSemCents(spark, s"$path/sem")
    val assign = Clustering.assignToCentroidsKeepVec(
      vecs.join(keepers, Seq("doc_id")), "doc_id", "embedding", cents)
    val drop = Similarity
      .semPairsWithin(assign, thrNum, thrDen, cap, seed)
      .select(col("drop_id").as("doc_id")).distinct()
    val kept2docs = docs.join(keepers.join(drop, Seq("doc_id"), "left_anti"),
      Seq("doc_id"))
    val recurated = kept2docs
      .join(TextOps.scoreNbBatch(spark, s"$path/nb", kept2docs,
        "doc_id", "text"), Seq("doc_id"))
      .filter(col("pred") === col("lang"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchIds = batchDocs.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(served.nonEmpty, "containment law vacuous: nothing served")
    assert((batchIds -- served).nonEmpty,
      "containment law vacuous: serve dropped nothing")
    val violators = served -- (recurated & batchIds)
    assert(violators.isEmpty,
      s"serve kept docs the frozen recurate dropped: " +
        violators.toSeq.sorted.take(10).mkString(", "))
  }

  test("hash-log bloom is a pure access-path choice: serve with the " +
       "sketch ≡ serve with it deleted, including history exact-dups") {
    val path = storePath
    // a batch that GUARANTEES bloom hits: the %4=3 quarter plus exact
    // content copies of two history docs under fresh ids — the copies
    // must drop through the hash anti-join on both access paths
    val hist2 = docs.filter(col("doc_id").isin(0L, 1L))
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        col("source"), col("lang"), col("text"), col("n_chars"))
    val batchDocs = docs.filter(col("doc_id") % 4 === 3)
      .unionByName(hist2)
    val batchVecs = vecs.filter(col("doc_id") % 4 === 3)
      .unionByName(vecs.filter(col("doc_id").isin(0L, 1L))
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          col("embedding")))
    def run() = Curation.serveBatch(spark, path, batchDocs, batchVecs,
        "doc_id", "embedding", "lang", "source", "text",
        thrNum, thrDen, cap, seed,
        bloomMinItems = 0L) // force the sketch past its size gate
      .collect().map(r => (r.getLong(0), r.toString)).sortBy(_._2).toSeq
    val bloomDir = new java.io.File(s"$path/hashbloom")
    assert(bloomDir.exists(), "law vacuous: writeCurationStore wrote no sketch")
    val withBloom = run()
    org.apache.commons.io.FileUtils.deleteDirectory(bloomDir)
    val plain = run()
    assert(withBloom == plain,
      "the bloom access path changed the serve result")
    assert(!plain.exists(_._1 >= 10000000L),
      "a history exact-dup survived the hash anti-join")
    // restore the sketch for any later serve against this shared store
    Curation.writeHashBloom(spark, path, coveredUpTo = Long.MaxValue)
  }

  test("auditBatch labels every batch doc with its first-failing stage, " +
       "in lockstep with serveBatch — crafted docs hit every verdict") {
    val path = storePath
    // craft a batch that exercises every arm: the %4=3 quarter plus
    //  - 10000000+0: exact content copy of history doc 0 → exact_dup_history
    //  - 20000001/20000002: two copies of one new text; 20000001 keeps,
    //    20000002 → exact_dup_batch
    //  - 30000003: fresh text with NO embedding row → vectorless
    val hist0 = docs.filter(col("doc_id") === 0L)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        col("source"), col("lang"), col("text"), col("n_chars"))
    import spark.implicits._
    val crafted = Seq(
      (20000001L, "srcX", "en", "a crafted duplicate pair text", 29L),
      (20000002L, "srcX", "en", "a crafted duplicate pair text", 29L),
      (30000003L, "srcX", "en", "a crafted vectorless document", 29L))
      .toDF("doc_id", "source", "lang", "text", "n_chars")
    val batchDocs = docs.filter(col("doc_id") % 4 === 3)
      .unionByName(hist0).unionByName(crafted)
    val batchVecs = vecs.filter(col("doc_id") % 4 === 3)
      .unionByName(vecs.filter(col("doc_id") === 0L)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          col("embedding")))
      .unionByName(vecs.filter(col("doc_id") === 1L)
        .select(lit(20000001L).as("doc_id"), col("embedding")))
      .unionByName(vecs.filter(col("doc_id") === 2L)
        .select(lit(20000002L).as("doc_id"), col("embedding")))
    val audit = Curation.auditBatch(spark, path, batchDocs, batchVecs,
        "doc_id", "embedding", "lang", "text", thrNum, thrDen, cap, seed)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(audit.size == batchDocs.count(),
      "audit must label EVERY batch doc exactly once")
    assert(audit(10000000L) == "exact_dup_history", audit(10000000L))
    assert(audit(20000002L) == "exact_dup_batch", audit(20000002L))
    assert(audit(30000003L) == "vectorless", audit(30000003L))
    // 20000001 keeps its pair's hash but carries history doc 1's EXACT
    // vector — a stored member — so the store must win: near_dup_history
    assert(audit(20000001L) == "near_dup_history", audit(20000001L))
    val byVerdict = audit.groupBy(_._2).view.mapValues(_.size).toMap
    assert(Set("near_dup_batch", "near_dup_history", "quality")
        .exists(byVerdict.contains),
      s"audit law weak: only trivial verdicts present ($byVerdict)")
    // lockstep: 'survived' is exactly serveBatch's output id set
    val served = Curation.serveBatch(spark, path, batchDocs, batchVecs,
        "doc_id", "embedding", "lang", "source", "text",
        thrNum, thrDen, cap, seed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(audit.collect { case (id, "survived") => id }.toSet == served,
      "audit 'survived' diverged from serveBatch's output")
  }

  test("lexical lane law: lane-on ≡ lane-off on the vectored lane ∪ " +
       "the hand-composed 3-stage chain (null cluster) on the other") {
    val path = storePath
    val batchDocs = docs.filter(col("doc_id") % 4 === 3)
    // every sf0.01 fixture doc carries a vector — model an embedder
    // that has only reached half the batch (the q159 shape)
    val batchVecs = vecs.filter(col("doc_id") % 8 === 3)
    def serve(lane: Boolean) = Curation.serveBatch(spark, path,
      batchDocs, batchVecs, "doc_id", "embedding", "lang", "source",
      "text", thrNum, thrDen, cap, seed, lexicalLane = lane)
    val on = serve(lane = true).collect()
      .map(r => r.getLong(0) -> r.toString).toMap
    val off = serve(lane = false).collect()
      .map(r => r.getLong(0) -> r.toString).toMap
    // the vectored lane's rows are byte-identical to the default path
    val vectoredOn = on.filter(_._2.indexOf("null") < 0)
    assert(vectoredOn == off,
      "the lane changed the vectored lane's rows")
    // the lexical rows are the hand-composed 3-stage chain: exact dedup
    // incl. history hashes, minus covered ids, frozen-NB filter
    val lexIds = on.keySet -- off.keySet
    assert(lexIds.nonEmpty, "lane law vacuous: no vectorless survivors")
    assert(on.filter(r => lexIds(r._1)).values
        .forall(_.contains("null")),
      "a lexical-lane row carries a non-null cluster")
    val keepers = TextOps.exactDedup(batchDocs, "doc_id", "text")
      .select(col("keeper_id").as("doc_id"))
      .join(spark.read.parquet(s"$path/hashes").select("content_hash")
          .join(batchDocs.select(col("doc_id"),
            md5(TextOps.normalizeText(col("text"))).as("content_hash")),
            Seq("content_hash"))
          .select("doc_id"), Seq("doc_id"), "left_anti")
      .join(batchVecs.filter(col("embedding").isNotNull)
        .select("doc_id"), Seq("doc_id"), "left_anti")
    val lexDocs = batchDocs.join(keepers, Seq("doc_id"))
    val handIds = lexDocs
      .join(TextOps.scoreNbBatch(spark, s"$path/nb", lexDocs,
        "doc_id", "text"), Seq("doc_id"))
      .filter(col("pred") === col("lang"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lexIds == handIds,
      "lexical lane diverged from the hand-composed 3-stage chain")
    // audit lockstep extends: lane-on 'survived' ≡ vectored survivors,
    // 'vectorless_curated' ≡ the lexical survivors
    val audit = Curation.auditBatch(spark, path, batchDocs, batchVecs,
        "doc_id", "embedding", "lang", "text", thrNum, thrDen, cap,
        seed, lexicalLane = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(audit.collect { case (id, "survived") => id }.toSet ==
      off.keySet, "lane-on audit 'survived' diverged from vectored serve")
    assert(audit.collect { case (id, "vectorless_curated") => id }.toSet
      == lexIds, "'vectorless_curated' diverged from the lexical lane")
    assert(!audit.values.exists(_ == "vectorless"),
      "lane-on audit emitted the lane-off terminal verdict")
  }

  test("serve is deterministic under repartitioning and annotates " +
       "every survivor with cluster, bpe_tokens and dsir_score") {
    val path = storePath
    val batchDocs = docs.filter(col("doc_id") % 4 === 3)
    val batchVecs = vecs.filter(col("doc_id") % 4 === 3)
    def run(bd: org.apache.spark.sql.DataFrame) =
      Curation.serveBatch(spark, path, bd, batchVecs,
          "doc_id", "embedding", "lang", "source", "text",
          thrNum, thrDen, cap, seed)
        .collect().map(_.toString).sorted.toSeq
    val a = run(batchDocs)
    assert(a == run(batchDocs.repartition(13)),
      "serve changed under repartitioning")
    val out = Curation.serveBatch(spark, path, batchDocs, batchVecs,
      "doc_id", "embedding", "lang", "source", "text",
      thrNum, thrDen, cap, seed)
    assert(out.columns.toSeq == Seq("doc_id", "source", "lang",
      "cluster", "bpe_tokens", "dsir_score"))
    assert(out.filter(col("bpe_tokens") <= 0).count() == 0,
      "a served doc has no BPE tokens — annotation join broke")
  }
}
