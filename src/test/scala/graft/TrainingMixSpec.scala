package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling, TextOps}

/** End-to-end training-mix pipeline over the sf0.001 documents table:
  * near-dup dedup (keep cluster keepers) → benchmark decontamination →
  * language-stratified sampling → sequence packing. The composition a
  * pre-training data job actually runs, asserted stage by stage —
  * every operator is the same one the driver's oracle gate certifies
  * individually (q31, q44, q42, q45 shapes). */
class TrainingMixSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dedup → decontaminate → stratify → pack composes end to end") {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()

    // 1. near-dup clustering; keep one doc per cluster
    val clusters = TextOps.dedupClusters(docs, "doc_id", "text",
      n = 3, threshold = 0.8)
    val keepers = docs.join(
      clusters.filter(col("is_keeper")).select("doc_id"), Seq("doc_id"))
    val nKeepers = keepers.count()
    assert(nKeepers < nDocs, "fixtures plant near-dup pairs; some must drop")
    assert(nKeepers > nDocs / 2, "dedup must not collapse the corpus")

    // 2. decontaminate against a fake benchmark (every 50th doc)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    // left join: contamination() emits no row for docs shorter than n
    // tokens — those are shingle-less, hence uncontaminated, and must
    // survive (an inner join would silently drop them)
    val contam = TextOps.contamination(keepers, "doc_id", "text", bench)
    val clean = keepers
      .join(contam, Seq("doc_id"), "left")
      .filter(coalesce(col("contamination"), lit(0.0)) < 0.5)
      .drop("contamination")
    val benchKeepers = keepers.join(bench.select("doc_id"), Seq("doc_id")).count()
    val dropped = nKeepers - clean.count()
    // benchmark members drop (full self-overlap); NEAR-DUPS of benchmark
    // members drop too — their shingle overlap with the bench copy is
    // exactly the leak the check exists to catch. The fixtures plant a
    // handful of such cross-boundary pairs.
    assert(dropped >= benchKeepers, "every benchmark member must drop")
    assert(dropped <= benchKeepers + 10,
      s"only bench members + their few planted near-dups may drop (dropped=$dropped)")
    assert(clean.join(bench.select("doc_id"), Seq("doc_id")).isEmpty,
      "no benchmark member survives decontamination")

    // 3. stratify by language (the table's own lang tag) with
    // per-language mix weights
    val langs = clean.select("lang").distinct().collect().map(_.getString(0))
    val hotLang = langs.head
    val sampled = Sampling.stratifiedSample(clean, "lang", "doc_id",
      defaultFrac = 0.5, fracs = Map(hotLang -> 1.0))
    val perLang = clean.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampledPerLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (l, n) =>
      val frac = if (l == hotLang) 1.0 else 0.5
      assert(sampledPerLang.getOrElse(l, 0L) == math.ceil(frac * n).toLong,
        s"stratum $l missed its quota")
    }

    // 4. pack into 2048-token bins, sharded by language
    val packed = Packing.packSequences(
      sampled.select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("ws_tokens")),
      shardCol = "lang", idCol = "doc_id", tokensCol = "ws_tokens",
      budgetTokens = 2048L)
    assert(packed.count() == sampled.count(), "packing is row-preserving")
    // within every (lang, bin), token totals stay near the budget: a bin
    // only exceeds it by less than its last doc's length
    val over = packed.groupBy("lang", "bin")
      .agg(sum("ws_tokens").as("toks"), max("ws_tokens").as("maxdoc"))
      .filter(col("toks") >= lit(2048L) + col("maxdoc"))
    assert(over.isEmpty, "a bin exceeded budget + one document")

    // 5. context-window shaping: chunk the sampled docs to a 64-token
    // window (16 overlap) and verify the chunk stream carries every
    // token of every sampled document exactly once net of overlaps
    val chunked = TextOps.chunkDocuments(sampled, "doc_id", "text",
      chunkTokens = 64, overlap = 16)
    val tokensPerDoc = sampled
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val coveredPerDoc = chunked.groupBy("doc_id")
      .agg(sum(col("n_tokens")).as("c"), count(lit(1)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    coveredPerDoc.foreach { case (id, covered, k) =>
      // chunk i starts at 1 + 48·i and carries min(64, n − start + 1)
      // tokens; starts stop at min(n, max(n − overlap, 1)) so no
      // fully-redundant final chunk (already covered by the previous
      // chunk's overlap) is emitted
      val n = tokensPerDoc(id)
      val lastStart = math.min(n, math.max(n - 16L, 1L))
      val starts = 1L.to(lastStart, 48L)
      assert(starts.length.toLong == k,
        s"doc $id: wrong chunk count $k for $n tokens")
      val want = starts.map(s => math.min(64L, n - s + 1)).sum
      assert(covered == want,
        s"doc $id: chunk coverage $covered != $want over $n tokens")
    }
    assert(coveredPerDoc.map(_._1).toSet == tokensPerDoc.keySet,
      "every sampled doc must be chunked")
  }

  test("trainingMixChunks ≡ composing the individually-certified stages") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val crawl = docs.unionByName(docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(100000L)).as("doc_id"), col("text")))

    val mixed = TextOps.trainingMixChunks(crawl, "doc_id", "text",
      minQuality = 1.0, keepLangs = Seq("en"), chunkTokens = 32, overlap = 8)

    // the same semantics composed from the operators the driver oracles
    // individually: q16 gate ⋈ q15 gate → q09 keepers → q55 chunks
    val quality = TextOps.qualityScore(crawl, "doc_id", "text")
      .filter(col("quality_score") >= 1.0).select("doc_id", "quality_score")
    val lang = TextOps.languageId(crawl, "doc_id", "text")
      .filter(col("lang_pred") === "en").select("doc_id", "lang_pred")
    val survivors = crawl.join(quality, Seq("doc_id")).join(lang, Seq("doc_id"))
    val keepers = TextOps.exactDedup(survivors, "doc_id", "text")
      .select(col("keeper_id").as("doc_id"))
    val kept = survivors.join(keepers, Seq("doc_id"))
    val composed = TextOps.chunkDocuments(kept, "doc_id", "text",
      chunkTokens = 32, overlap = 8, carry = Seq("lang_pred", "quality_score"))

    val key = Seq("doc_id", "chunk_idx")
    val a = mixed.orderBy(key.head, key.tail: _*).collect()
    val b = composed.select(mixed.columns.map(col): _*)
      .orderBy(key.head, key.tail: _*).collect()
    assert(a.nonEmpty, "mix produced no chunks — fixture or gates broken")
    assert(a.sameElements(b), "one-pass mix diverged from the composition")

    // the staged re-crawl must have collapsed: min-id keepers only
    assert(mixed.filter(col("doc_id") >= 100000L).isEmpty,
      "a re-crawl copy survived keep-first dedup")
  }
}
