package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e"),
    (2L, "a b c d e"),            // exact dup of 1
    (3L, "a b c d x"),            // near dup of 1 (3-gram jaccard 2/4 = 0.5)
    (4L, "z y x w v u t")         // unrelated
  ).toDF("doc_id", "text")

  test("shingles produces distinct ordered word n-grams, short docs → empty") {
    val sh = Seq(("a b c d", 1L)).toDF("t", "id")
      .select(TextOps.shingles(col("t"), 3).as("s")).first().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq(("a b", 1L)).toDF("t", "id")
      .select(TextOps.shingles(col("t"), 3).as("s")).first().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("exactDedup groups identical (normalized) content") {
    val out = TextOps.exactDedup(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupGroup.getAs[Long]("keeper_id") == 1L)
    // normalization: case + whitespace collapse
    val messy = Seq((1L, "Hello  World"), (2L, "hello world")).toDF("doc_id", "text")
    assert(TextOps.exactDedup(messy, "doc_id", "text").count() == 1)
  }

  test("jaccardPairs computes exact n-gram jaccard") {
    val pairs = TextOps.jaccardPairs(docs, "doc_id", "text", 3, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // doc1/doc2 identical → 1.0; doc1/doc3 and doc2/doc3 share 1 of
    // (3+3-1)=... shingles(1)={abc,bcd,cde}, shingles(3)={abc,bcd,cdx}:
    // inter=2? no: {abc,bcd} common → 2/(3+3-2)=0.5
    assert(pairs == Set((1L, 2L, 1.0), (1L, 3L, 0.5), (2L, 3L, 0.5)))
  }

  test("posting cap: a stop-shingle corpus completes and keeps discriminative pairs") {
    // every doc shares the same 5-token prefix (stop-shingles in ALL
    // docs); docs 1/2 additionally share a distinctive tail. Capping
    // postings below the corpus size drops the stop-shingles but must
    // keep the pair found through discriminative shingles.
    val stop = "the quick brown fox jumps"
    val corpus = ((1 to 20).map {
      case 1 => (1L, s"$stop alpha beta gamma delta epsilon")
      case 2 => (2L, s"$stop alpha beta gamma delta zeta")
      case i => (i.toLong, s"$stop u${i}a u${i}b u${i}c u${i}d u${i}e")
    }).toDF("doc_id", "text")
    val capped = TextOps.jaccardPairs(corpus, "doc_id", "text", 3, 0.3,
        maxPostings = Some(10)) // < 20 docs → stop-shingles dropped
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
    // exact mode agrees on the discriminative pair (values differ — the
    // cap removes stop-shingle intersections — but detection matches)
    val exact = TextOps.jaccardPairs(corpus, "doc_id", "text", 3, 0.3,
        maxPostings = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((1L, 2L)))
  }

  test("maxPostings beyond the hard ceiling is rejected, not silently clamped") {
    val ex = intercept[IllegalArgumentException] {
      TextOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5,
        maxPostings = Some(TextOps.HardMaxPostings + 1))
    }
    assert(ex.getMessage.contains("HardMaxPostings"))
  }

  test("minhash signature similarity approximates jaccard") {
    val sig = TextOps.minhashSignatures(docs, "doc_id", "text", 3, 64)
      .collect().map(r => r.getLong(0) -> (1 to 64).map(i => r.getLong(i))).toMap
    assert(sig(1L) == sig(2L)) // identical docs → identical signatures
    val agree13 = sig(1L).zip(sig(3L)).count { case (a, b) => a == b } / 64.0
    assert(agree13 > 0.2 && agree13 < 0.8, s"estimate $agree13 for true 0.5")
    val agree14 = sig(1L).zip(sig(4L)).count { case (a, b) => a == b } / 64.0
    assert(agree14 < 0.2, s"unrelated docs estimate $agree14")
  }

  test("minhashDedupPairs finds the same pairs as exact jaccard at 0.8 (sf0.001)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TextOps.jaccardPairs(d, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextOps.minhashDedupPairs(d, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH ${lsh.size} vs exact ${exact.size}")
    assert(exact.nonEmpty) // the fixture plants near-dups
  }

  test("simhash: identical docs get identical fingerprints, near-dups close") {
    val sh = TextOps.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    val d13 = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val d14 = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(d13 < d14, s"near-dup distance $d13 should beat unrelated $d14")
  }

  test("simhashPairs returns pairs within the hamming budget") {
    val pairs = TextOps.simhashPairs(docs, "doc_id", "text", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("languageId: marker argmax with deterministic ties") {
    val d = Seq(
      (1L, "the cat and the dog of the town is a pet"),
      (2L, "der hund und die katze ist ein tier"),
      (3L, "el perro es un animal de la casa")
    ).toDF("doc_id", "text")
    val out = TextOps.languageId(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "es")
  }

  test("tokenCounts: whitespace vs bpe-ish sub-tokens") {
    val d = Seq((1L, "hello world42, ok.")).toDF("doc_id", "text")
    val r = TextOps.tokenCounts(d, "doc_id", "text").first()
    assert(r.getAs[Long]("ws_tokens") == 3)
    // hello | world | 4 | 2 | , | ok | . = 7
    assert(r.getAs[Long]("bpe_tokens") == 7)
  }

  test("docFingerprint is order-sensitive; winnowed fingerprints are not empty") {
    val d = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fp = TextOps.docFingerprint(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) != fp(2L))
    val wf = TextOps.winnowedFingerprints(docs, "doc_id", "text", 3, 2)
    assert(wf.filter(col("doc_id") === 1L).count() >= 1)
    // identical docs share the full winnowed set
    val s1 = wf.filter(col("doc_id") === 1L).select("fingerprint").collect().toSet
    val s2 = wf.filter(col("doc_id") === 2L).select("fingerprint").collect().toSet
    assert(s1.map(_.getLong(0)) == s2.map(_.getLong(0)))
  }

  test("qualityScore features are in range") {
    val out = TextOps.qualityScore(docs, "doc_id", "text").collect()
    out.foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0 && r.getAs[Double]("punct_ratio") <= 1)
      assert(r.getAs[Double]("quality_score") >= 0 && r.getAs[Double]("quality_score") <= 1)
    }
  }

  test("repetitionScore counts sliding 3-grams and their duplication by hand") {
    val d = Seq(
      (1L, "a b a b a"),   // 3-grams: "a b a","b a b","a b a" → 3 total, 2 distinct
      (2L, "x y"),         // shorter than n → all zeros
      (3L, "p q r s")      // 2 total, both distinct → ratio 0
    ).toDF("doc_id", "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = TextOps.repetitionScore(d, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (3L, 2L, 0.333333))
    assert(out(2L) == (0L, 0L, 0.0))
    assert(out(3L) == (2L, 2L, 0.0))
    // null text scores zero (size(null) is −1 under legacy sizeOfNull —
    // must never leak out as a count)
    assert(out(4L) == (0L, 0L, 0.0))
  }

  test("redactPii counts before redacting and never double-counts email digits") {
    val d = Seq(
      (1L, "write bob.smith+x@mail-host.co.uk or call 08155551234 now"),
      (2L, "ids 123456 are short but 1234567 is a run"),
      (3L, "clean text only")
    ).toDF("id", "text")
    val out = TextOps.redactPii(d, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (1L, 1L, "write <EMAIL> or call <NUM> now"))
    // 123456 (6 digits) survives; 1234567 (7) is a run
    assert(out(2L) == (0L, 1L, "ids 123456 are short but <NUM> is a run"))
    assert(out(3L) == (0L, 0L, "clean text only"))
  }

  test("chunkDocuments covers every token with the declared overlap") {
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
      .union(Seq((2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    // null text yields no chunks — not a sequence(1, −1) crash
    val out = TextOps.chunkDocuments(d, "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    // stride 3: starts 1,4,7 — a 4th start at 10 would re-emit only
    // tokens already inside chunk 2's overlap, so it is not generated
    assert(out.toSeq == Seq(
      (0L, "t1 t2 t3 t4", 4L),
      (1L, "t4 t5 t6 t7", 4L),
      (2L, "t7 t8 t9 t10", 4L)))
    // law on the fixture: concatenating chunks minus overlaps re-forms
    // each document exactly
    val fix = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rebuilt = TextOps.chunkDocuments(fix, "doc_id", "text", 32, 8)
      .orderBy("doc_id", "chunk_idx")
      .collect().groupBy(_.getLong(0)).map { case (id, rows) =>
        val texts = rows.sortBy(_.getLong(1)).map(_.getString(2))
        id -> (texts.head +: texts.tail.map(_.split(" ").drop(8).mkString(" ")))
          .filter(_.nonEmpty).mkString(" ")
      }
    val want = fix.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt == want)
  }

  test("normalizeText lowercases, trims and collapses whitespace") {
    val d = Seq((1L, "  Foo\t BAR   baz ")).toDF("id", "text")
    val got = d.select(TextOps.normalizeText(col("text"))).head.getString(0)
    assert(got == "foo bar baz")
  }

  test("incremental dedup ≡ full recompute restricted to batch-touching pairs") {
    // history-history dups (1,2)/(4,5) must NOT re-emit; new-old
    // (8↔1,2,3 and 16↔4,5) and new-new (24,32) must
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d x"),
      (4L, "z y x w v u t"), (5L, "z y x w v u t"),
      (8L, "a b c d e"),
      (16L, "z y x w v u t"),
      (24L, "q r s t u v w"), (32L, "q r s t u v w"),
      (40L, "completely different words here entirely")
    ).toDF("doc_id", "text")
    val isNew = col("doc_id") % 8 === 0
    // the store as production holds it: history ingest + appended batch
    val store = TextOps.signatureStore(corpus.filter(!isNew), "doc_id", "text")
      .unionByName(TextOps.signatureStore(corpus.filter(isNew), "doc_id", "text"))
    val inc = TextOps.incrementalDedupPairs(
        store, corpus, "doc_id", "text", isNew, 3, 0.5)
      .orderBy("id_a", "id_b").collect().toSeq
    val full = TextOps.minhashDedupPairs(corpus, "doc_id", "text", 3, 0.5)
      .filter(col("id_a") % 8 === 0 || col("id_b") % 8 === 0)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(inc == full, "probe-the-store diverged from the full recompute")
    assert(inc.size >= 5, s"fixture must exercise new-old and new-new pairs: $inc")
    assert(inc.forall(r => r.getLong(0) % 8 == 0 || r.getLong(1) % 8 == 0),
      "a pair with no new endpoint leaked out")
  }

  test("incremental dedup with no new rows returns no pairs") {
    val corpus = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val store = TextOps.signatureStore(corpus, "doc_id", "text")
    assert(TextOps.incrementalDedupPairs(
      store, corpus, "doc_id", "text", lit(false)).count() == 0)
  }

  test("pruned partitioned store ≡ full store candidates; scan is partition-pruned") {
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d x"),
      (4L, "z y x w v u t"), (5L, "z y x w v u t"),
      (8L, "a b c d e"), (16L, "z y x w v u t"),
      (24L, "q r s t u v w"), (32L, "q r s t u v w"),
      (40L, "completely different words here entirely")
    ).toDF("doc_id", "text")
    val isNew = col("doc_id") % 8 === 0
    val parts = 64
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prunedstore").toString
    TextOps.writeSignatureStorePartitioned(
      TextOps.signatureStore(corpus.filter(!isNew), "doc_id", "text"),
      tmp, parts)
    val batchBands = TextOps.signatureStore(corpus.filter(isNew), "doc_id", "text")
    TextOps.writeSignatureStorePartitioned(batchBands, tmp, parts, mode = "append")
    val pruned = TextOps.prunedSignatureStore(spark, tmp, parts, batchBands)
    // equal-key rows hash to the same partition → no candidate can be
    // lost by pruning (the law the 100 TB layout rests on)
    val viaPruned = TextOps.incrementalCandidates(pruned, "doc_id", isNew)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = TextOps.signatureStore(corpus.filter(!isNew), "doc_id", "text")
      .unionByName(batchBands)
    val viaFull = TextOps.incrementalCandidates(full, "doc_id", isNew)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPruned == viaFull && viaPruned.nonEmpty,
      s"pruning changed the candidate set: $viaPruned vs $viaFull")
    // and the pruning is real: a static partition filter on bk_part
    // reaches the scan, so unmatched directories are never opened
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bk_part"),
      s"bk_part partition filter missing from the pruned scan:\n$plan")
  }

  test("removeDuplicatedBlocks keeps first occurrence, rebuilds in order") {
    // doc 1: blocks [A, B]; doc 2: blocks [A, C] (A repeated — doc 2's
    // copy must drop); doc 3: all blocks repeated → vanishes entirely
    val a = (1 to 4).map(i => s"a$i").mkString(" ")
    val b = (1 to 4).map(i => s"b$i").mkString(" ")
    val c = (1 to 4).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a $b"), (2L, s"$a $c"), (3L, s"$a $b")
    ).toDF("doc_id", "text")
    val got = TextOps.removeDuplicatedBlocks(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, s"$a $b", 2L), (2L, c, 1L)),
      s"got $got")
  }

  test("removeDuplicatedBlocks with no repeats is the identity") {
    val docs = Seq((1L, "x1 x2 x3"), (2L, "y1 y2")).toDF("doc_id", "text")
    val got = TextOps.removeDuplicatedBlocks(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "x1 x2 x3"), (2L, "y1 y2")))
  }

  test("removeDuplicatedBlocks drops an intra-doc repeat too") {
    val blk = "r1 r2 r3 r4"
    val docs = Seq((5L, s"$blk $blk tail")).toDF("doc_id", "text")
    val got = TextOps.removeDuplicatedBlocks(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((5L, s"$blk tail", 2L)))
  }

  test("bm25TopK matches the hand-computed formula on a tiny corpus") {
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "cherry date egg")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple cherry")).toDF("qid", "qtext")
    val got = TextOps.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 3)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3))).toSet
    // hand computation, same constants k1=1.2 b=0.75
    val n = 3.0; val avgdl = 8.0 / 3.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1)
    def contrib(df: Double, tf: Double, dl: Double) =
      math.rint(idf(df) * tf * 2.2 /
        (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6) / 1e6
    val d1 = contrib(1, 2, 3)           // apple in doc 1
    val d2 = contrib(2, 1, 2)           // cherry in doc 2
    val d3 = contrib(2, 1, 3)           // cherry in doc 3
    // cherry in the shorter doc 2 outranks doc 3; apple's rarity wins
    val expected = Seq((1L, d1), (2L, d2), (3L, d3))
      .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, s), i) => (id, (i + 1).toLong, s) }.toSet
    assert(got == expected, s"got $got want $expected")
  }

  test("indexed bm25 ≡ direct bm25; the probe is partition-pruned") {
    val docs = Seq(
      (1L, "apple banana apple kiwi"), (2L, "banana cherry plum"),
      (3L, "cherry date egg fig"), (4L, "kiwi plum apple"),
      (5L, "unrelated words entirely different")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple cherry")).toDF("qid", "qtext")
    val direct = TextOps.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted
    val parts = 32
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-postidx-spec").toString
    TextOps.writePostingIndex(docs, "doc_id", "text", tmp, parts)
    val indexed = TextOps.bm25TopKIndexed(spark, tmp, parts,
      queries, "qid", "qtext", k = 5)
    assert(indexed.collect().map(_.toString).sorted.sameElements(direct),
      "index changed the scores — it must only change what is read")
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tp#"),
      s"term-partition filter missing from the index probe:\n$plan")
  }

  test("indexed-after-appends ≡ direct over the unioned corpus, and an " +
       "increment writes only to its term-hash partitions") {
    val history = Seq(
      (1L, "apple banana apple kiwi"), (2L, "banana cherry plum"),
      (3L, "cherry date egg fig")).toDF("doc_id", "text")
    val batch = Seq(
      (4L, "kiwi plum apple"), (5L, "apple apple cherry date"),
      (6L, "unrelated words entirely different")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple cherry"), (200L, "kiwi fig"))
      .toDF("qid", "qtext")
    val parts = 32
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-postidx-incr-spec").toString
    TextOps.writePostingIndex(history, "doc_id", "text", tmp, parts)
    def files(sub: String): Map[String, Set[String]] = {
      val root = new java.io.File(s"$tmp/$sub")
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("tp="))
        .map(d => d.getName ->
          d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    val before = files("postings")
    TextOps.appendToPostingIndex(batch, "doc_id", "text", tmp, parts)
    val after = files("postings")
    // the batch's terms hash to a bounded partition set — every OTHER
    // partition directory must be byte-identical (no files added)
    val batchParts = batch
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .select(pmod(xxhash64(col("term")), lit(parts.toLong)).cast("int"))
      .distinct().collect().map(r => s"tp=${r.getInt(0)}").toSet
    val touched = after.keySet.filter(d =>
      after(d) != before.getOrElse(d, Set.empty[String]))
    assert(touched.nonEmpty && touched.subsetOf(batchParts),
      s"append touched non-batch partitions: ${touched -- batchParts}")
    // the law: maintenance changes when rows are written, never what
    // is computed — indexed over (history ++ appended batch) must be
    // bit-identical to direct BM25 over the union
    val direct = TextOps.bm25TopK(history.union(batch), "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted
    val indexed = TextOps.bm25TopKIndexed(spark, tmp, parts,
        queries, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted
    assert(indexed.sameElements(direct),
      s"append drifted from direct:\n${indexed.mkString("\n")}\nvs\n${direct.mkString("\n")}")
  }

  test("versioned index time travel: as-of N ≡ direct over batches ≤ N " +
       "for every N; the cut is a partition filter") {
    val b0 = Seq(
      (1L, "apple banana apple kiwi"), (2L, "banana cherry plum")
    ).toDF("doc_id", "text")
    val b1 = Seq(
      (3L, "cherry date egg fig"), (4L, "kiwi plum apple")
    ).toDF("doc_id", "text")
    val b2 = Seq(
      (5L, "apple apple cherry date"), (6L, "unrelated words entirely")
    ).toDF("doc_id", "text")
    val queries = Seq((100L, "apple cherry"), (200L, "kiwi fig"))
      .toDF("qid", "qtext")
    val parts = 32
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-postidx-asof-spec").toString
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      TextOps.writePostingIndexVersioned(b, "doc_id", "text", tmp, parts, i)
    }
    def direct(c: org.apache.spark.sql.DataFrame) =
      TextOps.bm25TopK(c, "doc_id", "text", queries, "qid", "qtext", k = 5)
        .collect().map(_.toString).sorted.toSeq
    val cuts = Seq(
      0L -> b0, 1L -> b0.union(b1), 2L -> b0.union(b1).union(b2))
    cuts.foreach { case (n, corpus) =>
      val asOf = TextOps.bm25TopKIndexed(spark, tmp, parts,
        queries, "qid", "qtext", k = 5, asOf = Some(n))
      assert(asOf.collect().map(_.toString).sorted.toSeq == direct(corpus),
        s"as-of $n drifted from the direct replay over batches <= $n")
      if (n < 2) {
        // the cut composes with term pruning as one static PARTITION
        // filter — newer batches' files are pruned at the listing,
        // never scanned-and-dropped (a data filter would read them)
        val plan = asOf.queryExecution.executedPlan.toString
        assert(plan.linesIterator.exists(l =>
            l.contains("PartitionFilters") && l.contains("b#")),
          s"as-of cut is not a partition filter:\n$plan")
      }
    }
  }

  test("foldPostingIndexVersions: every as-of ≥ the fold point reads " +
       "identically, stale batch dirs vanish, idempotent") {
    val bs = Seq(
      Seq((1L, "apple banana apple kiwi"), (2L, "banana cherry plum")),
      Seq((3L, "cherry date egg fig"), (4L, "kiwi plum apple")),
      Seq((5L, "apple apple cherry date")),
      Seq((6L, "fig plum banana date"))).map(_.toDF("doc_id", "text"))
    val queries = Seq((100L, "apple cherry"), (200L, "kiwi fig"))
      .toDF("qid", "qtext")
    val parts = 8
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-postidx-fold-spec").toString
    bs.zipWithIndex.foreach { case (b, i) =>
      TextOps.writePostingIndexVersioned(b, "doc_id", "text", tmp, parts, i)
    }
    def read(asOf: Option[Long]) =
      TextOps.bm25TopKIndexed(spark, tmp, parts, queries, "qid", "qtext",
          k = 5, asOf = asOf)
        .collect().map(_.toString).sorted.toSeq
    def bDirs(sub: String): Set[String] = {
      val root = java.nio.file.Paths.get(tmp, sub)
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p => java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("b="))
          .map(root.relativize(_).toString).toSet
      } finally s.close()
    }
    val keepCuts = Seq(Some(2L), Some(3L), None)
    val before = keepCuts.map(read)
    assert(bDirs("postings").exists(_.endsWith("b=0")), "setup: no b=0 dirs")
    TextOps.foldPostingIndexVersions(spark, tmp, upTo = 2L)
    // every read at or above the fold point is untouched
    assert(keepCuts.map(read) == before,
      "fold changed a read at or above the fold point")
    // stale batch directories are gone everywhere; the base snapshot
    // and the unfolded batch remain
    Seq("postings", "dfreq", "stats").foreach { sub =>
      val ds = bDirs(sub)
      assert(!ds.exists(d => d.endsWith("b=0") || d.endsWith("b=1")),
        s"$sub kept a folded batch dir: $ds")
      assert(ds.exists(_.endsWith("b=2")), s"$sub lost the base snapshot")
    }
    assert(bDirs("postings").exists(_.endsWith("b=3")),
      "fold touched a batch above the fold point")
    // history below the fold point is forfeited by contract: asOf 1
    // now sees only batches that escaped folding (none here ≤ 1)
    assert(read(Some(1L)).isEmpty)
    // idempotent: nothing left to merge
    TextOps.foldPostingIndexVersions(spark, tmp, upTo = 2L)
    assert(keepCuts.map(read) == before, "re-fold drifted a read")
  }

  test("legacy stats layout (b as a data column) fails appends and " +
       "folds loudly instead of mixing layouts") {
    // the round-11 layout wrote stats as bare parquet files at the
    // stats root with `b` as a data column; appending b=N/ directories
    // next to them breaks partition discovery — the store must refuse
    val docs = Seq((1L, "apple banana kiwi")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-postidx-legacy-spec").toString
    TextOps.writePostingIndexVersioned(docs, "doc_id", "text", tmp, 4, 0L)
    // forge the legacy shape: flatten stats' b=0 partition into bare
    // files carrying b as a data column
    val legacy = spark.read.parquet(s"$tmp/stats")
      .withColumn("b", col("b").cast("long")).localCheckpoint()
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$tmp/stats"))
    legacy.coalesce(1).write.parquet(s"$tmp/stats")
    val more = Seq((2L, "banana cherry plum")).toDF("doc_id", "text")
    val eAppend = intercept[IllegalArgumentException] {
      TextOps.writePostingIndexVersioned(more, "doc_id", "text", tmp, 4, 1L)
    }
    assert(eAppend.getMessage.contains("legacy layout"), eAppend.getMessage)
    val eFold = intercept[IllegalArgumentException] {
      TextOps.foldPostingIndexVersions(spark, tmp, upTo = 1L)
    }
    assert(eFold.getMessage.contains("legacy layout"), eFold.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("pruned store with an empty batch reads nothing and yields nothing") {
    val corpus = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prunedstore-empty").toString
    TextOps.writeSignatureStorePartitioned(
      TextOps.signatureStore(corpus, "doc_id", "text"), tmp, 8)
    val noBands = TextOps.signatureStore(corpus.filter(lit(false)), "doc_id", "text")
    assert(TextOps.prunedSignatureStore(spark, tmp, 8, noBands).count() == 0)
  }

  test("purge(build(A∪B), B) reads ≡ build(A); only B's term partitions " +
       "are rewritten; idempotent; unknown ids are a no-op") {
    val keep = Seq(
      (1L, "apple banana apple kiwi"), (2L, "banana cherry plum"),
      (3L, "cherry date egg fig")).toDF("doc_id", "text")
    val purged = Seq(
      (4L, "kiwi plum apple"), (5L, "apple apple cherry date")
    ).toDF("doc_id", "text")
    val queries = Seq((100L, "apple cherry"), (200L, "kiwi fig"))
      .toDF("qid", "qtext")
    val parts = 32
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-postidx-purge-spec").toString
    // purge rows must span BOTH a build batch and an append batch
    TextOps.writePostingIndex(keep.union(purged.limit(1)),
      "doc_id", "text", tmp, parts)
    TextOps.appendToPostingIndex(purged.orderBy(col("doc_id").desc).limit(1),
      "doc_id", "text", tmp, parts)
    def files(sub: String): Map[String, Set[String]] = {
      val root = new java.io.File(s"$tmp/$sub")
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("tp="))
        .map(d => d.getName ->
          d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    val before = files("postings")
    TextOps.purgeFromPostingIndex(spark, tmp, parts, purged, "doc_id", "text")
    val after = files("postings")
    val purgedParts = purged
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .select(pmod(xxhash64(col("term")), lit(parts.toLong)).cast("int"))
      .distinct().collect().map(r => s"tp=${r.getInt(0)}").toSet
    val touched = (after.keySet ++ before.keySet).filter(d =>
      after.getOrElse(d, Set.empty[String]) !=
        before.getOrElse(d, Set.empty[String]))
    assert(touched.nonEmpty && touched.subsetOf(purgedParts),
      s"purge touched partitions outside the purged docs' terms: ${touched -- purgedParts}")
    val direct = TextOps.bm25TopK(keep, "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted
    def indexed() = TextOps.bm25TopKIndexed(spark, tmp, parts,
        queries, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted
    assert(indexed().sameElements(direct),
      "purged index drifted from an index never holding the purged docs")
    // the merged corpus stats retracted exactly (negative rows summed)
    val st = spark.read.parquet(s"$tmp/stats")
      .agg(sum(col("n")), sum(col("dl_sum")), sum(col("dl_cnt"))).first()
    assert(st.getDouble(0) == 3.0 && st.getDouble(2) == 3.0,
      s"stats retraction wrong: $st")
    // idempotent: purging the same docs again changes nothing
    TextOps.purgeFromPostingIndex(spark, tmp, parts, purged, "doc_id", "text")
    assert(indexed().sameElements(direct), "second purge drifted the read")
    // unknown ids: exact no-op (retraction comes from stored rows)
    TextOps.purgeFromPostingIndex(spark, tmp, parts,
      Seq((99L, "apple never ingested")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(indexed().sameElements(direct), "unknown-id purge drifted the read")
  }

  test("signature-store purge holds the row multiset of a store built " +
       "without the purged docs, touching only their band partitions") {
    val keep = Seq((1L, "a b c d e f g h"), (2L, "q r s t u v w x"))
      .toDF("doc_id", "text")
    val purged = Seq((3L, "a b c d e f g z"), (4L, "m n o p m n o p"))
      .toDF("doc_id", "text")
    val parts = 8
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sigstore-purge").toString
    TextOps.writeSignatureStorePartitioned(
      TextOps.signatureStore(keep.union(purged), "doc_id", "text"), tmp, parts)
    def rows(path: String) = spark.read.parquet(path).drop("bk_part")
      .collect().map(_.toString).sorted
    val beforeDirs = Option(new java.io.File(tmp).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith("bk_part="))
      .map(d => d.getName ->
        d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
      .toMap
    TextOps.purgeFromSignatureStore(spark, tmp, parts, purged,
      "doc_id", "text")
    val afterDirs = Option(new java.io.File(tmp).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith("bk_part="))
      .map(d => d.getName ->
        d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
      .toMap
    val purgedParts = TextOps.signatureStore(purged, "doc_id", "text")
      .select(pmod(xxhash64(col("band_key")), lit(parts.toLong)).cast("int"))
      .distinct().collect().map(r => s"bk_part=${r.getInt(0)}").toSet
    val touched = (afterDirs.keySet ++ beforeDirs.keySet).filter(d =>
      afterDirs.getOrElse(d, Set.empty[String]) !=
        beforeDirs.getOrElse(d, Set.empty[String]))
    assert(touched.subsetOf(purgedParts),
      s"purge touched non-band partitions: ${touched -- purgedParts}")
    val fresh = java.nio.file.Files
      .createTempDirectory("graft-sigstore-fresh").toString
    TextOps.writeSignatureStorePartitioned(
      TextOps.signatureStore(keep, "doc_id", "text"), fresh, parts)
    assert(rows(tmp).sameElements(rows(fresh)),
      "purged store rows differ from a store never holding the purged docs")
  }

  test("sourceDriftKL: identical distributions score exactly zero") {
    // same token mix in every source → p = q per term → ln(1) = 0,
    // and the zero is EXACT (no float residue survives the rounding)
    val docs = Seq(
      (1L, "A", "x x y"), (2L, "A", "x y x"),
      (3L, "B", "y x x"), (4L, "B", "x x y"))
      .toDF("doc_id", "source", "text")
    val got = TextOps.sourceDriftKL(docs, "doc_id", "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("A" -> 0.0, "B" -> 0.0))
  }

  test("sourceDriftKL: divergence is positive and grows with skew") {
    val docs = Seq(
      (1L, "base", "x y z w x y z w"),
      (2L, "base", "x y z w x y z w"),
      (3L, "mild", "x y z w x x y z"),   // slightly x-heavy
      (4L, "heavy", "x x x x x x x y")) // almost all x
      .toDF("doc_id", "source", "text")
    val got = TextOps.sourceDriftKL(docs, "doc_id", "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("mild") > 0.0)
    assert(got("heavy") > got("mild"),
      s"heavier skew must diverge more: $got")
  }

  test("dupGramFraction: hand-computed shared-gram shares") {
    val docs = Seq(
      (1L, "a b c d"),   // grams {a b c, b c d}
      (2L, "a b c x"),   // grams {a b c, b c x} — shares "a b c" with 1
      (3L, "z1 z2 z3"),  // one gram, unshared
      (4L, "t t")        // too short for a 3-gram → drops out
    ).toDF("doc_id", "text")
    val got = TextOps.dupGramFraction(docs, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      1L -> ((2L, 1L, 50L)),
      2L -> ((2L, 1L, 50L)),
      3L -> ((1L, 0L, 0L))))
  }

  test("dupGramFraction: exact duplicates score 100") {
    val docs = Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"))
      .toDF("doc_id", "text")
    val got = TextOps.dupGramFraction(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 100L, 2L -> 100L))
  }

  test("containmentPairs catches the quote Jaccard misses") {
    // A is wholly quoted inside the much longer B: containment(A⊆B)=1
    // but Jaccard is small — the asymmetric detector's reason to exist
    val a = "p1 p2 p3 p4 p5"
    val b = s"x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 $a y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val cont = TextOps.containmentPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    assert(cont == Set((1L, 2L, 1.0)), s"got $cont") // directed: only A⊆B
    val jac = TextOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
    assert(jac.count() == 0, "Jaccard at 0.5 should NOT pair quote+host")
  }

  test("containmentPairs: identical docs contain each other both ways") {
    val docs = Seq((1L, "m1 m2 m3 m4 m5"), (2L, "m1 m2 m3 m4 m5"))
      .toDF("doc_id", "text")
    val got = TextOps.containmentPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    assert(got == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("bigramLmScores: hand-computed add-one bigram likelihoods") {
    // corpus: "a b a" and "a b" → c12("a b")=2, c12("b a")=1,
    // c1(a)=2, c1(b)=1, V=2
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextOps.bigramLmScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lpAB = BigDecimal(math.log(3.0 / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lpBA = BigDecimal(math.log(2.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(got(1L) == ((2L, (lpAB + lpBA).toDouble)))
    assert(got(2L) == ((1L, lpAB.toDouble)))
  }

  test("bigramLmScores: sub-bigram docs drop out; empty tokens ignored") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two  words"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramLmScores(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    // doc 3's double space splits to an empty token that must not
    // create a ("two","") bigram — it still has exactly one bigram
    assert(got == Set(3L))
    val n = TextOps.bigramLmScores(docs, "doc_id", "text")
      .collect().head.getLong(1)
    assert(n == 1L)
  }

  test("bigramLmScores: formulaic text outranks shuffled text per bigram") {
    // 9 copies of one sentence + 1 scrambled doc: the repeated bigrams
    // are high-probability, the scrambled ones are near-unseen
    val common = (1L to 9L).map(i => (i, "the quick brown fox jumps"))
    val odd = Seq((10L, "fox the jumps quick brown"))
    val got = TextOps.bigramLmScores((common ++ odd).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2) / r.getLong(1)).toMap
    assert(got(1L) > got(10L),
      s"common ${got(1L)} should outscore scrambled ${got(10L)}")
  }

  test("bigramLmScores: deterministic under repartitioning") {
    val docs = (1L to 60L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 2}"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.bigramLmScores(d, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("nbTrainPredict: separable vocabularies classify correctly; " +
       "hand-computed score on a one-token doc") {
    val train = Seq(
      (1L, "sport", "goal match team goal"),
      (2L, "sport", "team match win"),
      (3L, "money", "bank loan rate"),
      (4L, "money", "rate bank bank profit")
    ).toDF("doc_id", "label", "text")
    val test = Seq(
      (10L, "goal team match"),  // pure sport vocab
      (11L, "bank rate loan"),   // pure money vocab
      (12L, "goal")              // single token — hand-checkable
    ).toDF("doc_id", "text")
    val got = TextOps.nbTrainPredict(train, test, "doc_id", "label", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(10L)._1 == "sport")
    assert(got(11L)._1 == "money")
    assert(got(12L)._1 == "sport")
    // doc 12 "goal": sport has c_goal=2, c_t=7 tokens, V=8 distinct,
    // prior ln(2/4); score = round(ln(3/15), 6) + round(ln(0.5), 6)
    val want = BigDecimal(math.rint(math.log(3.0 / 15) * 1e6) / 1e6) +
      BigDecimal(math.rint(math.log(0.5) * 1e6) / 1e6)
    assert(math.abs(got(12L)._2 - want.toDouble) < 1e-12,
      s"score ${got(12L)._2} != hand-computed $want")
  }

  test("chunkContentDefined: boundary stability — a prefix edit leaves " +
       "every chunk past the first re-aligned boundary byte-identical") {
    // deterministic body long enough to carry several boundaries
    val body = (1 to 400).map(i => s"w${i % 97}x$i").mkString(" ")
    val docs = Seq(1L -> body).toDF("doc_id", "text")
    val edited = Seq(1L -> ("inserted tokens at the front " + body))
      .toDF("doc_id", "text")
    def chunks(df: org.apache.spark.sql.DataFrame): Seq[String] =
      TextOps.chunkContentDefined(df, "doc_id", "text", k = 4, modulus = 16)
        .orderBy("chunk_idx").select("chunk_text")
        .collect().map(_.getString(0)).toSeq
    val (a, b) = (chunks(docs), chunks(edited))
    assert(a.size > 5, s"fixture too short to carry boundaries: ${a.size}")
    // the FastCDC property: boundaries are local content, so the two
    // chunk streams share their entire tail — everything after the
    // first boundary past the edit re-emerges byte-identical
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.size >= a.size - 2,
      s"only ${shared.size}/${a.size} chunks survived a prefix edit")
    // and the reassembly law: chunks concatenate back to the doc
    assert(a.mkString(" ") == body)
    // a fixed-stride grid loses EVERY chunk under the same edit (the
    // contrast that motivates content-defined cuts)
    def gridChunks(df: org.apache.spark.sql.DataFrame): Seq[String] =
      TextOps.chunkDocuments(df, "doc_id", "text", 16, 0)
        .orderBy("chunk_idx").select("chunk_text")
        .collect().map(_.getString(0)).toSeq
    val gridShared = gridChunks(docs).toSet
      .intersect(gridChunks(edited).toSet)
    assert(gridShared.size <= 1,
      s"grid unexpectedly stable (${gridShared.size} shared) — " +
        "contrast law vacuous")
  }

  test("nbScoreMargin: pred/score agree with nbScoreWith; margin is the " +
       "exact top-2 difference; single-class margin is NULL") {
    val train = Seq(
      (1L, "sport", "goal match team goal"),
      (2L, "sport", "team match win"),
      (3L, "money", "bank loan rate"),
      (4L, "money", "rate bank bank profit")
    ).toDF("doc_id", "label", "text")
    val test = Seq((10L, "goal team match"), (11L, "bank rate loan"),
      (12L, "goal")).toDF("doc_id", "text")
    val (classes, model) = TextOps.nbModelTables(train, "label", "text")
    val plain = TextOps.nbScoreWith(classes, model, test, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val marg = TextOps.nbScoreMargin(classes, model, test, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDecimal(3))).toMap
    plain.foreach { case (id, (pred, score)) =>
      assert(marg(id)._1 == pred && marg(id)._2 == score,
        s"margin scorer disagreed with nbScoreWith on $id")
    }
    // every margin is strictly positive here (no exact class ties) and
    // equals best − runner-up, already certified by the pred agreement
    assert(marg.values.forall(_._3.signum > 0))
    // one class only → no runner-up → margin NULL
    val one = TextOps.nbModelTables(train.filter(col("label") === "sport"),
      "label", "text")
    val m1 = TextOps.nbScoreMargin(one._1, one._2, test, "doc_id", "text")
      .collect()
    assert(m1.forall(r => r.isNullAt(3)))
  }

  test("nbTrainPredict: unseen tokens score the per-class smoothing " +
       "floor; all-unseen doc decided by floor+prior, ties to smaller label") {
    // classes with identical shapes: same token count, same vocab size
    // per class → identical floors; identical priors. An all-unseen doc
    // ties exactly and must go to the lexicographically smaller label.
    val train = Seq(
      (1L, "aa", "x1 x2 x3"),
      (2L, "bb", "y1 y2 y3")
    ).toDF("doc_id", "label", "text")
    val test = Seq((9L, "zz zz")).toDF("doc_id", "text")
    val got = TextOps.nbTrainPredict(train, test, "doc_id", "label", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(9L)._1 == "aa", s"tie must break to the smaller label, got ${got(9L)}")
    // floor = round(ln(1/(3+6)),6) twice, prior = round(ln(1/2),6)
    val want = 2 * (math.rint(math.log(1.0 / 9) * 1e6) / 1e6) +
      math.rint(math.log(0.5) * 1e6) / 1e6
    assert(math.abs(got(9L)._2 - want) < 1e-9)
    // zero-token docs drop out (documented inner contract)
    val empty = TextOps.nbTrainPredict(train,
      Seq((7L, "")).toDF("doc_id", "text"), "doc_id", "label", "text")
    assert(empty.count() == 0)
  }

  test("nbTrainPredict: deterministic under repartitioning") {
    val train = (1L to 40L).map(i =>
      (i, s"c${i % 3}", s"w${i % 7} w${i % 5} c${i % 3}tok w${i % 2}"))
      .toDF("doc_id", "label", "text")
    val test = (100L to 130L).map(i =>
      (i, s"w${i % 7} c${i % 3}tok w${i % 11}")).toDF("doc_id", "text")
    def run(tr: org.apache.spark.sql.DataFrame) =
      TextOps.nbTrainPredict(tr, test, "doc_id", "label", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(run(train) == run(train.repartition(11)))
  }

  test("NB store roundtrip: scoreNbBatch over the persisted model ≡ " +
       "nbTrainPredict, bit for bit (real corpus)") {
    // the train-once/score-forever law q146 relies on: every stored
    // number is an exact integer or DECIMAL(18,6), both bit-exact
    // through parquet, so a frozen model serves IDENTICAL predictions
    // — including exact-decimal argmax tie-breaks — to in-query
    // training. Real sf0.001 corpus so vocab/label shapes are honest.
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = d.filter(col("doc_id") % 4 =!= 3)
    val batch = d.filter(col("doc_id") % 4 === 3)
    val want = TextOps.nbTrainPredict(train, batch, "doc_id", "lang", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(want.nonEmpty, "roundtrip law vacuous: no predictions")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nbstore").toString
    TextOps.writeNbModel(train, "lang", "text", s"$dir/model")
    val got = TextOps.scoreNbBatch(spark, s"$dir/model", batch,
        "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, "stored-model serving diverged from in-query NB")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("dropHotSegments: planted boilerplate dies at its df threshold, " +
       "survivors rebuild in order, two-doc repeats survive") {
    import spark.implicits._
    val chrome = (1 to 10).map(i => s"chrome$i").mkString(" ") // one segment
    val pair = (1 to 10).map(i => s"pairseg$i").mkString(" ")
    def uniq(d: Int, s: Int) =
      (1 to 10).map(i => s"u${d}s${s}w$i").mkString(" ")
    // docs 1-3 share the chrome segment (df=3 → dies at minDf=3);
    // docs 4-5 share `pair` (df=2 → survives); every doc has unique
    // segments around the planted one so ordering is observable
    val docs = Seq(
      1L -> s"${uniq(1, 0)} $chrome ${uniq(1, 2)}",
      2L -> s"$chrome ${uniq(2, 1)}",
      3L -> s"${uniq(3, 0)} $chrome",
      4L -> s"${uniq(4, 0)} $pair",
      5L -> s"$pair ${uniq(5, 1)}").toDF("doc_id", "text")
    val got = TextOps.dropHotSegments(docs, "doc_id", "text",
        segLen = 10, minDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((s"${uniq(1, 0)} ${uniq(1, 2)}", 2L, 1L)),
      "chrome not cut or order lost")
    assert(got(2L) == ((uniq(2, 1), 1L, 1L)))
    assert(got(3L) == ((uniq(3, 0), 1L, 1L)))
    // df=2 repeats are NOT boilerplate at minDf=3
    assert(got(4L) == ((s"${uniq(4, 0)} $pair", 2L, 0L)))
    assert(got(5L) == ((s"$pair ${uniq(5, 1)}", 2L, 0L)))
    // at minDf=2 the pair segment dies too — threshold is live
    val strict = TextOps.dropHotSegments(docs, "doc_id", "text",
        segLen = 10, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(strict(4L) == 1L && strict(5L) == 1L)
    // identity on a boilerplate-free corpus: rebuild is exact
    val free = Seq(10L -> uniq(9, 9)).toDF("doc_id", "text")
    val id = TextOps.dropHotSegments(free, "doc_id", "text", 10, 3)
      .collect().head
    assert(id.getString(1) == uniq(9, 9) && id.getLong(3) == 0L)
  }

  test("segment-df store: counts ACCUMULATE across batches (a segment " +
       "crosses minDf only through the sum), fence hides later batches") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-segdf-spec").toString + "/store"
    val chrome = (1 to 10).map(i => s"chrome$i").mkString(" ")
    def uniq(d: Int) = (1 to 10).map(i => s"u${d}w$i").mkString(" ")
    // history: chrome appears in ONE doc (df=1 — below minDf=2);
    // batch 1: chrome in one more doc (accumulated df=2 — at threshold)
    TextOps.writeSegmentDf(
      Seq(1L -> s"$chrome ${uniq(1)}", 2L -> uniq(2)).toDF("doc_id", "text"),
      "doc_id", "text", segLen = 10, dir, batchId = 0L)
    TextOps.writeSegmentDf(
      Seq(3L -> s"${uniq(3)} $chrome").toDF("doc_id", "text"),
      "doc_id", "text", segLen = 10, dir, batchId = 1L)
    val probe = Seq(9L -> s"$chrome ${uniq(9)}").toDF("doc_id", "text")
    // cut at b<1: only history counted — chrome df=1 survives
    val r1 = TextOps.serveSegmentCut(spark, dir, probe, "doc_id", "text",
        10, minDf = 2, batchCut = Some(1L)).collect().head
    assert(r1.getString(1) == s"$chrome ${uniq(9)}" && r1.getLong(3) == 0L,
      "fence leaked batch-1 counts")
    // cut at b<2: history + batch 1 sum to df=2 — chrome dies
    val r2 = TextOps.serveSegmentCut(spark, dir, probe, "doc_id", "text",
        10, minDf = 2, batchCut = Some(2L)).collect().head
    assert(r2.getString(1) == uniq(9) && r2.getLong(3) == 1L,
      "accumulated df did not cross the threshold")
    // no-fence serve sees everything, identically to b<2 here
    val r3 = TextOps.serveSegmentCut(spark, dir, probe, "doc_id", "text",
        10, minDf = 2).collect().head
    assert(r3.getString(1) == r2.getString(1))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }
}
