package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Graphs, TextOps}

/** Scale stress for the dedup family: blow the sf0.1 documents table up
  * N× (each copy's text perturbed by one appended token → a near-dup,
  * not an exact dup), then run the LSH near-dup pipeline end to end.
  * This makes every original doc a 20-member near-dup cluster —
  * a duplicate-STORM corpus, far denser than a real crawl — so the
  * candidate path, exact verification and connected components all see
  * quadratic-per-group load (C(20,2)·5k ≈ 950k true pairs at 20×).
  * Evidence for docs/SCALE.md, not part of the driver contract. */
object Stress {
  /** Pin the file-source delivery ORDER of sequentially appended batch
    * files (round-17 advice): the crash-storm harnesses replay batches
    * with `maxFilesPerTrigger=1`, and the parquet file source orders by
    * modification time — an mtime TIE between two appends can reorder
    * batches relative to the sequential control, changing `dup_of`
    * attributions and failing the rows-diff check spuriously. After
    * each append, every not-yet-stamped data file gets an explicit
    * mtime a full minute after the previous batch's — ordering is then
    * deterministic whatever the filesystem's timestamp granularity. */
  private def stampBatchFiles(dir: String, rep: Int,
                              seen: scala.collection.mutable.Set[String]): Unit =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .filter(f => seen.add(f.getName))
      .foreach { f =>
        // a silently-failed stamp falls back to natural mtimes and
        // reintroduces the nondeterministic tie this exists to kill —
        // fail the storm loudly instead (round-19 advice)
        require(f.setLastModified(1700000000000L + rep * 60000L),
          s"setLastModified failed on ${f.getAbsolutePath} — " +
            "batch ordering would be nondeterministic")
      }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    // "all" (default = text+embed) | "text" | "embed" | "skew" | "pq" |
    // "spans" |
    // "median" | "media" | "incr" | "purge" | "asof" | "graph" — a mode flag lets one family
    // re-run without repaying the others (the text sweep alone is
    // ~5 min at 40x)
    val mode = args.lift(1).getOrElse("all")
    val spark = Engine.withGraftConfs(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    val big = base
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        concat(col("text"), lit(" copytag"), col("copy")).as("text"))
      .localCheckpoint(true)
    val n = big.count()
    println(s"[stress] corpus: $n docs (${factor}x sf0.1)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s  ($rows rows)")
    }

    if (mode == "all" || mode == "text") {
    time("exactDedup") {
      TextOps.exactDedup(big, "doc_id", "text").count()
    }
    time("minhashDedupPairs") {
      TextOps.minhashDedupPairs(big, "doc_id", "text", n = 3, threshold = 0.8).count()
    }
    time("dedupClusters") {
      TextOps.dedupClusters(big, "doc_id", "text", n = 3, threshold = 0.8).count()
    }
    time("contamination") {
      TextOps.contamination(big, "doc_id", "text",
        probes = base.filter(col("doc_id") % 100 === 0)).count()
    }
    // hot-stratum stratified sample: one stratum holds ~99.9% of the
    // corpus (the 100 TB "one source domain dominates" shape). The
    // two-phase sampler must rank only the boundary bucket, never the
    // whole hot stratum — wall-clock here tracks the histogram scans,
    // not a single-task sort of the hot stratum.
    time("stratifiedSample(hot)") {
      graft.operators.Sampling.stratifiedSample(
        big.select(col("doc_id"),
          when(col("doc_id") % 1000 === 0, lit("rare"))
            .otherwise(lit("hot")).as("stratum")),
        "stratum", "doc_id", defaultFrac = 0.1,
        fracs = Map("rare" -> 0.9)).count()
    }
    // duplicate-storm passage removal: every clique shares its prefix
    // blocks, so the block window sees maximal duplication pressure —
    // ~94% of blocks drop at 20×
    time("removeDuplicatedBlocks") {
      TextOps.removeDuplicatedBlocks(big, "doc_id", "text", 16).count()
    }
    // vocabulary over the storm corpus: the decomposed rank must stay
    // histogram-bound as token volume scales with the corpus
    time("vocabulary") {
      graft.operators.Vocab.vocabulary(big, "text", minCount = 2L).count()
    }
    // per-source cap under the same hot-stratum skew: the capped probe
    // histograms the hot domain, never sorts it in one task
    time("stratumCap(hot)") {
      graft.operators.Sampling.stratumCap(
        big.select(col("doc_id"),
          when(col("doc_id") % 1000 === 0, lit("rare"))
            .otherwise(lit("hot")).as("stratum")),
        "stratum", "doc_id", defaultCap = 10000L).count()
    }
    // retrieval: a 5-query batch (~25 distinct terms — the production
    // regime where batch terms ≪ index partitions) against the storm
    // corpus. Direct BM25 re-tokenizes the corpus per batch
    // (O(corpus)); the persisted posting index prunes the probe to the
    // ≤ |batch terms| partitions those terms hash into, each of fixed
    // row budget — I/O flat as the corpus grows. Index build is ingest
    // (amortized, printed, not a compared cell). Pruning saturates
    // gracefully for term-heavy batches (a 250-term batch at this
    // parts count reads ~half the index — degrade, not break).
    val qBatch = base.filter(col("doc_id") % 1000 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 5)).as("qtext"))
      .localCheckpoint(true)
    time("bm25 direct") {
      TextOps.bm25TopK(big, "doc_id", "text",
        qBatch, "query_id", "qtext", k = 10).count()
    }
    val idxParts = math.max(8, (n / 500L).toInt)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-stress-postidx").toString
    time("posting index write (ingest)") {
      TextOps.writePostingIndex(big, "doc_id", "text", idxDir, idxParts)
      n
    }
    time("bm25 indexed probe") {
      TextOps.bm25TopKIndexed(spark, idxDir, idxParts,
        qBatch, "query_id", "qtext", k = 10).count()
    }

    }

    if (mode == "all" || mode == "embed") {
    // embedding near-dup storm: every sf0.1 vector gains factor−1
    // deterministically perturbed copies (cosine ≥ 0.999 to the
    // original), so the corpus holds factor·2000 vectors in 2000
    // C(factor,2)-pair near-dup cliques. The banded auto-sized pair
    // engine must track that true-pair mass; the retired fixed-p=4
    // single-band shape is timed alongside as the Θ(n²/16) contrast.
    val ebig = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        expr("transform(embedding, (x, i) -> double(x) + 0.003 * (pmod(copy * 31 + i, 7) - 3))")
          .as("embedding"))
      .localCheckpoint(true)
    println(s"[stress] embeddings: ${ebig.count()} vectors (${factor}x sf0.1)")
    time("cosinePairs(banded auto)") {
      graft.operators.Similarity.cosineDedupPairsAuto(
        ebig, "vec_id", "embedding", threshold = 0.9).count()
    }
    // the fixed-band contrast only at ≤20×: its candidate term is
    // Θ(n²/16) — at 40× that is ~200M exact cosines (~30 min of
    // kernel), and the point (the quadratic term itself) is already
    // made by the 20× measurement plus the arithmetic
    if (factor <= 20) {
      time("cosinePairs(fixed p=4)") {
        graft.operators.Similarity.cosineDedupPairs(
          ebig, "vec_id", "embedding", threshold = 0.9,
          nPlanes = 4, nTables = 1).count()
      }
    }
    }

    if (mode == "pq") {
    // PQ serving storm: the perturbed-copy vector corpus at factor×,
    // a fixed 40-query batch asking for top-5. pqTopK ADC-scores every
    // corpus code (compute term linear in corpus size); ivfPqTopK
    // probes 2 of 8 lists, cutting the scoring term ~4× while paying
    // one extra (coarse) training chain — the contrast the SCALE.md
    // table records. Training chains dominate at small factors; the
    // scoring gap is what survives at 100 TB.
    val ebig = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        expr("transform(embedding, (x, i) -> double(x) + 0.003 * (pmod(copy * 31 + i, 7) - 3))")
          .as("embedding"))
      .localCheckpoint(true)
    val queries = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter(col("vec_id") % 50 === 0)
    println(s"[stress] pq corpus: ${ebig.count()} vectors (${factor}x sf0.1)")
    time("pqTopK(m=4,k8,it1)") {
      graft.operators.Similarity.pqTopK(ebig, queries, "vec_id",
        "embedding", dim = 64, m = 4, codebookK = 8, iters = 1,
        k = 5).count()
    }
    time("ivfPqTopK(8 lists/probe 2)") {
      graft.operators.Similarity.ivfPqTopK(ebig, queries, "vec_id",
        "embedding", dim = 64, nCoarse = 8, coarseIters = 1, m = 4,
        codebookK = 8, pqIters = 1, nProbe = 2, k = 5).count()
    }
    }

    if (mode == "skew") {
    // hot-key join storm: one key owns 90% of the fact side — the
    // "null-ish default id / bot user" shape. With broadcast off (the
    // skew regime: both sides too big to broadcast at 100 TB) a plain
    // shuffle join lands the hot key's entire partition on ONE
    // reducer; the salted join spreads it over `salts` reducers; AQE's
    // skew split repairs the sort-merge case at runtime. All three are
    // timed so SCALE.md carries the measured contrast, not an assertion.
    val nRows = 250000L * factor
    val fact = spark.range(nRows).select(
      col("id"),
      when(pmod(col("id"), lit(10)) < 9, lit(0L))
        .otherwise(pmod(col("id"), lit(1000))).as("k"),
      (col("id") % 97).cast("double").as("v"))
      .localCheckpoint(true)
    val dim = spark.range(1000)
      .select(col("id").as("k"), (col("id") * 2).as("w"))
      .localCheckpoint(true)
    println(s"[stress] skew fact: $nRows rows, 90% on one key")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      time("join(plain, AQE skew split)") {
        fact.join(dim, Seq("k")).count()
      }
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      time("join(plain, no skew split)") {
        fact.join(dim, Seq("k")).count()
      }
      time("join(salted x16)") {
        graft.operators.Shuffles.saltedEquiJoin(fact, dim, "k", 16).count()
      }
      // audit→action (round 14): the decision rule is one key-count
      // aggregate + a broadcast of the ≤2 keys above 50%, and only the
      // HOT dim rows replicate (1 row ×16 vs all 1000 ×16 for the
      // hand-salted form). Timed twice: end-to-end (audit inline —
      // the one-shot cost) and with the hot set precomputed (the
      // production shape: q145's audit runs once per batch window and
      // every join of the window reuses it) — the latter must track
      // the hand-salted time.
      time("join(audit-salted x16, thr 50%)") {
        graft.operators.Shuffles
          .saltedJoinBySkew(fact, dim, "k", 16, 500000L).count()
      }
      val hotSet = graft.operators.Shuffles
        .hotKeysByShare(fact, "k", 500000L).localCheckpoint(true)
      time("join(hot-set reused x16)") {
        graft.operators.Shuffles
          .saltedJoinHot(fact, dim, "k", 16, hotSet).count()
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    }
    }

    if (mode == "median") {
    // 90%-skewed exact-median storm: one source owns 90% of the
    // corpus (the hot-domain shape). The old order-statistic window
    // lands the hot source's entire partition on ONE task's sort; the
    // two-phase histogram→rank-select path keeps every stage a hash
    // aggregate, so wall-clock tracks corpus scans (linear in factor),
    // not the hot group's single-task sort. Both paths run and must
    // agree exactly; SCALE.md carries the measured contrast.
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Stats
    val nRows = 250000L * factor
    val docs = spark.range(nRows).select(
      col("id"),
      when(pmod(col("id"), lit(10)) < 9, lit("hot"))
        .otherwise(concat(lit("s"), pmod(col("id"), lit(19)))).as("source"),
      pmod(col("id") * 2654435761L, lit(1000003L)).cast("double").as("v"))
      .localCheckpoint(true)
    println(s"[stress] median corpus: $nRows rows, 90% on one source")
    var twoPhase: Map[String, Double] = Map.empty
    time("median(two-phase)") {
      val out = Stats.exactGroupedRankValues(docs, "source", "v",
        n => Seq(("med", (n + 1) / 2)))
      twoPhase = out.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      twoPhase.size.toLong
    }
    time("median(window, old shape)") {
      val w = Window.partitionBy(col("source")).orderBy(col("v"), col("id"))
      val n = docs.groupBy("source").agg(count(lit(1)).as("n"))
      val windowed = docs.withColumn("__rn", row_number().over(w))
        .join(n, "source")
        .where(col("__rn") === expr("(n + 1) DIV 2"))
        .select(col("source"), col("v"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      require(windowed == twoPhase,
        s"two-phase medians diverge from the window reference")
      windowed.size.toLong
    }
    }

    if (mode == "sem") {
    // SemDeDup storm: corpus = factor× the sf0.1 embeddings (ids
    // offset per replica), k scaled with the corpus as the paper
    // prescribes (k ≈ n/256 here) so expected cluster size stays
    // constant — the claim under test is that pair cost tracks
    // Σ_c min(|c|, cap)²/2, i.e. wall-clock follows the k-means scans
    // (linear), never a quadratic pair blow-up. k-means alone is
    // timed too, so the pairing stage's cost is the visible delta.
    import graft.operators.{Clustering, Similarity}
    val nBase = 2000L
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding"))
    val corpus = base
      .crossJoin(spark.range(factor).select(col("id").as("__rep")))
      .select((col("vec_id") + col("__rep") * nBase).as("vec_id"),
        col("embedding"))
      .localCheckpoint(true)
    val k = math.max(8L, nBase * factor / 256L).toInt
    println(s"[stress] semdedup corpus: ${nBase * factor} vectors, k=$k")
    var cents: Seq[(Int, Array[Double])] = Seq.empty
    time(s"kmeans only (k=$k, 2 iters)") {
      val (assign, cs) = Clustering.kmeansQuantized(
        corpus, "vec_id", "embedding", k = k, iters = 2)
      cents = cs
      assign.count()
    }
    // the large-k assignment contrast the two-level path exists for:
    // exact O(k·dim) per row vs the O(2√k·dim) coarse→fine route,
    // measured where ARITHMETIC dominates — a 25·factor× replicated
    // corpus, and each pass run twice so the second number excludes
    // the one-time plan/codegen cost (which is what dominates the
    // training loop at this corpus size; see SCALE.md)
    val big = corpus.crossJoin(spark.range(25).select(col("id").as("__r2")))
      .select((col("vec_id") + col("__r2") * nBase * factor).as("vec_id"),
        col("embedding"))
      .localCheckpoint(true)
    val kc = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    for (pass <- 1 to 2) {
      time(s"exact assignment over ${nBase * factor * 25} rows (k=$k, pass $pass)") {
        Clustering.assignToCentroids(big, "vec_id", "embedding", cents)
          .count()
      }
      time(s"two-level assignment (k'=$kc, pass $pass)") {
        Clustering.assignToCentroidsTwoLevel(big, "vec_id", "embedding",
          cents, coarseK = kc, coarseIters = 2).count()
      }
    }
    time("semDedupPairs end-to-end") {
      Similarity.semDedupPairs(corpus, "vec_id", "embedding",
        k = k, iters = 2, thrNum = 49L, thrDen = 400L, clusterCap = 48L)
        .count()
    }
    }

    if (mode == "fold") {
    // versioned-history storm: a 15-minute index cadence is 96
    // batches/day, and every batch adds a `b=` directory level to each
    // touched term partition — q115's fold is the retention move. Build
    // `factor` versioned batches over disjoint doc slices, fold the
    // older half into the base snapshot, and measure what the fold
    // claims: file/dir count collapses toward one level per partition,
    // reads at/above the fold point are IDENTICAL (asserted, not
    // assumed), and the fold itself costs O(folded index).
    import graft.operators.TextOps
    val parts = 32
    val nb = math.max(4, factor)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-fold-$nb"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    (0 until nb).foreach(b =>
      TextOps.writePostingIndexVersioned(docs.filter(pmod(col("doc_id"), lit(nb)) === b),
        "doc_id", "text", path, parts, b))
    println(f"[stress] built $nb versioned batches in ${(System.nanoTime()-t0)/1e9}%.1f s")
    def fileCount(): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(java.nio.file.Files.isRegularFile(_)).toLong
      } finally s.close()
    }
    val queries = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 5)).as("qtext"))
    def read() = TextOps.bm25TopKIndexed(spark, path, parts, queries,
        "query_id", "qtext", k = 10, asOf = Some(nb - 1L))
      .collect().map(_.toString).sorted.toSeq
    println(s"[stress] files pre-fold: ${fileCount()}")
    var pre: Seq[String] = Seq.empty
    time("read asOf latest (pre-fold)") { pre = read(); pre.size.toLong }
    time(s"foldVersions(upTo=${nb / 2})") {
      TextOps.foldPostingIndexVersions(spark, path, upTo = nb / 2L)
      1L
    }
    println(s"[stress] files post-fold: ${fileCount()}")
    time("read asOf latest (post-fold)") {
      val post = read()
      require(post == pre, "fold changed a read at the latest as-of")
      post.size.toLong
    }
    }

    if (mode == "incr") {
    // incremental-maintenance storm: history = the factor× corpus, the
    // increment = ONE more sf0.1-sized batch (ids disjoint above the
    // history range, text a fresh near-dup of every clique). The
    // reference's 15-minute loop recomputes derived tables from the
    // whole corpus; the incremental operators pay O(batch + output).
    // Charging is explicit: the signature store / aggregate state is
    // built at HISTORY ingest (amortized across every later increment,
    // printed but not timed into a cell); the full-recompute cell pays
    // corpus+batch signing and ALL pairs, the incremental cell pays
    // batch signing and NEW pairs only — which is exactly what each
    // strategy costs per increment in production.
    import graft.operators.Incremental
    val hi = 5000L * factor
    val batch = base
      .select((col("doc_id") + lit(hi)).as("doc_id"),
        concat(col("text"), lit(" copytagNEW")).as("text"))
      .localCheckpoint(true)
    val corpus = big.unionByName(batch)
    println(s"[stress] increment: ${batch.count()} docs over $n history docs")

    time("dedup full recompute") {
      TextOps.minhashDedupPairs(corpus, "doc_id", "text").count()
    }
    val store = TextOps.signatureStore(big, "doc_id", "text")
      .localCheckpoint(true)
    println(s"[stress] store: ${store.count()} band rows (amortized ingest)")
    time("dedup incremental") {
      val updated = store
        .unionByName(TextOps.signatureStore(batch, "doc_id", "text"))
      TextOps.incrementalDedupPairs(updated, corpus,
        "doc_id", "text", col("doc_id") >= hi).count()
    }

    // pruned-store probe: a 15-minute-SIZED batch (4 docs here — the
    // production regime is increment ≪ corpus) against the partitioned
    // store layout. Fixed row budget per partition, so parts GROWS
    // with history — the probe touches ≤ |batch band keys| partitions
    // of constant size and per-increment store I/O goes flat where the
    // monolithic layout's scan doubles with history. The store write is
    // ingest (amortized, printed, not a compared cell); each cell runs
    // 10 probes — one per simulated 15-minute cycle — so the scan term
    // dominates fixed job overheads.
    val tinyHi = hi + 1000000L
    val tiny = base.filter(col("doc_id") < 4)
      .select((col("doc_id") + lit(tinyHi)).as("doc_id"),
        concat(col("text"), lit(" copytagTINY")).as("text"))
      .localCheckpoint(true)
    val parts = math.max(8, (n * 16 / 12500L).toInt)
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-stress-sigstore").toString
    time("store partitioned write (ingest)") {
      TextOps.writeSignatureStorePartitioned(store, storeDir, parts)
      store.count()
    }
    val tinyBands = TextOps.signatureStore(tiny, "doc_id", "text")
      .localCheckpoint(true)
    TextOps.writeSignatureStorePartitioned(tinyBands, storeDir, parts,
      mode = "append")
    val isNewTiny = col("doc_id") >= tinyHi
    time("tiny cand, full scan x10") {
      (1 to 10).map { _ =>
        TextOps.incrementalCandidates(
          spark.read.parquet(storeDir).drop("bk_part"),
          "doc_id", isNewTiny).count()
      }.sum
    }
    time("tiny cand, pruned x10") {
      (1 to 10).map { _ =>
        TextOps.incrementalCandidates(
          TextOps.prunedSignatureStore(spark, storeDir, parts, tinyBands),
          "doc_id", isNewTiny).count()
      }.sum
    }
    val kept = TextOps.prunedSignatureStore(spark, storeDir, parts, tinyBands)
      .count()
    val keptParts = tinyBands
      .select(pmod(xxhash64(col("band_key")), lit(parts.toLong)).cast("int"))
      .distinct().count()
    println(s"[stress] pruned probe reads $keptParts/$parts partitions, " +
      s"$kept of ${n * 16} store rows")

    // IVF maintenance: rebuild assigns the WHOLE corpus to centroids
    // per refresh (O(n·C) kernel calls); append assigns the batch only
    // (O(batch·C)) — the embedding-index sibling of the signature-store
    // contrast above. Same storm construction as the embed mode.
    import graft.operators.Similarity
    val evec = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        expr("transform(embedding, (x, i) -> double(x) + 0.003 * (pmod(copy * 31 + i, 7) - 3))")
          .as("embedding"))
      .localCheckpoint(true)
    val nv = evec.count()
    val vHi = 5000L * factor
    val vBatch = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select((col("vec_id") + lit(vHi)).as("vec_id"),
        expr("transform(embedding, x -> double(x))").as("embedding"))
      .localCheckpoint(true)
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft-stress-ivf").toString
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(
      evec, "vec_id", "embedding", nCentroids = 64, iters = 0), ivfDir)
    println(s"[stress] ivf index: $nv vectors, 64 lists (amortized ingest)")
    // both cells pay what a refresh actually pays: assignment + the
    // index WRITE — rebuild assigns and persists the whole corpus,
    // append assigns and persists the batch partitions only
    time("ivf full rebuild") {
      val d = java.nio.file.Files
        .createTempDirectory("graft-stress-ivf-rebuild").toString
      Similarity.writeIvfIndex(Similarity.buildIvfIndex(
        evec.unionByName(vBatch), "vec_id", "embedding",
        nCentroids = 64, iters = 0), d)
      nv + 5000L
    }
    time("ivf append") {
      Similarity.appendToIvfIndex(spark, ivfDir, vBatch,
        "vec_id", "embedding")
      5000L
    }

    // exact aggregate state over factor× events + a one-copy increment
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("event_id"), col("event_type"), col("user_id"),
        col("value"))
    val evBig = ev
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select(col("event_type"),
        concat(col("user_id"), lit("#"), col("copy")).as("user_id"),
        col("value"))
      .localCheckpoint(true)
    println(s"[stress] events history: ${evBig.count()} rows")
    time("agg full recompute") {
      Incremental.aggState(evBig.unionByName(ev.select(col("event_type"),
        col("user_id"), col("value"))), Seq("event_type"), "value").count()
    }
    val aggStored = Incremental.aggState(evBig, Seq("event_type"), "value")
      .localCheckpoint(true)
    time("agg incremental merge") {
      Incremental.mergeAggState(Seq(aggStored,
        Incremental.aggState(ev, Seq("event_type"), "value")),
        Seq("event_type")).count()
    }
    time("distinct full recompute") {
      Incremental.distinctState(evBig.unionByName(ev.select(col("event_type"),
        col("user_id"), col("value"))), Seq("event_type"), "user_id").count()
    }
    val hllStored = Incremental.distinctState(evBig, Seq("event_type"), "user_id")
      .localCheckpoint(true)
    time("distinct incremental merge") {
      Incremental.mergeDistinctState(Seq(hllStored,
        Incremental.distinctState(ev, Seq("event_type"), "user_id")),
        Seq("event_type")).count()
    }
    }

    if (mode == "purge") {
    // takedown storm: a 500-doc purge batch (the realistic "remove
    // these opted-out documents" request size) against the factor×
    // posting index. The naive strategy rebuilds the index without the
    // purged docs — O(corpus) tokenize + full write per takedown; the
    // purge rewrites only the partitions the purged docs' terms hash
    // into and appends negative df/stats contributions — O(batch).
    // Build is ingest (amortized, printed, not a compared cell).
    val purgeBatch = big.filter(col("doc_id") % (n / 500L) === 0)
      .localCheckpoint(true)
    val nPurge = purgeBatch.count()
    val pParts = math.max(8, (n / 500L).toInt)
    val pDir = java.nio.file.Files
      .createTempDirectory("graft-stress-purge").toString
    time("posting index write (ingest)") {
      TextOps.writePostingIndex(big, "doc_id", "text", pDir, pParts)
      n
    }
    time("rebuild without purged") {
      val d = java.nio.file.Files
        .createTempDirectory("graft-stress-purge-rebuild").toString
      TextOps.writePostingIndex(
        big.join(broadcast(purgeBatch.select(col("doc_id"))),
          Seq("doc_id"), "left_anti"),
        "doc_id", "text", d, pParts)
      n - nPurge
    }
    time("purge in place") {
      TextOps.purgeFromPostingIndex(spark, pDir, pParts, purgeBatch,
        "doc_id", "text")
      nPurge
    }
    val touchedParts = purgeBatch
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .select(pmod(xxhash64(col("term")), lit(pParts.toLong)).cast("int"))
      .distinct().count()
    println(s"[stress] purge: $nPurge docs touched $touchedParts/$pParts " +
      "term partitions")
    }

    if (mode == "asof") {
    // time-travel storm: history accumulates as `factor` versioned
    // batches of FIXED size (doc_id mod factor ⇒ each batch ≈ |sf0.1|
    // docs at every factor — only the batch COUNT grows with the
    // storm). The claim under test: an as-of read of an early version
    // costs the version read, not the history length — the `b` cut is
    // a partition filter that composes with term pruning, so newer
    // batches' files are never listed. Flat "as-of batch 0" probe
    // across 20× → 40× (history doubles) is the evidence; the
    // full-history probe is the growing contrast cell. Build is
    // ingest (amortized, printed, not a compared cell).
    val aParts = math.max(8, (n / 500L).toInt)
    val aDir = java.nio.file.Files
      .createTempDirectory("graft-stress-asof").toString
    time(s"versioned build ($factor batches)") {
      (0L until factor.toLong).foreach { b =>
        TextOps.writePostingIndexVersioned(
          big.filter(pmod(col("doc_id"), lit(factor.toLong)) === b),
          "doc_id", "text", aDir, aParts, batch = b)
      }
      n
    }
    val aBatch = base.filter(col("doc_id") % 1000 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 5)).as("qtext"))
      .localCheckpoint(true)
    // untimed warm-up probe: the first read pays one-off plan/codegen
    // warm-up that would otherwise bias whichever cell runs first
    TextOps.bm25TopKIndexed(spark, aDir, aParts, aBatch,
      "query_id", "qtext", k = 10, asOf = Some(0L)).count()
    time("probe as-of batch 0") {
      TextOps.bm25TopKIndexed(spark, aDir, aParts, aBatch,
        "query_id", "qtext", k = 10, asOf = Some(0L)).count()
    }
    time("probe as-of mid-history") {
      TextOps.bm25TopKIndexed(spark, aDir, aParts, aBatch,
        "query_id", "qtext", k = 10, asOf = Some(factor / 2L)).count()
    }
    time("probe latest (full)") {
      TextOps.bm25TopKIndexed(spark, aDir, aParts, aBatch,
        "query_id", "qtext", k = 10, asOf = Some(factor - 1L)).count()
    }
    }

    if (mode == "media") {
    // media frame-stats storm: synthetic binaries at doubling sizes,
    // constant total bytes per tier (more files × smaller, then fewer ×
    // bigger). The one-pass kernel must be ~flat across tiers at equal
    // total bytes; the retired transform+substring shape was
    // O(frames × file_size), so its per-tier cost would double down
    // the table. Frame count doubles with file size at fixed stride,
    // so per-tier output rows also double — stats rows, ~40 B each.
    Seq((1024, 1 << 20), (256, 4 << 20), (64, 16 << 20)).foreach {
      case (files, bytes) =>
        val media = spark.range(files)
          .select(col("id").as("media_id"),
            // deterministic payload: repeat the file's 64-char sha2 hex
            // to the target size (cheap to build; md5-per-frame work is
            // length-driven, content-independent)
            expr(s"repeat(sha2(cast(id as string), 256), ${bytes / 64})")
              .cast("binary").as("media"))
          .localCheckpoint(true)
        time(f"frameStats(${files}x${bytes / (1 << 20)}MiB)") {
          graft.operators.Multimodal.sampleFrames(media, blockSize = 4096, stride = 4)
            .groupBy("media_id").agg(count(lit(1))).count()
        }
    }
    // perceptual-hash family at factor× (round 17): full-corpus banded
    // near-dup pairs, the keeper clustering, and the store serve — the
    // copies are EXACT payload dups (phash 0), so pair volume grows
    // with factor and the CC has real components to close
    import graft.operators.Multimodal
    val mbig = Multimodal.asMediaTable(big, "doc_id", "text", "image")
      .localCheckpoint(true)
    time(s"perceptualHash(${factor}x)") {
      Multimodal.perceptualHash(mbig, width = 64).count()
    }
    time(s"phashNearDups(${factor}x)") {
      Multimodal.phashNearDups(mbig, width = 64, maxDist = 3).count()
    }
    time(s"phashDedupClusters(${factor}x)") {
      Multimodal.phashDedupClusters(mbig, width = 64, maxDist = 3).count()
    }
    val ppath = s"${System.getProperty("java.io.tmpdir")}/graft-stress-phash-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ppath))
    time(s"writePhashStore(${factor}x)") {
      Multimodal.writePhashStore(mbig, width = 64, ppath)
      spark.read.parquet(s"$ppath/phash").count()
    }
    val pbatch = Multimodal.asMediaTable(
      base.limit(500).select((col("doc_id") + 100000000L).as("doc_id"),
        col("text")), "doc_id", "text", "image").localCheckpoint(true)
    time(s"servePhashDedup(500 vs ${factor}x store)") {
      Multimodal.servePhashDedup(spark, ppath, pbatch,
        width = 64, maxDist = 3).filter(col("is_fresh") === false).count()
    }
    }

    if (mode == "phashskew") {
    // Duplicate-heavy perceptual-hash storm (round 18, from the
    // round-17 hot-bucket finding): 40% of the corpus collapses onto 8
    // identical payloads — the blank-thumbnail/placeholder-GIF regime
    // that is the single most common media-dedup input and the one the
    // uncollapsed banded join melted on (one bucket per mega-cluster,
    // O(m²·chunks) pre-distinct rows). Measures the collapsed decision
    // path (clusters, store serve) at the storm factor, the all-pairs
    // contract where its own output is feasible, and the PRE-COLLAPSE
    // join shape as the measured "before" control.
    import graft.operators.{Hamming, Multimodal}
    val nClusters = 8
    val sk = big.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 4,
          concat(lit("blank thumbnail placeholder payload "),
            pmod(col("doc_id"), lit(nClusters)).cast("string")))
          .otherwise(col("text")).as("text"))
    val msk = Multimodal.asMediaTable(sk, "doc_id", "text", "image")
      .localCheckpoint(true)
    val nImg = msk.count()
    println(s"[stress] phashskew corpus: $nImg images, 40% in " +
      s"$nClusters identical clusters (~${nImg * 2 / 5 / nClusters}/cluster)")
    time(s"phashskew perceptualHash(${factor}x)") {
      Multimodal.perceptualHash(msk, width = 64).count()
    }
    time(s"phashskew dedupClusters(${factor}x)") {
      Multimodal.phashDedupClusters(msk, width = 64, maxDist = 3).count()
    }
    val ppath =
      s"${System.getProperty("java.io.tmpdir")}/graft-stress-phashskew-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ppath))
    time(s"phashskew writeStore(${factor}x)") {
      Multimodal.writePhashStore(msk, width = 64, ppath)
      spark.read.parquet(s"$ppath/phash").count()
    }
    // skewed batch: 4000 images, 40% landing in the SAME clusters the
    // store holds in bulk — the serve-side mega-bucket pressure
    val bsk = Multimodal.asMediaTable(
      sk.limit(4000).select((col("doc_id") + 900000000L).as("doc_id"),
        col("text")), "doc_id", "text", "image").localCheckpoint(true)
    time(s"phashskew serve(4k vs ${factor}x store)") {
      Multimodal.servePhashDedup(spark, ppath, bsk,
        width = 64, maxDist = 3).filter(col("is_fresh") === false).count()
    }
    // the all-pairs CONTRACT output is C(m,2)-quadratic on this input
    // by definition (each mega-cluster emits all its internal pairs) —
    // feasible at small factors, and the cost there is output-sized
    if (factor <= 10)
      time(s"phashskew nearDups all-pairs(${factor}x)") {
        Multimodal.phashNearDups(msk, width = 64, maxDist = 3).count()
      }
    else
      println(s"[stress] phashskew: SKIPPED all-pairs at ${factor}x — " +
        "the contract's own output is quadratic in cluster size on " +
        "40%-identical input (~1e9+ rows); the decision path above " +
        "(clusters/serve) is the scale surface")
    // "BEFORE" control: the pre-collapse banded self-join over ALL
    // rows (the round-17 shape), kept here as the storm's measured
    // baseline — every member of a mega-cluster lands in the same
    // (chunk, chunk_val) bucket and the join emits O(m²·chunks) rows
    // into the distinct
    if (factor <= 10)
      time(s"phashskew UNCOLLAPSED control(${factor}x)") {
        val ph = Multimodal.perceptualHash(msk, width = 64)
          .select(col("media_id"), col("dhash")).localCheckpoint(true)
        val keyed = Hamming.groupBandKeys(ph, "dhash", 64, 3)
        val l = keyed.select(col("media_id").as("id_a"),
          col("dhash").as("h_a"), col("chunk"), col("chunk_val"))
        val r = keyed.select(col("media_id").as("id_b"),
          col("dhash").as("h_b"), col("chunk"), col("chunk_val"))
        l.join(r, Seq("chunk", "chunk_val"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b", "h_a", "h_b").distinct()
          .filter(expr("bit_count(h_a ^ h_b)") <= 3)
          .count()
      }
    else
      println(s"[stress] phashskew: SKIPPED uncollapsed control at " +
        s"${factor}x — its pre-distinct join output alone is " +
        "O(m² · 4 chunks) per mega-cluster (~1e10 rows here)")
    }

    if (mode == "simhashskew") {
    // Text-lens twin of phashskew (round 19, verdict task 4): 40% of
    // the corpus carries one of 8 boilerplate texts — the template-
    // chrome/empty-page regime of web crawls, where SimHash signatures
    // collapse onto a handful of identical 32-bit values and the
    // pre-collapse banded self-join melts exactly like the media path
    // did. Measures the collapsed decision path (q191's clusters) at
    // the storm factor, the all-pairs contract where its own output is
    // feasible, and the PRE-COLLAPSE join shape as the "before" control
    // — so the text-side sparse-CC claim has the same measured row the
    // media side got in round 18.
    import graft.operators.{Hamming, TextOps}
    val nClusters = 8
    val sk = big.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 4,
          concat(lit("all rights reserved cookie banner template chrome "),
            pmod(col("doc_id"), lit(nClusters)).cast("string")))
          .otherwise(col("text")).as("text"))
      .localCheckpoint(true)
    val nDoc = sk.count()
    println(s"[stress] simhashskew corpus: $nDoc docs, 40% on " +
      s"$nClusters boilerplate texts (~${nDoc * 2 / 5 / nClusters}/cluster)")
    time(s"simhashskew simhash(${factor}x)") {
      TextOps.simhash(sk, "doc_id", "text").count()
    }
    time(s"simhashskew dedupClusters(${factor}x)") {
      TextOps.simhashDedupClusters(sk, "doc_id", "text", maxDist = 3).count()
    }
    val spath =
      s"${System.getProperty("java.io.tmpdir")}/graft-stress-simhashskew-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(spath))
    time(s"simhashskew writeStore(${factor}x)") {
      TextOps.writeSimhashStore(sk, "doc_id", "text", spath)
      spark.read.parquet(s"$spath/simhash").count()
    }
    // skewed batch: 4000 docs, 40% landing in the SAME boilerplate
    // clusters the store holds in bulk — serve-side mega-bucket
    // pressure (the media storm's probe, text lens)
    val bsk = sk.limit(4000)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    time(s"simhashskew serve(4k vs ${factor}x store)") {
      TextOps.serveSimhashDedup(spark, spath, bsk, "doc_id", "text",
        maxDist = 3).filter(col("is_fresh") === false).count()
    }
    // the all-pairs CONTRACT output is C(m,2)-quadratic on this input
    // by definition — feasible at small factors, output-sized there
    if (factor <= 10)
      time(s"simhashskew pairs all-pairs(${factor}x)") {
        TextOps.simhashPairs(sk, "doc_id", "text", maxDist = 3).count()
      }
    else
      println(s"[stress] simhashskew: SKIPPED all-pairs at ${factor}x — " +
        "the contract's own output is quadratic in cluster size on " +
        "40%-identical input; the cluster decision path above is the " +
        "scale surface")
    // "BEFORE" control: the round-17 shape — banded self-join over ALL
    // rows, every mega-cluster member in the same (chunk, chunk_val)
    // bucket, O(m²·chunks) pre-distinct rows
    if (factor <= 10)
      time(s"simhashskew UNCOLLAPSED control(${factor}x)") {
        val sh = TextOps.simhash(sk, "doc_id", "text")
          .select(col("doc_id"), col("simhash")).localCheckpoint(true)
        val keyed = Hamming.groupBandKeys(sh, "simhash",
          TextOps.SimhashBits, 3)
        val l = keyed.select(col("doc_id").as("id_a"),
          col("simhash").as("h_a"), col("chunk"), col("chunk_val"))
        val r = keyed.select(col("doc_id").as("id_b"),
          col("simhash").as("h_b"), col("chunk"), col("chunk_val"))
        l.join(r, Seq("chunk", "chunk_val"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b", "h_a", "h_b").distinct()
          .filter(expr("bit_count(h_a ^ h_b)") <= 3)
          .count()
      }
    else
      println(s"[stress] simhashskew: SKIPPED uncollapsed control at " +
        s"${factor}x — its pre-distinct join output alone is " +
        "O(m² · 4 chunks) per mega-cluster")
    }

    if (mode == "graph") {
    // iterative-operator storm: k-means and the graph family are the
    // only operators whose WORK is a fixed number of full passes, so
    // the scale claim is linearity — double the input, double the
    // per-pass cost, iteration count constant. k-means: the corpus
    // never shuffles (assignment is a projection; the update agg is
    // k·dim groups regardless of n). PageRank/LPA: two slim key
    // shuffles per round over (node, long) rows against the cached
    // src-partitioned edges.
    val gvec = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        expr("transform(embedding, (x, i) -> double(x) + 0.003 * (pmod(copy * 31 + i, 7) - 3))")
          .as("embedding"))
      .localCheckpoint(true)
    println(s"[stress] kmeans corpus: ${gvec.count()} vectors (${factor}x sf0.1)")
    time("kmeans k=8 iters=3") {
      val (a, _) = graft.operators.Clustering.kmeansQuantized(
        gvec, "vec_id", "embedding", k = 8, iters = 3)
      a.count()
    }
    // factor disjoint copies of the sf0.1 trade graph (ids shifted per
    // copy): edges scale linearly, structure per copy unchanged
    val go = Tables.orders(spark, "/root/testdata/sf0.1")
      .select(col("o_orderkey"), col("o_custkey"))
    val gl = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_orderkey"), col("l_suppkey"))
    val shift = 10000000L
    val gfwd = gl.join(go, gl("l_orderkey") === go("o_orderkey"))
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("o_custkey") * 2 + col("copy") * shift).as("src"),
        (col("l_suppkey") * 2 + 1 + col("copy") * shift).as("dst"))
    val gedges = gfwd
      .union(gfwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    println(s"[stress] trade graph: ${gedges.count()} directed edges (${factor}x sf0.1)")
    time("pageRank iters=3") {
      Graphs.pageRankFixed(gedges, iters = 3).count()
    }
    // dangling redistribution on the DIRECTED graph (every supplier
    // dangling — the worst case): per pass adds one node-sized scalar
    // aggregate + one node-sized checkpoint; cost must stay in the
    // same band as the plain run, not a new asymptotic term
    val gdir = gfwd.localCheckpoint(true)
    println(s"[stress] directed graph: ${gdir.count()} edges (all suppliers dangling)")
    time("pageRank+dangling iters=3") {
      Graphs.pageRankFixed(gdir, iters = 3,
        redistributeDangling = true).count()
    }
    time("pageRank directed iters=3") {
      Graphs.pageRankFixed(gdir, iters = 3).count()
    }
    time("labelPropagation iters=3") {
      Graphs.labelPropagation(gedges, iters = 3).count()
    }
    }

    if (mode == "lpaskew") {
    // celebrity-graph LPA storm (r16 verdict #5): the trade graph with
    // ~a third of all edges REROUTED into 3 celebrity nodes — the
    // crawl-scale shape (every page links the hub) where the per-dst
    // label count and argmax hot-spot. Measures plain vs audit-gated
    // salted on the same edges and requires identical labels (the
    // GraphsSpec ≡ law, demonstrated at storm size).
    val go = Tables.orders(spark, "/root/testdata/sf0.1")
      .select(col("o_orderkey"), col("o_custkey"))
    val gl = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_orderkey"), col("l_suppkey"))
    val shift = 10000000L
    val gfwd = gl.join(go, gl("l_orderkey") === go("o_orderkey"))
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("o_custkey") * 2 + col("copy") * shift).as("src"),
        (col("l_suppkey") * 2 + 1 + col("copy") * shift).as("dst"))
    val skewed = gfwd
      .union(gfwd.select(col("dst").as("src"), col("src").as("dst")))
      .select(col("src"),
        when(pmod(col("dst"), lit(97L)) < 30, pmod(col("dst"), lit(3L)))
          .otherwise(col("dst")).as("dst"))
      .localCheckpoint(true)
    val nEdges = skewed.count()
    val hotShare = skewed.filter(col("dst") < 3).count() * 100 / nEdges
    println(s"[stress] celebrity graph: $nEdges directed edges " +
      s"(${factor}x sf0.1), $hotShare% into 3 celebrity dsts")
    var plainLabels: Set[(Long, Long)] = null
    time("LPA plain iters=3") {
      plainLabels = Graphs.labelPropagation(skewed, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      plainLabels.size.toLong
    }
    var saltedLabels: Set[(Long, Long)] = null
    time("LPA skew-aware iters=3") {
      saltedLabels = Graphs.labelPropagationSkewAware(skewed, iters = 3,
          salts = 16, thresholdPpm = 10000L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      saltedLabels.size.toLong
    }
    require(saltedLabels == plainLabels,
      s"salted LPA diverged: ${saltedLabels.size} vs ${plainLabels.size}")
    println(s"[stress] lpaskew: salted == plain on ${plainLabels.size} labels")
    }

    if (mode == "bpe") {
    // production-merge-count storm: the q116 oracle runs 32 merges; a
    // real tokenizer runs 32k over a ~100k-word dictionary. The
    // testdata vocabulary is 31 words, so the dict here is synthetic:
    // 100k distinct Zipf-weighted pseudo-words built from a shared
    // syllable inventory (so merges find real structure). The claim
    // under test: the incremental trainer (delta counts + inverted
    // index + heap) holds the driver loop comfortably under the
    // interactive bound at 32k merges, where the full-recount
    // reference is O(merges·dict·len) and visibly cannot.
    import graft.functions.Bpe
    val syll = Array("an", "er", "in", "on", "at", "en", "es", "or",
      "te", "ti", "al", "le", "re", "se", "de", "ra", "ro", "ne",
      "li", "la", "ta", "to", "co", "ma", "qu", "ex", "ion", "ing")
    def word(i: Int): String = {
      val sb = new StringBuilder
      var h = scala.util.hashing.MurmurHash3.stringHash("w" + i)
      val n = 2 + math.floorMod(h, 4)
      var j = 0
      while (j < n) {
        h = scala.util.hashing.MurmurHash3.stringHash(i + "/" + j)
        sb ++= syll(math.floorMod(h, syll.length))
        j += 1
      }
      sb.append(('a' + math.floorMod(i, 26)).toChar) // distinctness salt
      sb.toString + (i / 26)
    }
    val nWords = 100000
    val dict = (0 until nWords)
      .map(i => (word(i), math.max(1L, 10000000L / (i + 1L)))).toArray
    require(dict.map(_._1).distinct.length == nWords, "dict collision")
    println(s"[stress] bpe dict: $nWords words, " +
      s"max merges bound ${dict.map(_._1.length - 1L).sum}")
    time("learnReference(1000)") {
      Bpe.learnReference(dict, 1000).length.toLong
    }
    for (m <- Seq(1000, 8000, 32000)) {
      time(s"learn($m) incremental") { Bpe.learn(dict, m).length.toLong }
    }
    }

    if (mode == "bpeapply") {
    // serve-path storm: ENCODING under a production 32k-merge model.
    // The memo only covers repeated words; a hapax-heavy corpus (every
    // word unique — the worst case the Zipf memo can't touch) exposes
    // the raw per-word encode cost. rank-order apply is O(merges·len)
    // per word — at 32k merges that is ~3 orders beyond the priority
    // encode's O(len²) rank-map loop the BpeModel now uses.
    import graft.functions.Bpe
    val syll = Array("an", "er", "in", "on", "at", "en", "es", "or",
      "te", "ti", "al", "le", "re", "se", "de", "ra", "ro", "ne",
      "li", "la", "ta", "to", "co", "ma", "qu", "ex", "ion", "ing")
    def word(i: Int): String = {
      val sb = new StringBuilder
      var h = scala.util.hashing.MurmurHash3.stringHash("w" + i)
      val n = 2 + math.floorMod(h, 4)
      var j = 0
      while (j < n) {
        h = scala.util.hashing.MurmurHash3.stringHash(i + "/" + j)
        sb ++= syll(math.floorMod(h, syll.length))
        j += 1
      }
      sb.toString
    }
    val dict = (0 until 100000)
      .map(i => (word(i) + ('a' + math.floorMod(i, 26)).toChar + (i / 26),
        math.max(1L, 10000000L / (i + 1L)))).toArray
    var merges: Array[(String, String)] = Array.empty
    time("learn(32000)") {
      merges = Bpe.learn(dict, 32000); merges.length.toLong
    }
    val rankOf = merges.iterator.zipWithIndex.map { case (p, i) => (p, i) }.toMap
    // factor × 10k hapax words (fresh spellings — never in the dict,
    // so nothing is memoizable), encoded once per path on the driver:
    // the per-word cost is what a map stage pays per tail word
    val hapax = (0 until 10000 * factor.toInt)
      .map(i => word(i * 7 + 3) + "x" + i).toArray
    val nPrio = time(s"priority encode (${hapax.length} hapax words)") {
      var n = 0L; hapax.foreach(w => n += Bpe.encodeWordPriority(w, rankOf, merges).length); n
    }
    val nRank = time(s"rank-order encode (${hapax.length} hapax words)") {
      var n = 0L; hapax.foreach(w => n += Bpe.encodeWord(w, merges).length); n
    }
    require(nPrio == nRank, s"encoders disagree: $nPrio vs $nRank")
    }

    if (mode == "curation") {
    // closed-loop curation storm: the q139 composition over a factor×
    // corpus (documents AND embeddings replicated with shifted ids;
    // text perturbed by a copy tag so replicas are NEAR-dups — every
    // stage keeps real work; embeddings perturbed like the graph
    // storm). The claim: the chain's cost is the SUM of its certified
    // stages' linear shapes — no stage multiplies another (each stage
    // consumes only the previous stage's id set), so factor× corpus ⇒
    // ~factor× wall-clock, never a cross-stage product.
    import graft.operators.{Clustering, Sampling, Similarity, TextOps}
    val nBase = 2000L
    val bigDocs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "source", "lang", "text")
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * 10000L).as("doc_id"),
        col("source"), col("lang"),
        concat(col("text"), lit(" copytag"), col("copy")).as("text"))
      .localCheckpoint(true)
    val bigEmb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(factor).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * 10000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "double(x) + 0.003 * (pmod(copy * 31 + i, 7) - 3))")
          .as("embedding"))
      .localCheckpoint(true)
    println(s"[stress] curation corpus: ${bigDocs.count()} docs, " +
      s"${bigEmb.count()} vectors (${factor}x sf0.1)")
    val k = math.max(8L, nBase * factor / 256L).toInt
    time(s"curation e2e (k=$k)") {
      val crawl = bigDocs
        .join(bigEmb.select(col("vec_id").as("doc_id")), Seq("doc_id"))
        .filter(col("doc_id") % 10 =!= 7)
      val d1 = TextOps.exactDedup(crawl, "doc_id", "text")
        .select(col("keeper_id").as("doc_id"))
      val e1 = bigEmb
        .join(d1.select(col("doc_id").as("vec_id")), Seq("vec_id"))
        .localCheckpoint(true)
      val (assign, cents) = Clustering.kmeansQuantized(e1, "vec_id",
        "embedding", k, 3, keepVec = true)
      val sdrop = Similarity.semPairsWithin(assign, 49L, 400L, 48L, "graft")
        .select(col("drop_id").as("doc_id")).distinct()
      val d2 = d1.join(sdrop, Seq("doc_id"), "left_anti")
      val members = assign.join(d2.select(col("doc_id").as("id")), Seq("id"))
      val bench = Clustering.assignToCentroidsKeepVec(
        bigEmb.filter(col("vec_id") % 10 === 7), "vec_id", "embedding", cents)
      val contaminated = Similarity
        .semPairsAcross(members, bench, 49L, 400L, 48L, "graft")
        .select(col("store_id").as("doc_id")).distinct()
      val docs3 = bigDocs
        .join(d2.join(contaminated, Seq("doc_id"), "left_anti"), Seq("doc_id"))
        .localCheckpoint(true)
      val pred = TextOps.nbTrainPredict(docs3.filter(col("doc_id") % 4 =!= 3),
        docs3, "doc_id", "lang", "text")
      val d4 = docs3.join(pred, Seq("doc_id"))
        .filter(col("pred") === col("lang"))
        .select("doc_id", "source", "lang", "text")
        .localCheckpoint(true)
      val merges = TextOps.bpeLearnMerges(d4, "text", 32, 100000)
      val counted = TextOps.bpeTokenCounts(d4, "doc_id", "text", merges)
        .join(d4.select("doc_id", "source"), Seq("doc_id"))
      val d5 = Sampling.budgetTake(counted, "source", "doc_id", "bpe_tokens",
        2400L * factor, Map("src0" -> 15000L * factor, "src1" -> 0L), "graft")
      val split = Sampling.splitAssign(
        assign.select(col("id").as("doc_id"), col("cluster")), "cluster",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "graft")
      d5.join(split.select("doc_id", "split"), Seq("doc_id")).count()
    }
    }

    if (mode == "semfold") {
    // sem-store history storm: a 15-minute dedup cadence is 96
    // batches/day and each batch adds b=<id> partition levels to
    // members AND pairs — foldSemStore is the retention move. Build
    // `factor` stream batches, measure a fresh batch's probe and the
    // file count, fold everything into one base snapshot, re-measure:
    // probe results must be IDENTICAL (asserted), files collapse.
    import graft.operators.Similarity
    import graft.streaming.SemStream
    val nb = math.max(4, factor)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-semfold-$nb"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val nBase = 2000L
    val ecorp = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(factor).select(col("id").as("__rep")))
      .select((col("vec_id") + col("__rep") * nBase).as("vec_id"),
        col("embedding"))
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    SemStream.init(ecorp.filter(pmod(col("vec_id"), lit(nb + 1)) === 0),
      "vec_id", "embedding", k = 16, iters = 2, path)
    (1 to nb).foreach { b =>
      SemStream.applyBatch(
        ecorp.filter(pmod(col("vec_id"), lit(nb + 1)) === b),
        "vec_id", "embedding", path, 49L, 400L, 48L, "graft", b.toLong)
    }
    println(f"[stress] built seed + $nb sem batches " +
      f"(${ecorp.count()} vectors) in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def fileCount(): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(java.nio.file.Files.isRegularFile(_)).toLong
      } finally s.close()
    }
    val probeBatch = ecorp.filter(col("vec_id") % 97 === 0)
      .limit(200).localCheckpoint(true)
    def probe() = Similarity.probeSemStore(spark, path, probeBatch,
        "vec_id", "embedding", 49L, 400L, 48L, "graft")
      .collect().map(_.toString).sorted.toSeq
    println(s"[stress] files pre-fold: ${fileCount()}")
    var pre: Seq[String] = Seq.empty
    time("probe 200 vecs (pre-fold)") { pre = probe(); pre.size.toLong }
    time(s"foldSemStore(upTo=$nb)") {
      SemStream.foldSemStore(spark, path, upTo = nb.toLong); 1L
    }
    println(s"[stress] files post-fold: ${fileCount()}")
    time("probe 200 vecs (post-fold)") {
      val post = probe()
      require(post == pre, "fold changed the probe")
      post.size.toLong
    }
    }
    if (mode == "curstream") {
    // Continuous-curation storm: the q149/q150 loop at a day's cadence.
    // `factor` crawl batches are served+absorbed in sequence against a
    // growing store (docs AND vectors replicated with perturbed text so
    // dedup keeps real work), then the serve-path history is folded and
    // one more batch served — measuring (a) how per-batch serve cost
    // grows with absorbed history, (b) what the fold collapses (files),
    // (c) the post-fold serve cost. Serve correctness across the fold
    // is spec-pinned (CurationStreamSpec) and driver-certified (q150);
    // this measures the COST story those laws ride on.
    import graft.streaming.CurationStream
    val nb = math.max(4, factor)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-curstream-$nb"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val nBase = 5000L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val e0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val reps = spark.range((nb + 2) / 4 + 1).select(col("id").as("__rep"))
    val bigD = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        col("source"), col("lang"),
        concat(col("text"), lit(" copytag"), col("__rep")).as("text"))
      .localCheckpoint(true)
    val bigE = e0.crossJoin(reps)
      .select((col("vec_id") + col("__rep") * nBase).as("doc_id"),
        col("embedding"))
      .localCheckpoint(true)
    val mod = nb + 2
    def dSlice(r: Int) = bigD.filter(pmod(col("doc_id"), lit(mod)) === r)
    def eSlice(r: Int) = bigE.filter(pmod(col("doc_id"), lit(mod)) === r)
    println(s"[stress] curation stream: ${bigD.count()} docs, " +
      s"$nb batches + 1 post-fold")
    val t0 = System.nanoTime()
    CurationStream.init(dSlice(0), eSlice(0), "doc_id", "embedding",
      "lang", "text", k = 16, iters = 2, numMerges = 32,
      maxWords = 100000, dsirTarget = col("source").isin("src0", "src1"),
      dsirBuckets = 256, path = path, seed = "graft")
    println(f"[stress] init (train all artifacts) " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    def applyB(r: Int, b: Long): Unit =
      CurationStream.applyBatch(dSlice(r), eSlice(r), "doc_id",
        "embedding", "lang", "source", "text", path,
        49L, 400L, 48L, "graft", b)
    (1 to nb).foreach { b =>
      time(f"serve+absorb batch $b%2d") { applyB(b, b.toLong); 1L }
    }
    def fileCount(): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(java.nio.file.Files.isRegularFile(_)).toLong
      } finally s.close()
    }
    println(s"[stress] files pre-fold: ${fileCount()}")
    time(s"foldStore(upTo=$nb)") {
      CurationStream.foldStore(spark, path, upTo = nb.toLong); 1L
    }
    println(s"[stress] files post-fold: ${fileCount()}")
    time("serve+absorb post-fold batch") {
      applyB(nb + 1, nb + 1L); 1L
    }
    }
    if (mode == "curbloom") {
    // Hash-log bloom storm — the r15 serve-path claim: with history
    // ≥20x the batch, the exact-dedup stage must stop moving the hash
    // log. Seed a store whose hash log is `factor`×5000 DISTINCT
    // hashes (one init — the log is the artifact under test; how rows
    // entered it is irrelevant to stage 1), then serve ONE small new
    // batch twice — with the persisted sketch present and with it
    // deleted — and report wall time plus ACTUAL shuffle-read bytes
    // from task metrics. Run at factor ≥ 40 so the log exceeds the
    // default broadcast threshold: the comparison is then the
    // default-config plan at both sizes, exactly the regime a
    // billion-row log lives in (it can never broadcast). Result
    // equality is law-pinned (CurationSpec); this measures the cost
    // story: the bloomed path's shuffled bytes must not scale with
    // the log.
    import graft.streaming.CurationStream
    import graft.operators.Curation
    val nb = math.max(40, factor)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-curbloom-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val nBase = 5000L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val e0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val reps = spark.range(nb + 1).select(col("id").as("__rep"))
    val bigD = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        col("source"), col("lang"),
        concat(col("text"), lit(" copytag"), col("__rep")).as("text"))
    // the probe batch is SMALL (500 docs, fresh rep nb so its texts
    // are new): every non-log stage then shuffles KBs, and the
    // plain-vs-bloom delta IS the log's movement
    val probeLo = nb * nBase
    val dProbe = bigD.filter(col("doc_id") >= probeLo &&
      col("doc_id") < probeLo + 500).localCheckpoint(true)
    val eProbe = e0.filter(col("vec_id") < 500)
      .select((col("vec_id") + lit(probeLo)).as("doc_id"), col("embedding"))
      .localCheckpoint(true)
    time(s"init (hash log ${nb * nBase} rows + models)") {
      CurationStream.init(bigD.filter(col("doc_id") < probeLo), e0
          .select(col("vec_id").as("doc_id"), col("embedding")),
        "doc_id", "embedding", "lang", "text", k = 16, iters = 2,
        numMerges = 32, maxWords = 100000,
        dsirTarget = col("source").isin("src0", "src1"),
        dsirBuckets = 256, path = path, seed = "graft")
      nb * nBase
    }
    val logRows = spark.read.parquet(s"$path/hashes").count()
    println(s"[stress] curbloom: hash log $logRows rows " +
      s"(${logRows / 500}x the 500-doc probe batch)")
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    val meter = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffled.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead): Unit
    }
    def meteredServe(name: String): (Double, Long, Long) = {
      spark.sparkContext.addSparkListener(meter)
      shuffled.set(0L)
      val t0 = System.nanoTime()
      val rows = Curation.serveBatch(spark, path, dProbe, eProbe,
        "doc_id", "embedding", "lang", "source", "text",
        49L, 400L, 48L, "graft", batchCut = Some(1L),
        bloomMinItems = 0L).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // storm-grade settle for the async listener bus
      spark.sparkContext.removeSparkListener(meter)
      val bytes = shuffled.get()
      println(f"[stress] curbloom serve/$name%-6s $secs%6.1f s  " +
        f"shuffleRead=${bytes / 1048576.0}%9.2f MiB  ($rows rows)")
      (secs, bytes, rows)
    }
    // the audit shares hashFreshKeepers with serve (round-16: the r15
    // verdict found auditBatch re-shuffling the full log on every
    // audited batch) — meter it through the same harness so the shared
    // access path is MEASURED shared, not just code-shared
    def meteredAudit(name: String): (Double, Long, Long) = {
      spark.sparkContext.addSparkListener(meter)
      shuffled.set(0L)
      val t0 = System.nanoTime()
      val rows = Curation.auditBatch(spark, path, dProbe, eProbe,
        "doc_id", "embedding", "lang", "text",
        49L, 400L, 48L, "graft", batchCut = Some(1L),
        bloomMinItems = 0L).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(meter)
      val bytes = shuffled.get()
      println(f"[stress] curbloom audit/$name%-6s $secs%6.1f s  " +
        f"shuffleRead=${bytes / 1048576.0}%9.2f MiB  ($rows rows)")
      (secs, bytes, rows)
    }
    meteredServe("warmup") // order-bias guard: first serve pays model
                           // reads + codegen for BOTH paths' shared tail
    val (_, bytesBloom, rowsBloom) = meteredServe("bloom")
    val (_, aBytesBloom, aRowsBloom) = meteredAudit("bloom")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$path/hashbloom"))
    val (_, bytesPlain, rowsPlain) = meteredServe("plain")
    val (_, aBytesPlain, aRowsPlain) = meteredAudit("plain")
    require(rowsBloom == rowsPlain,
      s"bloom path changed the serve: $rowsBloom vs $rowsPlain rows")
    require(aRowsBloom == aRowsPlain,
      s"bloom path changed the audit: $aRowsBloom vs $aRowsPlain rows")
    println(f"[stress] curbloom: serve shuffle-read drop " +
      f"${bytesPlain / math.max(bytesBloom, 1L).toDouble}%.1fx " +
      f"(plain ${bytesPlain / 1048576.0}%.2f MiB -> bloom " +
      f"${bytesBloom / 1048576.0}%.2f MiB)")
    println(f"[stress] curbloom: audit shuffle-read drop " +
      f"${aBytesPlain / math.max(aBytesBloom, 1L).toDouble}%.1fx " +
      f"(plain ${aBytesPlain / 1048576.0}%.2f MiB -> bloom " +
      f"${aBytesBloom / 1048576.0}%.2f MiB)")
    }
    if (mode == "spans") {
    // Span-dedup storm: (a) the full-corpus report/cut at factor× — the
    // gram exchange is the cost, it must scale with corpus tokens, not
    // pairs; (b) the incremental serve against a gram store ~factor×
    // the probe batch, bloom vs plain — the per-TOKEN store is ~150×
    // denser than curbloom's per-doc hash log, so this is the regime
    // where the prefilter pays or the op dies at 100 TB. Every 11th
    // token is copy-tagged so copies share almost no grams and the
    // store genuinely grows with factor (a shared-gram corpus would
    // dedup the store back to 1×).
    import graft.operators.SpanDedup
    val nb = math.max(20, factor)
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    val nBase = 5000L
    def tagged(reps: org.apache.spark.sql.DataFrame) = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          (t, i) => when(i % 11 === 0,
            concat(lit("c"), col("__rep"), lit("x"), t)).otherwise(t)))
          .as("text"))
    val hist = tagged(spark.range(nb).select(col("id").as("__rep")))
      .localCheckpoint(true)
    println(s"[stress] spans: history ${hist.count()} docs (${nb}x sf0.1)")
    time("duplicatedSpans(1x)") {
      SpanDedup.duplicatedSpans(d0, "doc_id", "text", k = 8).count()
    }
    time(s"duplicatedSpans(${nb}x)") {
      SpanDedup.duplicatedSpans(hist, "doc_id", "text", k = 8).count()
    }
    time(s"cutDuplicatedSpans(${nb}x)") {
      SpanDedup.cutDuplicatedSpans(hist, "doc_id", "text", k = 8).count()
    }
    // CDC chunking rides the same generate+window shape (join-free):
    // the 20× row certifies linear wall against the 1× baseline
    time("chunkContentDefined(1x)") {
      TextOps.chunkContentDefined(d0, "doc_id", "text", 4, 16).count()
    }
    time(s"chunkContentDefined(${nb}x)") {
      TextOps.chunkContentDefined(hist, "doc_id", "text", 4, 16).count()
    }
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-spans-$nb"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    time(s"writeGramStore(${nb}x)") {
      SpanDedup.writeGramStore(spark, hist, "doc_id", "text", k = 8, path)
      spark.read.parquet(s"$path/grams").count()
    }
    val storeRows = spark.read.parquet(s"$path/grams").count()
    // probe: 500 fresh docs (their own tag) + 20 verbatim copies of
    // history docs that MUST cut to nothing through the store
    val probe = tagged(spark.range(nb, nb + 1).select(col("id").as("__rep")))
      .filter(col("doc_id") < nb * nBase + 500)
      .unionByName(hist.filter(col("doc_id") < 20)
        .select((col("doc_id") + (nb + 1) * nBase).as("doc_id"), col("text")))
      .localCheckpoint(true)
    println(s"[stress] spans: gram store $storeRows rows vs " +
      s"${probe.count()}-doc probe")
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    val meter = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffled.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead): Unit
    }
    def meteredServe(name: String): (Long, Set[(Long, Long)]) = {
      spark.sparkContext.addSparkListener(meter)
      shuffled.set(0L)
      val t0 = System.nanoTime()
      val out = SpanDedup.serveSpanCut(spark, path, probe,
          "doc_id", "text", k = 8)
        .select("doc_id", "n_kept").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(meter)
      println(f"[stress] spans serve/$name%-6s $secs%6.1f s  " +
        f"shuffleRead=${shuffled.get() / 1048576.0}%9.2f MiB  (${out.size} rows)")
      (shuffled.get(), out)
    }
    // the decontam serve shares the split (cutSpansAgainstStore) —
    // meter it through the same harness so the shared access path is
    // MEASURED shared, the curbloom-audit discipline
    def meteredDecontam(name: String): (Long, Set[(Long, Long)]) = {
      spark.sparkContext.addSparkListener(meter)
      shuffled.set(0L)
      val t0 = System.nanoTime()
      val out = SpanDedup.cutSpansAgainstStore(spark, path, probe,
          "doc_id", "text", k = 8)
        .select("doc_id", "n_kept").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(meter)
      println(f"[stress] spans decon/$name%-6s $secs%6.1f s  " +
        f"shuffleRead=${shuffled.get() / 1048576.0}%9.2f MiB  (${out.size} rows)")
      (shuffled.get(), out)
    }
    meteredServe("warmup")
    val (bytesBloom, outBloom) = meteredServe("bloom")
    val (dBytesBloom, dOutBloom) = meteredDecontam("bloom")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$path/grambloom"))
    val (bytesPlain, outPlain) = meteredServe("plain")
    val (dBytesPlain, dOutPlain) = meteredDecontam("plain")
    require(outBloom == outPlain,
      s"bloom path changed the serve: ${outBloom.size} vs ${outPlain.size}")
    require(dOutBloom == dOutPlain,
      s"bloom path changed the decontam: ${dOutBloom.size} vs ${dOutPlain.size}")
    require(!outBloom.exists(_._1 >= (nb + 1) * nBase),
      "a verbatim history copy survived the store cut")
    println(f"[stress] spans: serve shuffle-read drop " +
      f"${bytesPlain / math.max(bytesBloom, 1L).toDouble}%.1fx " +
      f"(plain ${bytesPlain / 1048576.0}%.2f MiB -> bloom " +
      f"${bytesBloom / 1048576.0}%.2f MiB) at ${storeRows / 75000}x " +
      f"probe-gram history")
    println(f"[stress] spans: decontam shuffle-read drop " +
      f"${dBytesPlain / math.max(dBytesBloom, 1L).toDouble}%.1fx " +
      f"(plain ${dBytesPlain / 1048576.0}%.2f MiB -> bloom " +
      f"${dBytesBloom / 1048576.0}%.2f MiB)")
    }
    if (mode == "spancrash") {
    // Crash-kill storm for the REAL SpanStream.maintain query — the
    // curcrash harness applied to continuous span dedup: child JVMs
    // running the actual foreachBatch query are halt(137)'d at both
    // crash windows (after the clean write; after gram absorption,
    // both before the marker), restarted from the checkpoint, and the
    // final store must equal the sequential no-crash control row for
    // row. Batches share most grams with the b=0 seed (the copytag
    // perturbation appends one token), so nearly every batch doc cuts
    // hard against history — maximal absorption pressure on the
    // redelivery fence.
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    import graft.streaming.SpanStream
    val nb = math.max(6, factor / 4)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-stress-spancrash-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (input, store, ctl, ckpt) =
      (s"$root/input", s"$root/store", s"$root/control", s"$root/ckpt")
    val nBase = 5000L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val reps = spark.range(nb + 1).select(col("id").as("__rep"))
    val bigD = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        concat(col("text"), lit(" copytag"), col("__rep")).as("text"))
      .localCheckpoint(true)
    def dRep(r: Int) = bigD.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    val stamped = scala.collection.mutable.Set.empty[String]
    (1 to nb).foreach { r =>
      dRep(r).coalesce(1).write.mode("append").parquet(input)
      stampBatchFiles(input, r, stamped)
    }
    SpanStream.init(dRep(0), "doc_id", "text", 8, ctl)
    (1 to nb).foreach { b =>
      SpanStream.applyBatch(dRep(b), "doc_id", "text", 8, ctl, b.toLong)
    }
    SpanStream.init(dRep(0), "doc_id", "text", 8, store)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments
      .asScala.toSeq
    def runChild(poison: Option[(String, Long)]): Int = {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        poison.toSeq.map { case (p, b) => s"-D$p=$b" } ++
        Seq("-cp", System.getProperty("java.class.path"),
          "graft.Stress", factor.toString, "spancrash-child",
          input, store, ckpt)
      val pb = new ProcessBuilder(cmd: _*).inheritIO()
      pb.start().waitFor()
    }
    val kills = Seq(
      ("graft.spans.crashAfterClean", 2L),
      ("graft.spans.crashAfterAbsorb", (nb / 2).toLong),
      ("graft.spans.crashAfterAbsorb", (nb - 1).toLong))
    kills.foreach { case (p, b) =>
      val rc = runChild(Some(p -> b))
      println(s"[stress] spancrash: killed child at $p=$b (exit $rc)")
      require(rc == 137, s"poisoned child exited $rc, expected halt 137")
    }
    val rcFinal = runChild(None)
    require(rcFinal == 0, s"clean child exited $rcFinal")
    def rowsOf(p: String, sub: String, cols: Seq[String]): Set[String] =
      spark.read.parquet(s"$p/$sub")
        .selectExpr(cols: _*).collect().map(_.toString).toSet
    val diffs = Seq(
      "clean" -> Seq("CAST(b AS LONG)", "doc_id", "clean_text", "n_kept"),
      "grams" -> Seq("CAST(b AS LONG)", "__gh"))
      .map { case (sub, cols) =>
        val (a, c) = (rowsOf(store, sub, cols), rowsOf(ctl, sub, cols))
        val d = (a diff c).size + (c diff a).size
        println(s"[stress] spancrash: $sub rows stream=${a.size} " +
          s"control=${c.size} diffed=$d")
        d
      }.sum
    require(diffs == 0, s"crash-recovered store diverged: $diffs rows differ")
    println(s"[stress] spancrash: ${kills.size} kills / ${kills.size} " +
      s"recoveries / rows diffed = 0 over $nb batches")
    }
    if (mode == "spancrash-child") {
    // child half: the REAL SpanStream.maintain over the file backlog
    // until drained (or until the poison sysprop halts mid-batch)
    import graft.streaming.SpanStream
    val Seq(input, store, ckpt) = args.slice(2, 5).toSeq
    val schema = spark.read.parquet(input).schema
    val docsStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
    val q = SpanStream.maintain(docsStream, "doc_id", "text", 8,
      store, checkpoint = ckpt)
    q.processAllAvailable()
    q.stop()
    }
    if (mode == "phashcrash") {
    // Crash-kill storm for the REAL PhashStream.maintain query — the
    // spancrash harness on the media index: child JVMs are halt(137)'d
    // after the verdict write and after hash absorption (both before
    // the marker), restarted from the checkpoint, and the final store
    // must equal the sequential no-crash control row for row. Each
    // rep's payloads are one-token perturbations of the base corpus
    // (near-identical planes), so most batch images dedup against
    // history/absorbed keepers — maximal pressure on the fence.
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    import graft.streaming.PhashStream
    val nb = math.max(6, factor / 4)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-stress-phashcrash-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (input, store, ctl, ckpt) =
      (s"$root/input", s"$root/store", s"$root/control", s"$root/ckpt")
    val nBase = 5000L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val reps = spark.range(nb + 1).select(col("id").as("__rep"))
    val bigD = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        concat(col("text"), lit(" copytag"), col("__rep")).as("text"))
      .localCheckpoint(true)
    def dRep(r: Int) = bigD.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    def mRep(r: Int) = graft.operators.Multimodal.asMediaTable(
      dRep(r), "doc_id", "text", "image")
    val stamped = scala.collection.mutable.Set.empty[String]
    (1 to nb).foreach { r =>
      dRep(r).coalesce(1).write.mode("append").parquet(input)
      stampBatchFiles(input, r, stamped)
    }
    PhashStream.init(mRep(0), 64, ctl)
    (1 to nb).foreach { b =>
      PhashStream.applyBatch(mRep(b), 64, 3, ctl, b.toLong)
    }
    PhashStream.init(mRep(0), 64, store)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments
      .asScala.toSeq
    def runChild(poison: Option[(String, Long)]): Int = {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        poison.toSeq.map { case (p, b) => s"-D$p=$b" } ++
        Seq("-cp", System.getProperty("java.class.path"),
          "graft.Stress", factor.toString, "phashcrash-child",
          input, store, ckpt)
      val pb = new ProcessBuilder(cmd: _*).inheritIO()
      pb.start().waitFor()
    }
    val kills = Seq(
      ("graft.phash.crashAfterServe", 2L),
      ("graft.phash.crashAfterAbsorb", (nb / 2).toLong),
      ("graft.phash.crashAfterAbsorb", (nb - 1).toLong))
    kills.foreach { case (p, b) =>
      val rc = runChild(Some(p -> b))
      println(s"[stress] phashcrash: killed child at $p=$b (exit $rc)")
      require(rc == 137, s"poisoned child exited $rc, expected halt 137")
    }
    val rcFinal = runChild(None)
    require(rcFinal == 0, s"clean child exited $rcFinal")
    def rowsOf(p: String, sub: String, cols: Seq[String]): Set[String] =
      spark.read.parquet(s"$p/$sub")
        .selectExpr(cols: _*).collect().map(_.toString).toSet
    val diffs = Seq(
      "served" -> Seq("CAST(b AS LONG)", "media_id", "dup_of", "is_fresh"),
      "phash" -> Seq("CAST(b AS LONG)", "media_id", "dhash"))
      .map { case (sub, cols) =>
        val (a, c) = (rowsOf(store, sub, cols), rowsOf(ctl, sub, cols))
        val d = (a diff c).size + (c diff a).size
        println(s"[stress] phashcrash: $sub rows stream=${a.size} " +
          s"control=${c.size} diffed=$d")
        d
      }.sum
    require(diffs == 0, s"crash-recovered store diverged: $diffs rows differ")
    println(s"[stress] phashcrash: ${kills.size} kills / ${kills.size} " +
      s"recoveries / rows diffed = 0 over $nb batches")
    }
    if (mode == "phashcrash-child") {
    import graft.streaming.PhashStream
    val Seq(input, store, ckpt) = args.slice(2, 5).toSeq
    val schema = spark.read.parquet(input).schema
    val rowsStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
    val q = PhashStream.maintain(rowsStream, "doc_id", "text", "image",
      64, 3, store, checkpoint = ckpt)
    q.processAllAvailable()
    q.stop()
    }
    if (mode == "simhashcrash") {
    // Crash-kill storm for the REAL SimhashStream.maintain query — the
    // phashcrash harness on the text fingerprint index: child JVMs are
    // halt(137)'d after the verdict write and after fingerprint
    // absorption (both before the marker), restarted from the
    // checkpoint, and the final store must equal the sequential
    // no-crash control row for row. Each rep's payloads are one-token
    // perturbations of the base corpus (near-identical fingerprints),
    // so most batch docs dedup against history/absorbed keepers —
    // maximal pressure on the fence.
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    import graft.streaming.SimhashStream
    val nb = math.max(6, factor / 4)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-stress-simhashcrash-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (input, store, ctl, ckpt) =
      (s"$root/input", s"$root/store", s"$root/control", s"$root/ckpt")
    val nBase = 5000L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val reps = spark.range(nb + 1).select(col("id").as("__rep"))
    val bigD = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        concat(col("text"), lit(" copytag"), col("__rep")).as("text"))
      .localCheckpoint(true)
    def dRep(r: Int) = bigD.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    val stamped = scala.collection.mutable.Set.empty[String]
    (1 to nb).foreach { r =>
      dRep(r).coalesce(1).write.mode("append").parquet(input)
      stampBatchFiles(input, r, stamped)
    }
    SimhashStream.init(dRep(0), "doc_id", "text", ctl)
    (1 to nb).foreach { b =>
      SimhashStream.applyBatch(dRep(b), "doc_id", "text", 3, ctl, b.toLong)
    }
    SimhashStream.init(dRep(0), "doc_id", "text", store)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments
      .asScala.toSeq
    def runChild(poison: Option[(String, Long)]): Int = {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        poison.toSeq.map { case (p, b) => s"-D$p=$b" } ++
        Seq("-cp", System.getProperty("java.class.path"),
          "graft.Stress", factor.toString, "simhashcrash-child",
          input, store, ckpt)
      val pb = new ProcessBuilder(cmd: _*).inheritIO()
      pb.start().waitFor()
    }
    val kills = Seq(
      ("graft.simhash.crashAfterServe", 2L),
      ("graft.simhash.crashAfterAbsorb", (nb / 2).toLong),
      ("graft.simhash.crashAfterAbsorb", (nb - 1).toLong))
    kills.foreach { case (p, b) =>
      val rc = runChild(Some(p -> b))
      println(s"[stress] simhashcrash: killed child at $p=$b (exit $rc)")
      require(rc == 137, s"poisoned child exited $rc, expected halt 137")
    }
    val rcFinal = runChild(None)
    require(rcFinal == 0, s"clean child exited $rcFinal")
    def rowsOf(p: String, sub: String, cols: Seq[String]): Set[String] =
      spark.read.parquet(s"$p/$sub")
        .selectExpr(cols: _*).collect().map(_.toString).toSet
    val diffs = Seq(
      "served" -> Seq("CAST(b AS LONG)", "doc_id", "dup_of", "is_fresh"),
      "simhash" -> Seq("CAST(b AS LONG)", "doc_id", "simhash"))
      .map { case (sub, cols) =>
        val (a, c) = (rowsOf(store, sub, cols), rowsOf(ctl, sub, cols))
        val d = (a diff c).size + (c diff a).size
        println(s"[stress] simhashcrash: $sub rows stream=${a.size} " +
          s"control=${c.size} diffed=$d")
        d
      }.sum
    require(diffs == 0, s"crash-recovered store diverged: $diffs rows differ")
    println(s"[stress] simhashcrash: ${kills.size} kills / ${kills.size} " +
      s"recoveries / rows diffed = 0 over $nb batches")
    }
    if (mode == "simhashcrash-child") {
    import graft.streaming.SimhashStream
    val Seq(input, store, ckpt) = args.slice(2, 5).toSeq
    val schema = spark.read.parquet(input).schema
    val rowsStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
    val q = SimhashStream.maintain(rowsStream, "doc_id", "text",
      3, store, checkpoint = ckpt)
    q.processAllAvailable()
    q.stop()
    }
    if (mode == "segdfcrash") {
    // Crash-kill storm for the REAL SegDfStream.maintain query — the
    // kill harness on the COUNT store (the one store whose naive
    // crash-rerun would DOUBLE-COUNT rather than just duplicate): child
    // JVMs are halt(137)'d after the verdict write and after count
    // absorption (both before the marker), restarted from the
    // checkpoint, and the final store must equal the sequential
    // no-crash control row for row — counts included, which is what
    // certifies the (segment, src) dedup discipline under redelivery.
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    import graft.streaming.SegDfStream
    val nb = math.max(6, factor / 4)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-stress-segdfcrash-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (input, store, ctl, ckpt) =
      (s"$root/input", s"$root/store", s"$root/control", s"$root/ckpt")
    val nBase = 5000L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val reps = spark.range(nb + 1).select(col("id").as("__rep"))
    // NO copytag perturbation on the text: identical segment payloads
    // across reps mean every batch re-raises the same segment dfs —
    // maximal pressure on the count accumulation + redelivery fence
    val bigD = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        col("text"))
      .localCheckpoint(true)
    def dRep(r: Int) = bigD.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    val stamped = scala.collection.mutable.Set.empty[String]
    (1 to nb).foreach { r =>
      dRep(r).coalesce(1).write.mode("append").parquet(input)
      stampBatchFiles(input, r, stamped)
    }
    SegDfStream.init(dRep(0), "doc_id", "text", 10, ctl)
    (1 to nb).foreach { b =>
      SegDfStream.applyBatch(dRep(b), "doc_id", "text", 10, 2, ctl, b.toLong)
    }
    SegDfStream.init(dRep(0), "doc_id", "text", 10, store)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments
      .asScala.toSeq
    def runChild(poison: Option[(String, Long)]): Int = {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        poison.toSeq.map { case (p, b) => s"-D$p=$b" } ++
        Seq("-cp", System.getProperty("java.class.path"),
          "graft.Stress", factor.toString, "segdfcrash-child",
          input, store, ckpt)
      val pb = new ProcessBuilder(cmd: _*).inheritIO()
      pb.start().waitFor()
    }
    val kills = Seq(
      ("graft.segdf.crashAfterServe", 2L),
      ("graft.segdf.crashAfterAbsorb", (nb / 2).toLong),
      ("graft.segdf.crashAfterAbsorb", (nb - 1).toLong))
    kills.foreach { case (p, b) =>
      val rc = runChild(Some(p -> b))
      println(s"[stress] segdfcrash: killed child at $p=$b (exit $rc)")
      require(rc == 137, s"poisoned child exited $rc, expected halt 137")
    }
    val rcFinal = runChild(None)
    require(rcFinal == 0, s"clean child exited $rcFinal")
    def rowsOf(p: String, sub: String, cols: Seq[String]): Set[String] =
      spark.read.parquet(s"$p/$sub")
        .selectExpr(cols: _*).collect().map(_.toString).toSet
    val diffs = Seq(
      "served" -> Seq("CAST(b AS LONG)", "doc_id", "clean_text",
        "n_kept_segments", "n_dropped_segments"),
      "segdf" -> Seq("__seg", "df", "CAST(src AS LONG)"))
      .map { case (sub, cols) =>
        val (a, c) = (rowsOf(store, sub, cols), rowsOf(ctl, sub, cols))
        val d = (a diff c).size + (c diff a).size
        println(s"[stress] segdfcrash: $sub rows stream=${a.size} " +
          s"control=${c.size} diffed=$d")
        d
      }.sum
    require(diffs == 0, s"crash-recovered store diverged: $diffs rows differ")
    println(s"[stress] segdfcrash: ${kills.size} kills / ${kills.size} " +
      s"recoveries / rows diffed = 0 over $nb batches")
    }
    if (mode == "segdfcrash-child") {
    import graft.streaming.SegDfStream
    val Seq(input, store, ckpt) = args.slice(2, 5).toSeq
    val schema = spark.read.parquet(input).schema
    val rowsStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
    val q = SegDfStream.maintain(rowsStream, "doc_id", "text",
      10, 2, store, checkpoint = ckpt)
    q.processAllAvailable()
    q.stop()
    }
    if (mode == "curcrash") {
    // Crash-kill storm for the REAL CurationStream.maintain query (r15
    // verdict #7): the redelivery laws are spec-pinned at spec scale by
    // calling applyBatch directly — this kills the ACTUAL JVM running
    // the foreachBatch query at the two worst-ordered points (after the
    // curated write; after absorption, both before the marker), restarts
    // from the checkpoint, and asserts the final store converges to the
    // sequential no-crash control row for row. Child JVMs are forked
    // with the parent's own classpath and JVM flags; the poison is a
    // sysprop read at CurationStream's documented crash-injection
    // points; kill = Runtime.halt(137), so no shutdown hook can tidy up.
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    import graft.streaming.CurationStream
    val nb = math.max(6, factor / 4)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-stress-curcrash-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (input, store, ctl, ckpt) =
      (s"$root/input", s"$root/store", s"$root/control", s"$root/ckpt")
    val nBase = 5000L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val e0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val reps = spark.range(nb + 1).select(col("id").as("__rep"))
    val bigD = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        col("source"), col("lang"),
        concat(col("text"), lit(" copytag"), col("__rep")).as("text"))
      .localCheckpoint(true)
    val bigE = e0.crossJoin(reps)
      .select((col("vec_id") + col("__rep") * nBase).as("doc_id"),
        col("embedding"))
      .localCheckpoint(true)
    def dRep(r: Int) = bigD.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    def eRep(r: Int) = bigE.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    // one parquet file per batch, written sequentially (ascending
    // mtimes ⇒ the file source delivers them in order, one per trigger)
    val stamped = scala.collection.mutable.Set.empty[String]
    (1 to nb).foreach { r =>
      dRep(r).join(eRep(r), Seq("doc_id"))
        .select("doc_id", "source", "lang", "text", "embedding")
        .coalesce(1).write.mode("append").parquet(input)
      stampBatchFiles(input, r, stamped)
    }
    // no-crash control: the sequential serve+absorb loop
    def initStore(p: String): Unit =
      CurationStream.init(dRep(0), eRep(0), "doc_id", "embedding",
        "lang", "text", k = 16, iters = 2, numMerges = 32,
        maxWords = 100000, dsirTarget = col("source").isin("src0", "src1"),
        dsirBuckets = 256, path = p, seed = "graft")
    initStore(ctl)
    (1 to nb).foreach { b =>
      CurationStream.applyBatch(dRep(b), eRep(b), "doc_id", "embedding",
        "lang", "source", "text", ctl, 49L, 400L, 48L, "graft", b.toLong)
    }
    initStore(store)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments
      .asScala.toSeq
    def runChild(poison: Option[(String, Long)]): Int = {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        poison.toSeq.map { case (p, b) => s"-D$p=$b" } ++
        Seq("-cp", System.getProperty("java.class.path"),
          "graft.Stress", factor.toString, "curcrash-child",
          input, store, ckpt)
      val pb = new ProcessBuilder(cmd: _*).inheritIO()
      pb.start().waitFor()
    }
    // kills straddle the run: early, middle, late; both crash points
    val kills = Seq(
      ("graft.curation.crashAfterCurated", 2L),
      ("graft.curation.crashAfterAbsorb", (nb / 2).toLong),
      ("graft.curation.crashAfterAbsorb", (nb - 1).toLong))
    kills.foreach { case (p, b) =>
      val rc = runChild(Some(p -> b))
      println(s"[stress] curcrash: killed child at $p=$b (exit $rc)")
      require(rc == 137, s"poisoned child exited $rc, expected halt 137")
    }
    val rcFinal = runChild(None)
    require(rcFinal == 0, s"clean child exited $rcFinal")
    // convergence: every artifact the serve path and the consumer read
    // must equal the no-crash control row for row
    def rowsOf(p: String, sub: String, cols: Seq[String]): Set[String] =
      spark.read.parquet(s"$p/$sub")
        .selectExpr(cols: _*).collect().map(_.toString).toSet
    val diffs = Seq(
      "curated" -> Seq("CAST(b AS LONG)", "doc_id", "source", "lang",
        "cluster", "bpe_tokens", "dsir_score"),
      "hashes" -> Seq("CAST(b AS LONG)", "content_hash"),
      "sem/members" -> Seq("CAST(b AS LONG)", "id", "CAST(cluster AS INT)"))
      .map { case (sub, cols) =>
        val (a, c) = (rowsOf(store, sub, cols), rowsOf(ctl, sub, cols))
        val d = (a diff c).size + (c diff a).size
        println(s"[stress] curcrash: $sub rows stream=${a.size} " +
          s"control=${c.size} diffed=$d")
        d
      }.sum
    require(diffs == 0, s"crash-recovered store diverged: $diffs rows differ")
    println(s"[stress] curcrash: ${kills.size} kills / ${kills.size} " +
      s"recoveries / rows diffed = 0 over $nb batches")
    }
    if (mode == "curcrash-child") {
    // child half of the curcrash storm: runs the REAL maintain query
    // over the file-source backlog until drained (or until the poison
    // sysprop halts the JVM mid-batch), then exits 0
    import graft.streaming.CurationStream
    val Seq(input, store, ckpt) = args.slice(2, 5).toSeq
    val schema = spark.read.parquet(input).schema
    val docsStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
    val q = CurationStream.maintain(docsStream, "doc_id", "embedding",
      "lang", "source", "text", store, 49L, 400L, 48L, "graft",
      checkpoint = ckpt)
    q.processAllAvailable()
    q.stop()
    }
    if (mode == "gatecrash") {
    // Drift→swap-under-load storm (r16, verdict #6): a scheduler tick
    // invokes CurationEpochs.retrainIfDrifted WHILE the epoch-aware
    // maintain query is mid-backlog, and the tick's JVM is halt(137)'d
    // at BOTH gate crash windows (after the candidate build; after the
    // decision row, before the pointer move) — killing the in-flight
    // micro-batch with it. Recovery must converge: the next tick's
    // reconcileGate completes the logged publish, redeliveries honor
    // their epoch pins across the gate-driven swap, and the final
    // store state equals an in-process control that replays the SAME
    // pin assignment against independently-built epoch stores. The
    // gate log must carry exactly the ticks that reached the append
    // (the pre-log kill leaves no row; the post-log kill's row is the
    // one reconcile completes).
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    import graft.streaming.{CurationEpochs, CurationStream}
    val nb = math.max(6, factor / 4)
    val mid = nb / 2 // segment A = batches 1..mid, B = mid+1..nb
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-stress-gatecrash-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (input, store, ctl, ckpt) =
      (s"$root/input", s"$root/store", s"$root/control", s"$root/ckpt")
    val nBase = 5000L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val e0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val reps = spark.range(nb + 1).select(col("id").as("__rep"))
    val bigD = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        col("source"), col("lang"),
        concat(col("text"), lit(" copytag"), col("__rep")).as("text"))
      .localCheckpoint(true)
    val bigE = e0.crossJoin(reps)
      .select((col("vec_id") + col("__rep") * nBase).as("doc_id"),
        col("embedding"))
      .localCheckpoint(true)
    def dRep(r: Int) = bigD.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    def eRep(r: Int) = bigE.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    val stamped = scala.collection.mutable.Set.empty[String]
    def writeSeg(rs: Range): Unit = rs.foreach { r =>
      dRep(r).join(eRep(r), Seq("doc_id"))
        .select("doc_id", "source", "lang", "text", "embedding")
        .coalesce(1).write.mode("append").parquet(input)
      stampBatchFiles(input, r, stamped)
    }
    // the retrain corpus is FIXED (history ∪ the first two crawl
    // batches' docs — input slices, not store reads), so every tick
    // sees the same signal regardless of stream progress
    val corpusD = dRep(0).unionByName(dRep(1)).unionByName(dRep(2))
      .localCheckpoint(true)
    val corpusE = eRep(0).unionByName(eRep(1)).unionByName(eRep(2))
      .localCheckpoint(true)
    def initE0(r: String): Unit = CurationEpochs.initEpoch(
      dRep(0), eRep(0), "doc_id", "embedding", "lang", "text",
      k = 16, iters = 2, numMerges = 32, maxWords = 100000,
      dsirTarget = col("source").isin("src0", "src1"),
      dsirBuckets = 256, root = r, epoch = 0L, seed = "graft")
    writeSeg(1 to mid)
    initE0(store)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments
      .asScala.toSeq
    def runChild(gateSeq: Long, poison: Option[String]): Int = {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        poison.toSeq.map(p => s"-D$p=$gateSeq") ++
        Seq("-cp", System.getProperty("java.class.path"),
          "graft.Stress", factor.toString, "gatecrash-child",
          input, store, ckpt, gateSeq.toString)
      val pb = new ProcessBuilder(cmd: _*).inheritIO()
      pb.start().waitFor()
    }
    // tick 1 dies after the candidate build (no log row, no pointer
    // move); tick 2 dies after its decision row lands (logged publish,
    // pointer unmoved); tick 3 must reconcile-and-complete the swap
    val rc1 = runChild(1L, Some("graft.epochs.crashAfterBuild"))
    println(s"[stress] gatecrash: killed tick 1 after build (exit $rc1)")
    require(rc1 == 137, s"poisoned child exited $rc1, expected halt 137")
    val rc2 = runChild(2L, Some("graft.epochs.crashAfterGate"))
    println(s"[stress] gatecrash: killed tick 2 after gate row (exit $rc2)")
    require(rc2 == 137, s"poisoned child exited $rc2, expected halt 137")
    require(CurationEpochs.publishedEpochs(spark, store) == Seq(0L),
      "a killed tick moved the serving pointer")
    val rc3 = runChild(3L, None)
    require(rc3 == 0, s"clean child exited $rc3")
    require(CurationEpochs.currentEpoch(spark, store) == 1L,
      "tick 3 failed to reconcile the logged publish")
    writeSeg(mid + 1 to nb)
    val rc4 = runChild(0L, None) // drain segment B, no tick
    require(rc4 == 0, s"drain child exited $rc4")
    // gate log: exactly the ticks that reached the append — tick 2's
    // completed publish and tick 3's post-swap no-op (candidate ≡ the
    // epoch it just published, drift 0)
    val gate = spark.read.parquet(s"$store/_gate")
      .select("gate_seq", "drift_bp", "published", "serving_epoch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    println(s"[stress] gatecrash: gate log = $gate")
    require(gate.map(_._1) == Seq(2L, 3L),
      s"gate log ticks: ${gate.map(_._1)} (want 2, 3)")
    require(gate(0)._3 == 1L && gate(0)._4 == 1L && gate(0)._2 >= 1L,
      s"tick 2 row $gate — want published=1, epoch 1, drift >= 1bp")
    require(gate(1) == (3L, 0L, 0L, 1L),
      s"tick 3 row ${gate(1)} — want (3, drift 0, no publish, serving 1)")
    // pins: monotone across the swap, both epochs exercised
    // skip Hadoop LocalFileSystem's hidden .<name>.crc shadows
    val pins = new java.io.File(s"$store/_epoch_of").list().toSeq
      .flatMap { n =>
        val m = "^(\\d+)\\.(\\d+)$".r.findFirstMatchIn(n)
        m.map(g => (g.group(1).toLong, g.group(2).toLong))
      }
      .sortBy(_._1)
    println(s"[stress] gatecrash: pins = $pins")
    require(pins.map(_._1) == (1L to nb).toSeq, s"missing pins: $pins")
    require(pins == pins.sortBy(p => (p._1, p._2)) &&
      pins.map(_._2).sliding(2).forall(s => s.head <= s.last),
      s"pins not monotone across the swap: $pins")
    require(pins.exists(_._2 == 0L) && pins.exists(_._2 == 1L),
      s"storm vacuous — both epochs must serve batches: $pins")
    // convergence: an in-process control replays the SAME pin
    // assignment against independently-built epoch stores
    initE0(ctl)
    CurationStream.init(corpusD, corpusE, "doc_id", "embedding", "lang",
      "text", k = 16, iters = 2, numMerges = 32, maxWords = 100000,
      dsirTarget = col("source").isin("src0", "src1"),
      dsirBuckets = 256, path = CurationEpochs.epochPath(ctl, 1L),
      seed = "graft")
    pins.foreach { case (b, e) =>
      CurationStream.applyBatch(dRep(b.toInt), eRep(b.toInt), "doc_id",
        "embedding", "lang", "source", "text",
        CurationEpochs.epochPath(ctl, e), 49L, 400L, 48L, "graft", b)
    }
    def rowsOf(r: String, e: Long, sub: String, cols: Seq[String]): Set[String] = {
      val p = s"${CurationEpochs.epochPath(r, e)}/$sub"
      if (!new java.io.File(p).exists()) Set.empty
      else spark.read.parquet(p).selectExpr(cols: _*)
        .collect().map(_.toString).toSet
    }
    val diffs = (for {
      e <- Seq(0L, 1L)
      (sub, cols) <- Seq(
        "curated" -> Seq("CAST(b AS LONG)", "doc_id", "source", "lang",
          "cluster", "bpe_tokens", "dsir_score"),
        "hashes" -> Seq("CAST(b AS LONG)", "content_hash"),
        "sem/members" -> Seq("CAST(b AS LONG)", "id", "CAST(cluster AS INT)"))
    } yield {
      val (a, c) = (rowsOf(store, e, sub, cols), rowsOf(ctl, e, sub, cols))
      val d = (a diff c).size + (c diff a).size
      println(s"[stress] gatecrash: e=$e $sub rows stream=${a.size} " +
        s"control=${c.size} diffed=$d")
      d
    }).sum
    require(diffs == 0, s"gate-crashed store diverged: $diffs rows differ")
    println(s"[stress] gatecrash: 2 kills (both gate windows, maintain " +
      s"mid-backlog) / 2 recoveries / rows diffed = 0 over $nb batches, " +
      s"swap completed by reconcile")
    }
    if (mode == "epochfold") {
    // Epoch-retention storm (r15 verdict #5 storm row): a retrain
    // cadence leaves a CHAIN of superseded epochs — each a complete
    // store — and readCurated unions live curated output across all of
    // them. foldEpochs must (1) be READ-INVISIBLE at storm scale,
    // (2) actually reclaim the disk and file count the chain leaks,
    // (3) leave the serving cadence untouched. Five epochs, each
    // retrained on the growing corpus and serving two 2,500-doc
    // batches, then fold to keep=2.
    import graft.streaming.{CurationEpochs, CurationStream}
    val nEpochs = 5
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-stress-epochfold-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val nBase = 2500L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
      .filter(col("doc_id") < nBase)
    val e0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter(col("vec_id") < nBase)
    val nSlices = 2 * nEpochs + 2 // reps 1..2E are batches, 2E+1 the post-fold serve
    val reps = spark.range(nSlices).select(col("id").as("__rep"))
    val bigD = d0.crossJoin(reps)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        col("source"), col("lang"),
        concat(col("text"), lit(" copytag"), col("__rep")).as("text"))
      .localCheckpoint(true)
    val bigE = e0.crossJoin(reps)
      .select((col("vec_id") + col("__rep") * nBase).as("doc_id"),
        col("embedding"))
      .localCheckpoint(true)
    def dUpTo(r: Int) = bigD.filter(col("doc_id") < (r + 1) * nBase)
    def eUpTo(r: Int) = bigE.filter(col("doc_id") < (r + 1) * nBase)
    def dRep(r: Int) = bigD.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    def eRep(r: Int) = bigE.filter(col("doc_id") >= r * nBase &&
      col("doc_id") < (r + 1) * nBase)
    def trainEpoch(ep: Int, upToRep: Int): Unit = time(s"epoch $ep train " +
        s"(${(upToRep + 1) * nBase} docs)") {
      CurationEpochs.initEpoch(dUpTo(upToRep), eUpTo(upToRep),
        "doc_id", "embedding", "lang", "text",
        k = 16, iters = 2, numMerges = 32, maxWords = 100000,
        dsirTarget = col("source").isin("src0", "src1"),
        dsirBuckets = 256, root = root, epoch = ep.toLong, seed = "graft")
      (upToRep + 1) * nBase
    }
    var b = 0L
    trainEpoch(0, 0)
    (0 until nEpochs).foreach { ep =>
      (1 to 2).foreach { _ =>
        b += 1
        val r = b.toInt
        CurationEpochs.applyBatchEpoch(dRep(r), eRep(r), "doc_id",
          "embedding", "lang", "source", "text", root,
          49L, 400L, 48L, "graft", batchId = b): Unit
      }
      if (ep < nEpochs - 1) trainEpoch(ep + 1, b.toInt)
    }
    def du(): (Long, Long) = {
      var files = 0L; var bytes = 0L
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
        else { files += 1; bytes += f.length() }
      walk(new java.io.File(root)); (files, bytes)
    }
    def readAll(): Seq[String] = CurationEpochs.readCurated(spark, root)
      .select(col("epoch"), col("b").cast("long"), col("doc_id"),
        col("source"), col("lang"), col("cluster"), col("bpe_tokens"),
        col("dsir_score"))
      .collect().map(_.toString).sorted.toSeq
    val (f0, by0) = du()
    val t0 = System.nanoTime(); val before = readAll()
    val rSecs0 = (System.nanoTime() - t0) / 1e9
    println(f"[stress] epochfold: pre-fold  $f0%5d files " +
      f"${by0 / 1048576.0}%8.1f MiB  readCurated ${before.size} rows " +
      f"in $rSecs0%.1f s  published=${CurationEpochs.publishedEpochs(spark, root)}")
    time("foldEpochs(keep=2)") {
      CurationEpochs.foldEpochs(spark, root, keep = 2); 1L
    }
    val (f1, by1) = du()
    val t1 = System.nanoTime(); val after = readAll()
    val rSecs1 = (System.nanoTime() - t1) / 1e9
    println(f"[stress] epochfold: post-fold $f1%5d files " +
      f"${by1 / 1048576.0}%8.1f MiB  readCurated ${after.size} rows " +
      f"in $rSecs1%.1f s  published=${CurationEpochs.publishedEpochs(spark, root)} " +
      f"archived=${CurationEpochs.archivedEpochs(spark, root)}")
    require(before == after,
      s"fold changed readCurated: ${before.size} vs ${after.size} rows")
    require(CurationEpochs.publishedEpochs(spark, root).size == 2,
      "fold failed to retire the superseded epochs")
    // idempotent at storm scale, and the serve cadence continues
    CurationEpochs.foldEpochs(spark, root, keep = 2)
    require(readAll() == after, "re-fold changed readCurated")
    b += 1
    CurationEpochs.applyBatchEpoch(dRep(b.toInt), eRep(b.toInt), "doc_id",
      "embedding", "lang", "source", "text", root,
      49L, 400L, 48L, "graft", batchId = b): Unit
    require(readAll().size > after.size,
      "post-fold serve produced nothing — cadence broken by the fold")
    println(f"[stress] epochfold: fold invisible (0 rows diffed), " +
      f"files ${f0}->${f1} (${f0.toDouble / f1}%.1fx), " +
      f"bytes ${by0 / 1048576.0}%.1f->${by1 / 1048576.0}%.1f MiB " +
      f"(${by0.toDouble / by1}%.1fx), read ${rSecs0}%.1f->${rSecs1}%.1f s, " +
      f"serve cadence intact after the fold")
    }
    if (mode == "gatecrash-child") {
    // child half of the gatecrash storm: the REAL epoch-aware maintain
    // query over the file-source backlog, with a concurrent scheduler
    // tick (retrainIfDrifted) fired from a second thread once two
    // batches hold epoch pins — mid-backlog by construction. A poison
    // sysprop halts the JVM at the tick's documented crash windows,
    // taking the in-flight micro-batch down with it. gateSeq 0 = drain
    // only, no tick.
    import graft.streaming.CurationEpochs
    val Seq(input, store, ckpt) = args.slice(2, 5).toSeq
    val gateSeq = args.lift(5).map(_.toLong).getOrElse(0L)
    val nBase = 5000L
    val d0 = Tables.documents(spark, "/root/testdata/sf0.1")
    val e0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val reps3 = spark.range(3).select(col("id").as("__rep"))
    val corpusD = d0.crossJoin(reps3)
      .select((col("doc_id") + col("__rep") * nBase).as("doc_id"),
        col("source"), col("lang"),
        concat(col("text"), lit(" copytag"), col("__rep")).as("text"))
    val corpusE = e0.crossJoin(reps3)
      .select((col("vec_id") + col("__rep") * nBase).as("doc_id"),
        col("embedding"))
    val schema = spark.read.parquet(input).schema
    val docsStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
    val q = CurationEpochs.maintain(docsStream, "doc_id", "embedding",
      "lang", "source", "text", store, 49L, 400L, 48L, "graft",
      checkpoint = ckpt)
    val tick = new Thread(() => if (gateSeq > 0L) {
      val pinDir = new java.io.File(s"$store/_epoch_of")
      while (Option(pinDir.list()).map(_.length).getOrElse(0) < 2)
        Thread.sleep(200)
      CurationEpochs.retrainIfDrifted(corpusD, corpusE, "doc_id",
        "embedding", "lang", "text", k = 16, iters = 2, numMerges = 32,
        maxWords = 100000,
        dsirTarget = col("source").isin("src0", "src1"),
        dsirBuckets = 256, root = store, newEpoch = 1L,
        thresholdBp = 1L, gateSeq = gateSeq, seed = "graft"): Unit
    })
    tick.setDaemon(false)
    tick.start()
    q.processAllAvailable()
    tick.join()
    q.stop()
    }
    if (mode == "attr") {
    // Stream-join state retention storm — the q141 100 TB claim: with
    // a TIGHT lateness the interval-join condition doubles as the
    // retention policy, so join state must PLATEAU at O(horizon ×
    // rate) however long the stream runs, while the certification
    // shape (lateness covering the span) evicts nothing and grows
    // LINEARLY with input. Build a `factor`-day backlog — the sf0.1
    // event stream replayed `factor` times, each replica shifted past
    // the last by span + 1 day and written as ONE time-ordered file
    // (sequential writes ⇒ ascending mtimes ⇒ the file source
    // delivers replicas in time order) — then run both shapes over
    // the SAME backlog and print each micro-batch's state rows from
    // the engine's own StreamingQueryProgress. In-order delivery also
    // pins the strongest form of the law: tight lateness drops
    // NOTHING here (late rows require out-of-order arrival), so both
    // shapes append identical results while only the tight one bounds
    // its state.
    import graft.streaming.EventTimeStreams
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "512")
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .select("event_id", "event_time", "user_id", "event_type", "value")
      .localCheckpoint(true)
    val b = ev.agg(min(unix_micros(col("event_time"))).as("lo"),
      max(unix_micros(col("event_time"))).as("hi"),
      (max("event_id") + 1).as("idoff")).first()
    val gapUs = (b.getLong(1) - b.getLong(0)) + 86400L * 1000000L
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-attr-storm-$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    (0 until factor).foreach { r =>
      ev.select((col("event_id") + lit(r * b.getLong(2))).as("event_id"),
          timestamp_micros(unix_micros(col("event_time")) + lit(r * gapUs))
            .as("event_time"),
          col("user_id"), col("event_type"), col("value"))
        .coalesce(1).sortWithinPartitions("event_time")
        .write.mode("append").parquet(dir)
    }
    println(s"[stress] backlog: ${factor} replicas x ${ev.count()} events")
    def run(name: String, lateness: String): (Long, Seq[Long]) = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-attr-ckpt-$name").toString
      spark.conf.set("spark.sql.streaming.checkpointLocation", ckpt)
      val t0 = System.nanoTime()
      val (df, ms) = EventTimeStreams.runAttributionBacklogMetered(
        spark, dir, "event_time", horizon = "4 hours",
        lateness = lateness, filesPerBatch = 1,
        queryName = s"attr_storm_$name")
      val out = df.count()
      val states = ms.sortBy(_.batchId).map(_.stateRows)
      println(f"[stress] attr/$name%-6s lateness=$lateness%-12s " +
        f"${(System.nanoTime() - t0) / 1e9}%6.1f s  out=$out " +
        s"batches=${states.size} stateMax=${if (states.isEmpty) 0L else states.max} " +
        s"stateLast=${states.lastOption.getOrElse(0L)}")
      println(s"[stress] attr/$name state rows per batch: " +
        states.mkString(", "))
      (out, states)
    }
    val (outWide, stWide) = run("wide", "3650 days")
    val (outTight, stTight) = run("tight", "30 minutes")
    require(outWide == outTight,
      s"in-order backlog must lose nothing under tight lateness: " +
        s"wide=$outWide tight=$outTight")
    require(stTight.nonEmpty && stWide.nonEmpty &&
        stTight.max * 2 < stWide.max,
      s"tight-lateness state did not plateau: tightMax=${stTight.max} " +
        s"wideMax=${stWide.max}")
    println(s"[stress] attr: identical output, state bounded " +
      s"${stTight.max} vs linear ${stWide.max}")
    }
    spark.stop()
  }
}
