package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity, TextOps}

/** Plan-shape contracts: the scale properties this engine claims
  * (pushdown, broadcast, shuffle-freedom) asserted on the actual
  * physical plans, so a regression shows up as a red test rather than a
  * slow benchmark. */
class PlanContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02 star join: date window pushed to the scan as range filters") {
    val plan = SparkEntry.queries("q02_prd_trades_star")(spark, dir)
      .queryExecution.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate lower bound not pushed")
    assert(plan.contains("LessThan(l_shipdate"),
      "shipdate upper bound not pushed")
  }

  test("q02 star join: every dimension joins as broadcast, no sort-merge") {
    val plan = physical(SparkEntry.queries("q02_prd_trades_star")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "a dimension fell back to sort-merge")
  }

  test("per-doc sketches are shuffle-free selects (no Exchange)") {
    val docs = Tables.documents(spark, dir)
    Seq(
      "minhash" -> TextOps.minhashSignatures(docs, "doc_id", "text", 3, 16),
      "simhash" -> TextOps.simhash(docs, "doc_id", "text"),
      "fingerprint" -> TextOps.docFingerprint(docs, "doc_id", "text")
    ).foreach { case (name, df) =>
      val plan = physical(df)
      assert(!plan.contains("Exchange"),
        s"$name sketch plan shuffles:\n$plan")
    }
  }

  test("jaccard pair engine: exactly one index shuffle + one pair aggregate") {
    val plan = physical(TextOps.jaccardPairs(
      Tables.documents(spark, dir), "doc_id", "text", 3, 0.5))
    // hash-partition exchanges only (never a sort-based global exchange)
    assert(!plan.contains("rangepartitioning"), "unexpected global sort")
  }

  test("brute-force ANN: query side broadcast, native codegen'd kernel") {
    val e = Tables.embeddings(spark, dir)
    val plan = physical(Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", 5))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "query side not broadcast")
    assert(plan.contains("cosine_similarity"), "native kernel missing")
  }

  test("scan pruning: a two-column projection reads only two columns") {
    val df = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"column pruning failed:\n$scan")
  }

  test("keepLastMaxBy partially aggregates map-side before the exchange") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, dir)
      .withColumn("ord", col("event_id"))
    val plan = physical(operators.Dedup.keepLastMaxBy(
      ev, Seq("user_id", "event_type"), col("ord")))
    // partial max_by runs below the exchange (map-side combine), the
    // final agg above it
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.lastIndexOf("partial_max_by")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"no map-side partial aggregation:\n$plan")
  }

  test("asofJoin plans exactly one exchange (union + window, no range join)") {
    val plan = physical(SparkEntry.queries("q38_asof_join")(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"asof fell back to a product join:\n$plan")
    assert(plan.contains("Window"), "asof window missing")
  }

  test("rangeJoin is an equi-join on buckets, never a cross product") {
    val plan = physical(SparkEntry.queries("q39_range_join")(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a product join:\n$plan")
  }

  test("incremental filter pushes to the parquet scan") {
    val plan = SparkEntry.queries("q05_incremental_filter")(spark, dir)
      .queryExecution.toString
    assert(plan.contains("GreaterThan(event_id,5000)"),
      "watermark filter not pushed")
  }

  test("hashSample is a shuffle-free filter over the scan") {
    val plan = physical(graft.operators.Sampling.hashSample(
      Tables.events(spark, dir), "event_id", 0.1))
    assert(!plan.contains("Exchange"),
      s"deterministic sample should not shuffle:\n$plan")
  }

  test("stratifiedSample broadcasts bounds and never sorts a whole stratum") {
    val plan = physical(graft.operators.Sampling.stratifiedSample(
      Tables.events(spark, dir), "event_type", "event_id",
      defaultFrac = 0.05, fracs = Map("click" -> 0.2), seed = "graft-mix"))
    assert(plan.contains("BroadcastHashJoin"),
      s"per-stratum bounds not broadcast:\n$plan")
    assert(plan.contains("Union"),
      s"below/boundary split missing — whole-stratum window suspected:\n$plan")
    // the only full-data window must rank the boundary bucket subset,
    // i.e. sit above the bucket-equality filter, not the raw scan
    assert(plan.contains("__bb"),
      s"boundary-bucket filter missing below the ranking window:\n$plan")
  }

  test("text scrubbing/chunking queries shuffle only for the presentation sort") {
    for (q <- Seq("q52_redact_pii", "q53_normalize", "q54_repetition",
        "q55_chunking")) {
      val plan = physical(SparkEntry.queries(q)(spark, dir))
      assert(!plan.contains("HashAggregate") && !plan.contains("SortMergeJoin"),
        s"$q grew an aggregate/join — should be a pure per-row select:\n$plan")
      val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
      assert(exchanges <= 1,
        s"$q shuffles beyond the presentation sort ($exchanges exchanges):\n$plan")
    }
  }

  test("cosineDedupPairs candidates come from a bucket equi-join, never a product") {
    val plan = physical(SparkEntry.queries("q51_cosine_dedup_pairs")(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"cosine pair generation fell back to a product join:\n$plan")
  }

  test("contamination joins the probe set as a broadcast, never sort-merge") {
    val docs = Tables.documents(spark, dir)
    val plan = physical(TextOps.contamination(
      docs, "doc_id", "text", docs.filter(col("doc_id") % 100 === 0)))
    assert(plan.contains("BroadcastHashJoin"),
      s"probe-set join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus index shuffled for the probe join:\n$plan")
  }

  test("q15 langid scores through the codegen'd kernel, no interpreted HOFs") {
    val df = SparkEntry.queries("q15_langid")(spark, dir)
    val plan = physical(df)
    assert(plan.contains("token_set_counts"),
      s"langid not using the native token_set_counts kernel:\n$plan")
    val fallbacks = df.queryExecution.executedPlan.flatMap(_.expressions)
      .flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback => e
      })
    assert(fallbacks.isEmpty,
      s"interpreted (CodegenFallback) expressions on the q15 hot path: " +
        fallbacks.map(_.getClass.getSimpleName).distinct.mkString(", "))
  }

  test("q16 quality stopword ratio runs through the codegen'd kernel") {
    val plan = physical(SparkEntry.queries("q16_quality")(spark, dir))
    assert(plan.contains("token_set_counts"),
      s"stopword_ratio not using the native kernel:\n$plan")
    assert(!plan.contains("ArrayFilter"),
      s"interpreted HOF filter survives in q16:\n$plan")
  }

  test("media decode is a codegen'd columnar select (no RDD hop)") {
    val media = Multimodal.asMediaTable(
      Tables.documents(spark, dir), "doc_id", "text", "text")
    val plan = physical(Multimodal.decodeMeta(media))
    assert(plan.contains("media_decode"),
      s"decode not using the native kernel:\n$plan")
    assert(!plan.contains("ExistingRDD"),
      s"decode fell back to an RDD hop (out of whole-stage codegen):\n$plan")
    assert(!plan.contains("Exchange"),
      s"decode should be a shuffle-free select:\n$plan")
  }

  test("sampleFrames is the one-pass frame-stats kernel (no per-frame binary refetch)") {
    val media = Multimodal.asMediaTable(
      Tables.documents(spark, dir), "doc_id", "text", "text")
    val plan = physical(Multimodal.sampleFrames(media, 4096, 4))
    assert(plan.contains("media_frame_stats"),
      s"sampleFrames not using the native kernel:\n$plan")
    // the declarative form it replaces: transform(offsets, substring(media,…))
    // re-copied the full binary per frame — O(frames × file_size)
    assert(!plan.contains("ArrayTransform") && !plan.contains("substring"),
      s"sampleFrames fell back to per-frame binary slicing:\n$plan")
    assert(!plan.contains("Exchange"),
      s"frame sampling should be a shuffle-free select:\n$plan")
  }

  test("q57 first-order extract: one aggregation shuffle, no product join") {
    val plan = physical(SparkEntry.queries("q57_first_order")(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
      s"customer⋈orders left join fell back to a product:\n$plan")
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx <= 1,
      s"q57 shuffles beyond the per-customer aggregation ($hashEx):\n$plan")
  }

  test("q58 incremental e2e: watermark filter pushed, one window exchange") {
    val qe = SparkEntry.queries("q58_incremental_e2e")(spark, dir).queryExecution
    assert(qe.toString.contains("GreaterThan(event_id"),
      "delta watermark predicate not pushed to the events scan")
    val plan = qe.executedPlan.toString
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 1,
      s"q58 should shuffle exactly once for the keep-last window ($hashEx):\n$plan")
  }

  test("q59 binary ingest: ONE blob scan, codegen'd decode, no joins") {
    val plan = physical(SparkEntry.queries("q59_binary_ingest")(spark, dir))
    assert(plan.contains("media_decode"),
      s"q59 decode not using the native kernel:\n$plan")
    // THE scale contract for media: blob bytes are read exactly once.
    // The round-8 shape scanned the binaryFile source 4× (features /
    // decode / frames subtrees re-joined on media_id — Spark does not
    // CSE across join subtrees), i.e. 4× I/O on the one table where
    // bytes are the entire cost.
    val blobScans = plan.sliding("binaryFile".length).count(_ == "binaryFile")
    assert(blobScans == 1,
      s"q59 must read each blob exactly once ($blobScans binaryFile scans):\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Exchange hashpartitioning"),
      s"single-select profile needs no join and no hash shuffle:\n$plan")
  }

  test("q60 training mix: one dedup shuffle, no joins, gates below it") {
    val plan = physical(SparkEntry.queries("q60_training_mix")(spark, dir))
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"the mix must be a single pass — no join anywhere:\n$plan")
    // exactly one REQUIRED shuffle (the keep-first window); the narrow-
    // input fan-out (REPARTITION_BY_COL, a no-op at cluster scale —
    // Engine.fanOutIfNarrow) is the only other exchange allowed
    val required = plan.sliding(40).count(_.startsWith("Exchange hashpartitioning")) -
      plan.sliding("REPARTITION_BY_NUM".length).count(_ == "REPARTITION_BY_NUM")
    assert(required == 1,
      s"q60 should shuffle exactly once for the keep-first window ($required):\n$plan")
    assert(plan.contains("token_set_counts"),
      s"quality/lang gates not on the native kernel:\n$plan")
  }

  test("q61 budgetTake broadcasts bounds and never sorts a whole stratum") {
    val plan = physical(SparkEntry.queries("q61_token_budget_mix")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"per-stratum budget bounds not broadcast:\n$plan")
    assert(plan.contains("Union"),
      s"below/boundary split missing — whole-stratum window suspected:\n$plan")
    assert(plan.contains("__bb"),
      s"boundary-bucket filter missing below the running-sum window:\n$plan")
  }

  test("q62 shufflePositions ranks within buckets, no global sort window") {
    val plan = physical(graft.operators.Sampling.shufflePositions(
      Tables.documents(spark, dir).select("doc_id"), "doc_id"))
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets not broadcast:\n$plan")
    // the per-row ranking window partitions by bucket (__b as the
    // partition spec) — a global ORDER-BY-hash window would carry an
    // empty partition spec over a rangepartitioning exchange
    assert(plan.contains("windowspecdefinition(__b"),
      s"bucket-partitioned ranking window missing:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"global sort leaked into the permutation plan:\n$plan")
  }

  test("q63 sketch accuracy: sketch branch clean, exact branch expanded") {
    val plan = physical(SparkEntry.queries("q63_sketch_accuracy")(spark, dir))
    // two separate aggregation branches rejoined by broadcast: a single
    // mixed aggregate would drag sketch buffers through the
    // (group, distinct-key) expansion — one percentile/HLL buffer per
    // USER (measured 7× slower). Three hash exchanges total: sketch
    // (group), exact (group, key), exact (group).
    assert(plan.contains("BroadcastHashJoin"),
      s"branches should rejoin via broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"rejoin fell off the broadcast path:\n$plan")
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 3,
      s"q63 should shuffle sketch(group) + exact(group,key)+(group) ($hashEx):\n$plan")
  }

  test("q64 salted join carries the salt in the join keys") {
    val plan = physical(SparkEntry.queries("q64_salted_join")(spark, dir))
    assert(plan.contains("__salt"),
      s"salt column missing from the join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"salted join fell back to a product:\n$plan")
  }

  test("q66 bucketed join: no shuffle and no sort in the join stage") {
    val df = SparkEntry.queries("q66_bucketed_join")(spark, dir)
    val plan = physical(df)
    assert(plan.contains("SortMergeJoin"),
      s"bucketed join should stay on the sort-merge path (MERGE hint):\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scan does not report bucketed reading:\n$plan")
    // the ONLY hash exchange allowed is the per-nation aggregation ABOVE
    // the join; each bucketed side satisfies the join's distribution
    // requirement as-read, and the bucket sort order satisfies SMJ's
    // ordering requirement, so the join stage itself is exchange- and
    // sort-free — the pay-once contract
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 1,
      s"q66 must shuffle only for the aggregation ($hashEx exchanges):\n$plan")
    val joinAt = plan.indexOf("SortMergeJoin")
    val exBelowJoin = plan.indexOf("Exchange", joinAt)
    assert(exBelowJoin == -1,
      s"exchange below the bucketed join — bucketing not used:\n$plan")
  }

  test("q67 layout: day filter prunes partitions at the file index") {
    val plan = physical(SparkEntry.queries("q67_partition_prune")(spark, dir))
    // the even-days predicate references only the partition column, so
    // it must appear under PartitionFilters (file-index elision — odd
    // directories never opened), NOT as a post-scan Filter on data
    assert(plan.contains("PartitionFilters: [") &&
        plan.substring(plan.indexOf("PartitionFilters: [")).take(200)
          .contains("event_day"),
      s"event_day filter did not reach PartitionFilters:\n$plan")
  }

  test("q68 bloom semi join: might_contain prunes the big side below the join") {
    val plan = physical(SparkEntry.queries("q68_bloom_semijoin")(spark, dir))
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from the plan:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"exact semi join missing above the bloom prefilter:\n$plan")
    // the prefilter must sit in the big side's scan stage, i.e. BELOW
    // the semi join in the tree (printed after it), so pruned rows never
    // reach the join's shuffle
    val joinAt = plan.indexOf("LeftSemi")
    assert(plan.indexOf("might_contain", joinAt) > joinAt,
      s"bloom prefilter not below the semi join:\n$plan")
  }

  test("q70 scd2: all three window passes share ONE hash exchange") {
    val plan = physical(SparkEntry.queries("q70_scd2_history")(spark, dir))
    // change-detect lag, version row_number and dating lead all window
    // over (user_id | ts_us, event_id); only the presentation sort may
    // add a range exchange above them
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 1,
      s"scd2 must build history in one key shuffle ($hashEx):\n$plan")
  }

  test("q71 snapshot diff: the full-outer join reuses the snapshots' partitioning") {
    val plan = physical(SparkEntry.queries("q71_snapshot_diff")(spark, dir))
    assert(plan.contains("FullOuter"), s"diff join missing:\n$plan")
    // one exchange per snapshot's keep-last window, NONE for the join:
    // the window outputs are already hash-partitioned on the join key
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 2,
      s"diff must cost two snapshot shuffles, join adds none ($hashEx):\n$plan")
  }

  test("q72 quantized ANN: native kernels, broadcast-only joins, no vector re-shuffle") {
    val plan = physical(SparkEntry.queries("q72_quantized_ann")(spark, dir))
    assert(plan.contains("int8_quantize"),
      s"quantization kernel missing from the plan:\n$plan")
    assert(plan.contains("cosine_similarity"),
      s"cosine kernel missing from the plan:\n$plan")
    // the shortlist re-attach and the audit join must all broadcast —
    // a sort-merge join would mean the corpus or its vectors were
    // shuffled after the quantized scan
    assert(!plan.contains("SortMergeJoin"),
      s"a q72 join fell back to sort-merge:\n$plan")
  }

  test("q73 compaction: the query reads the compacted layout, one agg shuffle") {
    val plan = physical(SparkEntry.queries("q73_compaction")(spark, dir))
    assert(plan.contains("graft-compact-out"),
      s"q73 is not reading the compacted layout:\n$plan")
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 1,
      s"q73 must shuffle only for the aggregation ($hashEx):\n$plan")
  }

  test("q74 incremental agg: map-side partials, merge stage adds NO exchange") {
    val plan = physical(SparkEntry.queries("q74_incremental_agg")(spark, dir))
    // one exchange per half-month partial state; the merge-of-states
    // aggregate sits on the Union with no third shuffle — the whole
    // point of mergeable state
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 2,
      s"q74 must shuffle once per partial state, none to merge ($hashEx):\n$plan")
    assert(plan.contains("partial_sum(cast(value"),
      s"value sum not partially aggregated map-side:\n$plan")
  }

  test("q75 candidate stage probes the signed store only: zero minhash kernels") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sigstore-pin").toString
    TextOps.signatureStore(Tables.documents(spark, dir), "doc_id", "text")
      .write.mode("overwrite").parquet(tmp)
    val plan = physical(TextOps.incrementalCandidates(
      spark.read.parquet(tmp), "doc_id", col("doc_id") % 8 === 0))
    assert(plan.contains("graft-sigstore-pin"),
      s"candidates not derived from the persisted store:\n$plan")
    assert(!plan.contains("minhash_signature"),
      s"candidate stage re-signs documents — the store IS the signatures:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join:\n$plan")
    // the increment broadcasts; the store must NEVER shuffle — the only
    // hash exchange is the output-sized candidate distinct
    assert(plan.contains("BroadcastHashJoin"),
      s"probe side not broadcast — this shuffles the store per increment:\n$plan")
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 1,
      s"store-side shuffle crept into candidate generation ($hashEx):\n$plan")
  }

  test("q75 verify stage: candidate text fetched via broadcast semi-join") {
    val plan = physical(SparkEntry.queries("q75_incremental_dedup")(spark, dir))
    assert(plan.contains("shingle_hash60"),
      s"exact verify kernel missing:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"candidate-id fetch must broadcast, not shuffle the corpus:\n$plan")
  }

  test("q76 incremental distinct: map-side sketch partials, broadcast audit rejoin") {
    val plan = physical(SparkEntry.queries("q76_incremental_distinct")(spark, dir))
    assert(plan.contains("partial_hll_sketch_agg"),
      s"HLL sketch not partially aggregated map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"the |groups|-row audit rejoin must broadcast:\n$plan")
  }

  test("q69 z-order layout: value window pushes to the parquet scan") {
    val plan = SparkEntry.queries("q69_zorder_layout")(spark, dir)
      .queryExecution.toString
    // pushed bounds on the clustered column = the row-group skipping
    // contract (footer stats do the elision; LayoutSpec measures it)
    assert(plan.contains("GreaterThanOrEqual(value,20.0)") &&
        plan.contains("LessThanOrEqual(value,60.0)"),
      s"value window not pushed to the z-layout scan:\n$plan")
  }

  test("median family (q46/q104/q112): no window ever partitions raw data") {
    // the round-11 weak item, pinned: exact grouped medians/quantiles
    // must ride the two-phase histogram→rank-select path. The composed
    // plans may keep rank-limited windows (q104's top-lang sits on the
    // |sources|×|langs| aggregate), but NO window — and no `percentile`
    // buffering aggregate — may take a data-sized input.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    Seq("q46_grouped_quantiles", "q112_robust_outliers").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.isEmpty, s"$q reacquired a window:\n${wins.headOption}")
      assert(!df.queryExecution.optimizedPlan.toString.contains("percentile("),
        s"$q fell back to the buffering percentile aggregate")
    }
    val q104 = SparkEntry.queries("q104_corpus_report")(spark, dir)
    val wins104 = q104.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins104.forall(_.partitionSpec.nonEmpty),
      "q104 grew a single-partition window")
    // every q104 window input is a bounded aggregate (the per-source
    // language histogram), never the document rows
    wins104.foreach { w =>
      val agg = w.child.collect { case a: Aggregate => a }
      assert(agg.nonEmpty,
        s"q104 window does not sit on an aggregate:\n$w")
    }
  }

  test("q123 weighted quantiles: two-phase path — no window, no " +
       "percentile buffering") {
    // weighted ranks ride the same histogram→rank-select machinery as
    // the q46 family; the weight must not smuggle a sort back in
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = SparkEntry.queries("q123_weighted_quantiles")(spark, dir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty, s"q123 reacquired a window:\n${wins.headOption}")
    assert(!df.queryExecution.optimizedPlan.toString.contains("percentile("),
      "q123 fell back to the buffering percentile aggregate")
  }

  test("q121 semdedup: no cartesian product; the pair join is an " +
       "equi-join on the cluster id") {
    val plan = physical(SparkEntry.queries("q121_semdedup_pairs")(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"semdedup pair join went cartesian:\n$plan")
    assert(plan.contains("dot_product"),
      s"native dot kernel missing from the pair filter:\n$plan")
  }

  test("q130 pq-adc: scoring never touches vectors — codes join a " +
       "broadcast lookup, rank limit pushed, no cartesian") {
    val plan = physical(SparkEntry.queries("q130_pq_adc")(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"ADC went cartesian:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"per-query lookup tables not broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k rank limit not pushed into the window:\n$plan")
    // the scoring subtree must not re-read the embedding column: the
    // only parquet scans feed the broadcast lookup (query slices)
    assert(!plan.contains("squared_l2") || plan.contains("BroadcastExchange"),
      "exact kernels outside the broadcast side")
  }

  test("q117 bpe tokens: one codegen'd call per row — no explode, no " +
       "exchange below the presentation sort") {
    val plan = physical(SparkEntry.queries("q117_bpe_tokens")(spark, dir))
    assert(plan.contains("bpe_token_count"),
      s"native BPE kernel missing:\n$plan")
    assert(!plan.contains("Generate"),
      s"BPE counting exploded tokens instead of projecting:\n$plan")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"BPE count introduced a non-sort exchange:\n$plan")
  }

  test("q77 vocabulary: the only single-partition window runs over the histogram") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = SparkEntry.queries("q77_vocabulary")(spark, dir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "vocabulary lost its windows entirely")
    val global = wins.filter(_.partitionSpec.isEmpty)
    assert(global.size == 1,
      s"expected exactly one single-partition window, got ${global.size}")
    // that one window's input must be the (cnt, prefix) bucket-size
    // histogram — an Aggregate grouped on the two bucket keys — never
    // the vocabulary rows themselves
    val hist = global.head.child.collect {
      case a: Aggregate if a.groupingExpressions.size == 2 => a
    }
    assert(hist.nonEmpty,
      s"single-partition window does not sit on the bucket histogram:\n${global.head}")
    // every data-sized window is bucket-partitioned (parallel)
    val bucketed = wins.filterNot(_.partitionSpec.isEmpty)
    assert(bucketed.nonEmpty && bucketed.forall(_.partitionSpec.size == 2),
      "in-bucket ranking window lost its bucket partitioning")
    // and the offsets rejoin is a broadcast, not a shuffle of the vocab
    val pplan = physical(df)
    assert(pplan.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast back onto the vocabulary:\n$pplan")
  }

  test("q85 bm25: postings pruned by broadcast, no sort-merge, rank-limited") {
    val plan = physical(SparkEntry.queries("q85_bm25_topk")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term prune must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-sized join crept into retrieval:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k not rank-limit-pushed:\n$plan")
  }

  test("q84 grouped top-k: rank limit pushes down to a map-side WindowGroupLimit") {
    val plan = physical(SparkEntry.queries("q84_grouped_topk")(spark, dir))
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k not pushed below the window exchange — whole groups would shuffle:\n$plan")
    assert(!plan.contains("Join"),
      s"grouped top-k must not join:\n$plan")
  }

  test("q81 dup passages: block window + rebuild agg, no joins, no global sort") {
    val plan = physical(graft.operators.TextOps.removeDuplicatedBlocks(
      Tables.documents(spark, dir), "doc_id", "text", 16))
    assert(!plan.contains("Join"),
      s"passage dedup must be window+aggregate, never a join:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"a global sort leaked into passage dedup:\n$plan")
    val hashEx = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 2,
      s"expected the block window + doc rebuild exchanges only ($hashEx):\n$plan")
  }

  test("q79 incremental vocab: merged state ranks without a global sort") {
    val plan = physical(SparkEntry.queries("q79_incremental_vocab")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"histogram offsets must broadcast onto the merged state:\n$plan")
    // the only rangepartitioning allowed is the output orderBy — never
    // a window sort over the vocabulary itself
    val rangeEx = plan.sliding("Exchange rangepartitioning".length)
      .count(_ == "Exchange rangepartitioning")
    assert(rangeEx <= 1,
      s"a data-sized sort window leaked into the incremental rank:\n$plan")
  }

  test("q90 purged-index probe keeps the pruned layout: partition filter " +
       "present, no corpus-sized join") {
    val plan = physical(SparkEntry.queries("q90_store_purge")(spark, dir))
    assert(plan.contains("PartitionFilters") && plan.contains("tp#"),
      s"purge broke the term-partition pruning of the probe:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-sized join crept into the purged-index probe:\n$plan")
  }

  test("q91 priority sample: per-partition heap (TakeOrdered), no global sort " +
       "of the corpus") {
    val plan = physical(SparkEntry.queries("q91_priority_sample")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-(k+1) must be a per-partition heap, not a sort:\n$plan")
    // the only range exchange allowed is the k-row presentation sort;
    // the corpus itself must never range-partition
    val rangeEx = plan.sliding("Exchange rangepartitioning".length)
      .count(_ == "Exchange rangepartitioning")
    assert(rangeEx <= 1,
      s"a corpus-sized global sort leaked into priority sampling:\n$plan")
    assert(!plan.contains("Join") || plan.contains("BroadcastNestedLoopJoin"),
      s"only the broadcast τ join is allowed:\n$plan")
  }

  test("q92 recall audit adds no corpus-sized join: exact side broadcasts " +
       "onto the arm union") {
    val plan = physical(SparkEntry.queries("q92_ann_recall")(spark, dir))
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-sized shuffle join crept into the recall audit:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the exact ground-truth set must broadcast onto the arms:\n$plan")
  }

  test("q80 split assignment is a pure projection: no hash exchange, no join") {
    val plan = physical(SparkEntry.queries("q80_split_assign")(spark, dir))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"split assignment must not shuffle:\n$plan")
    assert(!plan.contains("Join"),
      s"split assignment must not join:\n$plan")
  }

  test("q78 upsert merge reads only touched partitions: partition filter pinned") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-upsert-pin").toString
    val store = graft.operators.TableStore(spark, root)
    val init = Seq((1L, 10L, "a", 1.0), (2L, 10L, "b", 2.0), (3L, 10L, "c", 3.0))
      .toDF("event_id", "ts_us", "part", "value")
    store.incrementalUpsertPartitioned("prod", "t", init, "event_id",
      Seq("event_id"), Seq(col("ts_us")), "part")
    // second batch touches ONE of three partitions
    val batch = Seq((4L, 20L, "a", 4.0)).toDF("event_id", "ts_us", "part", "value")
    val plan = store.upsertMergePlan("prod", "t", batch,
      Seq("event_id"), Seq(col("ts_us")), "part")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part#"),
      s"existing-rows side lost its partition filter — full-table scan per batch:\n$plan")
    assert(plan.contains("= a)"),
      s"touched-partition value must reach the scan's partition filter:\n$plan")
    assert(!plan.contains("= b)") && !plan.contains("= c)"),
      s"untouched partitions leaked into the merge scan:\n$plan")
  }

  test("q88 embedding-store build: ONE blob scan, codegen'd decode, " +
       "blobs dropped before the write (no shuffle)") {
    val media = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet").load(dir)
      .select(
        conv(substring(md5(regexp_extract(col("path"), "[^/]+$", 0)), 1, 15),
          16, 10).cast("long").as("media_id"),
        col("content").as("media"))
    val plan = physical(Multimodal.mediaEmbeddings(media))
    assert(plan.contains("media_decode"),
      s"embedding build not using the native decode kernel:\n$plan")
    val blobScans = plan.sliding("binaryFile".length).count(_ == "binaryFile")
    assert(blobScans == 1,
      s"embedding build must read each blob exactly once ($blobScans):\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"blob→embedding must be one shuffle-free select:\n$plan")
  }

  test("q88 retrieval never touches the blob source: quantized kernels " +
       "over the materialized store, broadcast-only joins") {
    val plan = physical(SparkEntry.queries("q88_media_ann")(spark, dir))
    assert(!plan.contains("binaryFile"),
      s"retrieval re-scanned the blob source — the store exists so bytes " +
        s"must never be re-read:\n$plan")
    assert(plan.contains("int8_quantize") && plan.contains("cosine_similarity"),
      s"quantize/cosine kernels missing from the retrieval plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a q88 join fell back to sort-merge (vectors shuffled):\n$plan")
  }

  test("q94 as-of probe: the version cut rides the scan's partition " +
       "filter next to the term pruning — never a data filter") {
    val plan = physical(SparkEntry.queries("q94_index_time_travel")(spark, dir))
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("tp#") && l.contains("b#")),
      s"as-of cut not composed with term pruning as a partition filter:\n$plan")
  }

  test("q95 exact MaxSim: corpus read once and never shuffled with " +
       "payloads; query bag broadcast; rank limit pushed down") {
    val df = SparkEntry.queries("q95_maxsim_topk")(spark, dir)
    val plan = physical(df)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastExchange"),
      s"query bag not broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k not rank-limit-pushed:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a MaxSim join fell back to sort-merge (vectors shuffled):\n$plan")
    // both aggregate levels shuffle slim id+cosine rows only — an
    // embedding column crossing an exchange would show as the vector
    // attribute in an Exchange's output
    assert(!plan.linesIterator.exists(l =>
        l.trim.startsWith("+- Exchange") && l.contains("embedding#")),
      s"vector payloads crossed a shuffle:\n$plan")
  }

  test("q96 shortlisted MaxSim: quantized kernels present, shortlist cut " +
       "map-side, candidates broadcast back onto the corpus (no sort-merge)") {
    val plan = physical(SparkEntry.queries("q96_maxsim_shortlist")(spark, dir))
    assert(plan.contains("int8_quantize") && plan.contains("cosine_similarity"),
      s"quantize/cosine kernels missing:\n$plan")
    assert(plan.sliding("WindowGroupLimit".length)
        .count(_ == "WindowGroupLimit") >= 3,
      s"shortlist/top-k rank limits not pushed to map-side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a q96 join fell back to sort-merge:\n$plan")
  }

  test("packSequences partitions its window by shard (no global sort)") {
    val plan = physical(graft.operators.Packing.packSequences(
      TextOps.tokenCounts(Tables.documents(spark, dir), "doc_id", "text")
        .withColumn("shard", pmod(col("doc_id"), lit(8L))),
      "shard", "doc_id", "ws_tokens", 2048L))
    assert(plan.contains("Window"), "packing window missing")
    assert(!plan.contains("rangepartitioning"),
      s"packing fell back to a global sort:\n$plan")
  }

  test("q99 fuzzy blocking: the per-block cap compiles to a " +
       "WindowGroupLimit (map-side pre-prune) and the block join never " +
       "goes cartesian") {
    val plan = physical(SparkEntry.queries("q99_fuzzy_pairs")(spark, dir))
    assert(plan.contains("WindowGroupLimit"),
      s"block cap not rank-limit-pushed:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"blocked join degenerated to a cross product:\n$plan")
  }

  test("q103 temperature mix: the per-source rate table broadcasts and " +
       "the hash-threshold membership rides the broadcast join as a " +
       "condition — the corpus never shuffles for sampling") {
    val plan = physical(SparkEntry.queries("q103_temperature_mix")(spark, dir))
    // the membership comparison (portable hash < sample_thresh) must
    // appear as a BroadcastHashJoin condition, not after an exchange
    val memberJoin = plan.linesIterator.find(l =>
      l.contains("BroadcastHashJoin") && l.contains("sample_thresh"))
    assert(memberJoin.isDefined,
      s"membership threshold not on a broadcast join:\n$plan")
    // the only sort-merge allowed is the source-count-sized audit join
    // of the two aggregates (AQE broadcasts it at runtime); the
    // corpus-sized membership path must not contain one
    assert(plan.sliding("SortMergeJoin".length)
        .count(_ == "SortMergeJoin") <= 1,
      s"an unexpected sort-merge join in the sampling path:\n$plan")
  }

  test("q107 funnel: no Window operator anywhere — reach is computed " +
       "from min-aggregates and user-keyed joins only") {
    val plan = physical(SparkEntry.queries("q107_funnel")(spark, dir))
    assert(!plan.contains("Window"),
      s"funnel fell back to a window over raw events:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q111 hopping windows: explode + one aggregate — no Window " +
       "operator, no join") {
    val plan = physical(SparkEntry.queries("q111_hopping_windows")(spark, dir))
    assert(!plan.contains("Window"),
      s"hopping lattice used a window operator:\n$plan")
    assert(!plan.contains("Join"),
      s"hopping lattice joined:\n$plan")
  }

  test("q97 k-means final assignment: a pure projection — native " +
       "squared_l2 kernels against centroid literals, no join, no " +
       "exchange below the presentation sort") {
    // the returned training assignment is localCheckpoint-materialized
    // (lineage truncated so the internal caches can be released), so
    // the kernel shape is pinned on the serve path, which builds the
    // IDENTICAL assignment plan un-checkpointed
    val e = Tables.embeddings(spark, dir)
    val (_, cents) = operators.Clustering.kmeansQuantized(
      e, "vec_id", "embedding", k = 3, iters = 1)
    val serve = physical(operators.Clustering.assignToCentroids(
      e, "vec_id", "embedding", cents))
    assert(serve.contains("squared_l2"),
      s"native Euclidean kernel missing from the assignment:\n$serve")
    assert(!serve.contains("Join"),
      s"k-means assignment joined instead of projecting:\n$serve")
    assert(!serve.contains("Exchange"),
      s"assignment introduced an exchange:\n$serve")
    // and the query itself: scan of the materialized assignment + the
    // ORDER BY vec_id presentation sort, nothing else
    val plan = physical(SparkEntry.queries("q97_kmeans")(spark, dir))
    assert(!plan.contains("Join"),
      s"k-means query joined instead of projecting:\n$plan")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"q97 introduced a non-sort exchange:\n$plan")
  }

  test("saltedJoinBySkew: hot set broadcasts to BOTH sides, join keys " +
       "carry the salt, never a product") {
    // the operator's whole scale story: the decision table (≤1e6/thr
    // keys) must reach fact and dim as a broadcast — a shuffled hot
    // tag would cost more than the skew it prevents — and the main
    // join must key on (key, __salt) so the hot key spreads
    val ev = Tables.events(spark, dir).select("user_id", "value")
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plan = physical(operators.Shuffles.saltedJoinBySkew(
      ev, cust, "user_id", salts = 8, thresholdPpm = 7000L))
    assert(!plan.contains("CartesianProduct"),
      s"auto-salted join planned a product:\n$plan")
    assert(plan.contains("__salt"),
      s"salt column missing from the join:\n$plan")
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2,
      s"hot-key tags did not broadcast to both sides ($bhj BHJ):\n$plan")
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  /** The finalized adaptive plan ONLY (the full string appends an
    * "== Initial Plan ==" section whose pre-replanning nodes would
    * double-count joins). */
  private def finalAdaptivePlan(df: DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    s.split("== Initial Plan ==").head
  }

  test("saltedJoinBySkew under AQE adversity: hot-tag broadcasts survive " +
       "adaptive execution with a tiny auto-broadcast threshold") {
    // the hot set must broadcast because the OPERATOR says so (explicit
    // broadcast() hints), not because the session's threshold happens to
    // be generous — AQE + a 1 KB threshold is the hostile configuration
    // that would expose a size-based accident. (hotKeysByShare's one-row
    // total legitimately plans as a broadcast nested-loop CROSS with a
    // scalar side — same as the non-AQE contract above — so the
    // degeneracy check is CartesianProduct, not BNLJ.)
    val ev = Tables.events(spark, dir).select("user_id", "value")
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    withConf("spark.sql.adaptive.enabled" -> "true",
             "spark.sql.autoBroadcastJoinThreshold" -> "1KB") {
      val df = operators.Shuffles.saltedJoinBySkew(
        ev, cust, "user_id", salts = 8, thresholdPpm = 7000L)
      df.collect() // finalize the adaptive plan
      val plan = finalAdaptivePlan(df)
      assert(plan.contains("AdaptiveSparkPlan"), s"AQE not engaged:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"salted join degenerated under AQE:\n$plan")
      assert(plan.contains("__salt"),
        s"salt column missing from the adaptive plan:\n$plan")
      val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      assert(bhj >= 2,
        s"hot-key tags lost their broadcast under AQE ($bhj BHJ):\n$plan")
    }
  }

  test("saltedJoinHot cold path under AQE: an empty hot set degrades to " +
       "the plain join — tag joins eliminated, one real join, same rows") {
    val ev = Tables.events(spark, dir).select("user_id", "value")
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val noHot = ev.select("user_id").filter(lit(false))
    withConf("spark.sql.adaptive.enabled" -> "true") {
      val df = operators.Shuffles.saltedJoinHot(
        ev, cust, "user_id", salts = 8, hotKeys = noHot)
      val got = df.collect().map(_.toString).sorted.toSeq
      val want = ev.join(cust, Seq("user_id"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, "cold salted join diverged from the plain join")
      val plan = finalAdaptivePlan(df)
      // AQE's empty-relation propagation must erase both hot-tag joins
      // (left outer against an empty broadcast side), leaving exactly
      // the fact⋈dim equi-join — zero replication, zero extra work
      val joins = plan.linesIterator
        .count(l => l.contains("Join") && !l.contains("ReusedExchange"))
      assert(joins == 1,
        s"cold path kept ${joins} joins — empty hot-tag joins survived:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"cold salted join planned a product:\n$plan")
    }
  }

  test("q162/q163 span dedup: equi-plans only, dup filter above a partial agg") {
    Seq("q162_dup_spans", "q163_span_cut").foreach { q =>
      val plan = physical(SparkEntry.queries(q)(spark, dir))
      // candidate generation is equi-join + window — never a product,
      // never a nested loop over gram rows
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q gram matching went non-equi:\n$plan")
      // the distinct-then-count dup set aggregates partially map-side
      // (two HashAggregate pairs: distinct + count), so a
      // boilerplate-heavy doc ships one row per gram family
      assert(plan.contains("HashAggregate"), s"$q lost the hash agg:\n$plan")
      // every window partitions on a key (doc id or gram hash) — a
      // global window would print an empty partition spec `, [], [`
      // and collapse to one task at corpus scale
      assert(!plan.contains(", [], ["),
        s"$q planned a global window/sort:\n$plan")
    }
  }

  test("q173 contamination flag joins broadcast the eval-set gram side") {
    val plan = physical(
      SparkEntry.queries("q173_contamination_spans")(spark, dir))
    // the benchmark gram set is eval-set-sized and pinned broadcast —
    // the corpus-sized gram stream must never sort-merge for the flag
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"q173 lost the broadcast semi flag join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q173 planned a product:\n$plan")
  }

  test("q164 interleaved pack: per-shard windows, no join anywhere") {
    val plan = physical(SparkEntry.queries("q164_interleaved_pack")(spark, dir))
    // items come from a union of two row-local projections; the fill
    // and the straddle flag are windows — the whole op is join-free
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"q164 planned a join:\n$plan")
    assert(plan.contains("Union"), s"q164 lost the modality union:\n$plan")
  }

  test("q182 phash near-dups: equi-join candidates, never a product") {
    val plan = physical(SparkEntry.queries("q182_phash_neardups")(spark, dir))
    // the pigeonhole bands make candidate generation an equi-join on
    // (chunk, chunk_val); a cartesian/all-pairs scan here is exactly
    // what the banding exists to avoid at crawl scale
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q182 planned a product:\n$plan")
  }

  test("q185 store serve: the BATCH side broadcasts into the store probe") {
    val plan = physical(
      SparkEntry.queries("q185_phash_store_serve")(spark, dir))
    // the store's band expansion is corpus-sized and must STREAM past
    // the broadcast probe; local AQE would happily invert this on the
    // tiny test store, so the build side is pinned in the operator
    assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildLeft"),
      s"q185 lost the batch-side broadcast build:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q185 planned a product:\n$plan")
  }

  test("q192 simhash store serve: the BATCH side broadcasts into the " +
       "store probe (shared core keeps the q185 contract)") {
    val plan = physical(
      SparkEntry.queries("q192_simhash_store_serve")(spark, dir))
    // Hamming.serveDedupCore pins broadcast(batch bands) for BOTH
    // lenses — the text store's band expansion is corpus-sized and
    // must stream past the probe exactly like the media store's
    assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildLeft"),
      s"q192 lost the batch-side broadcast build:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q192 planned a product:\n$plan")
  }

  test("q195 simhash decontam: eval probe broadcast, no product") {
    val plan = physical(
      SparkEntry.queries("q195_simhash_decontam")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"q195 lost the broadcast probe join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q195 planned a product:\n$plan")
  }

  test("q183 composed pipeline: benchmark flag join broadcast, no product") {
    val plan = physical(
      SparkEntry.queries("q183_pipeline_manifest")(spark, dir))
    // the span-decontam stage inside the composed chain keeps q173's
    // shape: the eval-set gram side broadcasts into a semi join — the
    // survivor-corpus gram stream must never sort-merge for the flag
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"q183 lost the broadcast semi flag join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q183 planned a product:\n$plan")
  }
}
