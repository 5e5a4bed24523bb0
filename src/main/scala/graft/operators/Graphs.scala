package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge tables — the link-structure primitives a
  * corpus pipeline runs for source credibility (rank a domain/citation
  * graph, weight documents by the rank of where they came from) and
  * for influence analysis over interaction graphs. Near-dup clustering
  * already has its own iterative graph op (TextOps.connectedComponents,
  * the keeper-selection substrate); this module holds the general
  * ranked-propagation family.
  *
  * Scale shape (the classic one): an iteration is (ranks ⋈ edges on
  * src) → groupBy dst — two key shuffles over slim (node, long) rows,
  * never a vector or payload. Edges are hash-partitioned ONCE on src
  * and cached; every iteration's join reuses that layout, so the
  * per-iteration cost is one shuffle of the (small) rank table plus
  * one aggregate. Fixed iteration count: at 100 TB you budget passes,
  * you don't loop on a convergence test (deltas are observable from
  * successive rank tables).
  *
  * Arithmetic contract: ranks are SCALED INTEGERS (parts-per-10^12 of
  * total rank mass). Contributions are floor-divided
  * (`(r DIV outdeg) * damp_num DIV damp_den`), sums are exact BIGINT —
  * every step is integer arithmetic, so a replay in any engine is
  * bit-identical (same discipline as the quantized k-means: determinism
  * by integerization, not by rounding-tolerance). The tiny mass lost to
  * flooring is deliberate — this is "integer PageRank", reproducible
  * forever, not IEEE-order-dependent.
  */
object Graphs {

  val RankScale: Long = 1000000000000L // 10^12 — rank mass denominator

  /** Fixed-iteration PageRank over a directed edge list.
    *
    * `edges` must be (src: long, dst: long); duplicates are collapsed.
    * Every node appearing as a src or dst participates. Dangling nodes
    * (no out-edges): by default they contribute nothing per iteration
    * (their mass fades to the teleport term — the standard simple
    * treatment; symmetrize upstream if that suffices). With
    * `redistributeDangling` the standard redistribution term runs
    * instead: each pass sums the dangling nodes' rank (ONE node-sized
    * scalar aggregate), damps it, and floor-splits it evenly across
    * all nodes — integer-exact, so the oracle replays it, and rank
    * mass is conserved up to flooring loss (law in GraphsSpec).
    * The flag also switches the loop to per-pass materialization:
    * the dangling scalar is a second consumer of each pass's ranks,
    * and feeding both from the lazy chain would double the plan tree
    * per iteration (2^iters growth); a node-sized localCheckpoint per
    * pass keeps the cost one rank-table scan per consumer.
    *
    * damping = dampNum/dampDen (default 85/100); iters full update
    * passes. Returns (node, rank_scaled: long) where rank_scaled is
    * the node's share of RankScale. */
  def pageRankFixed(edges: DataFrame, iters: Int,
                    dampNum: Long = 85L, dampDen: Long = 100L,
                    redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 0, s"iters=$iters must be non-negative")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen outside [0, 1]")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // pay the edge layout FIRST and derive everything node-sized from
    // the cache: (src, dst) partitioned on src, reused by every
    // iteration. The rank join is hinted shuffle-hash with the
    // node-sized side as the build: sort-merge would re-sort the big
    // immutable edge partitions every iteration (measured on the 10×
    // storm, 12M edges: the whole 3-pass run drops 68 s → 34 s with
    // the lean cache + hash joins + node-sized send table). Ordering
    // matters (round-19, guide §1.2/§2.4): the earlier setup built
    // nodes, deg and ed each directly over `e`, so the upstream
    // edge-derivation plan (join + union + distinct on composed
    // callers) ran THREE times before the first iteration — measured
    // 4.7 s of q98's 10.7 s wall. Caching ed once and folding the
    // node set + out-degree into ONE aggregate over it removes two
    // full upstream passes and a node-sized join.
    val ed = e.repartition(col("src")).persist()
    ed.count()
    // out-degrees live in a separate node-sized table: attaching them
    // to every edge row would make the per-iteration join carry the
    // degree 12M times instead of computing each node's send value
    // ONCE on N rows and only then replicating it along edges. One
    // aggregate over the cached edges yields the node UNIVERSE and the
    // out-degree together: outdeg = count of src rows (edges are
    // distinct), a dst-only node sums its zero src markers to 0 —
    // exactly the old left-join-with-coalesce semantics.
    val deg = ed.select(col("src").as("node"), lit(1L).as("__c"))
      .union(ed.select(col("dst").as("node"), lit(0L).as("__c")))
      .groupBy(col("node")).agg(sum(col("__c")).as("outdeg"))
      .persist()
    val nn = deg.count() // also materializes the degree cache
    require(nn > 0, "empty graph")
    val nodes = deg.select(col("node"))
    try {
      val base = (RankScale * (dampDen - dampNum)) / (dampDen * nn)
      var ranks = nodes.select(col("node"), lit(RankScale / nn).as("r"))
      for (_ <- 0 until iters) {
        val cur = if (redistributeDangling)
          ranks.localCheckpoint(eager = true) else ranks
        // dangling mass, damped and floor-split evenly: the standard
        // redistribution term, one scalar per pass (metadata-scale)
        val share = if (!redistributeDangling) 0L else {
          val dang = cur.join(deg.hint("shuffle_hash"), "node")
            .where(col("outdeg") === 0)
            .agg(coalesce(sum(col("r")), lit(0L)))
            .first().getLong(0)
          dang * dampNum / dampDen / nn
        }
        val send = cur.join(deg.hint("shuffle_hash"), "node")
          .where(col("outdeg") > 0)
          .select(col("node").as("src"),
            expr(s"(r DIV outdeg) * $dampNum DIV $dampDen").as("c"))
        val contrib = ed.join(send.hint("shuffle_hash"), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("c")).as("c"))
        ranks = nodes
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(base + share) + coalesce(col("c"), lit(0L))).as("r"))
      }
      // materialize before releasing the cached layouts: iterating
      // lazily over unpersisted inputs would rescan the source per
      // step. localCheckpoint, not persist: the blocks ride the
      // returned Dataset's lineage-truncated RDD, so the
      // ContextCleaner frees them once the caller drops the result —
      // a persisted return would accumulate session-lifetime cache
      // entries nobody can unpersist.
      ranks.select(col("node"), col("r").as("rank_scaled"))
        .localCheckpoint(eager = true)
    } finally {
      ed.unpersist(blocking = false)
      deg.unpersist(blocking = false)
    }
  }

  /** Fixed-iteration synchronous label propagation — community
    * detection (the frequency flavor: each node adopts the most
    * frequent label among its in-neighbors, ties toward the smaller
    * label; contrast TextOps.connectedComponents' min-label flavor,
    * which finds components, not communities). Labels start as node
    * ids; `iters` synchronous rounds; a node with no in-edges keeps
    * its label. Deterministic by construction — counts are integers
    * and every tie has a total order — so a SQL replay is exact,
    * unlike the randomized-order LPA of the literature.
    *
    * Same per-iteration shape as [[pageRankFixed]]: one slim
    * (node, label) join against the cached src-partitioned edges, one
    * (dst, label) counting aggregate, one argmax — nothing wider than
    * two longs ever shuffles. */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters=$iters must be non-negative")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // cache the edge layout FIRST; the node universe derives from the
    // cache instead of re-running the caller's edge plan a second time
    // (the pageRankFixed round-19 setup-ordering fix)
    val ed = e.repartition(col("src")).persist()
    ed.count()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct()
      .persist()
    nodes.count()
    try {
      var labels = nodes.select(col("node"), col("node").as("label"))
      for (_ <- 0 until iters) {
        val top = ed
          .join(labels.withColumnRenamed("node", "src").hint("shuffle_hash"),
            "src")
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("__c"))
          .groupBy(col("dst").as("node"))
          .agg(min(struct((-col("__c")).as("nc"), col("label").as("l")))
            .as("__m"))
          .select(col("node"), col("__m.l").as("__new"))
        labels = labels.join(top, Seq("node"), "left")
          .select(col("node"), coalesce(col("__new"), col("label")).as("label"))
      }
      // same release discipline as pageRankFixed: lineage-truncated
      // materialization the ContextCleaner can reclaim, no cache leak.
      labels.localCheckpoint(eager = true)
    } finally { ed.unpersist(blocking = false); nodes.unpersist(blocking = false) }
  }

  /** [[labelPropagation]] with the count/argmax aggregates
    * skew-hardened for celebrity nodes — the audit→action discipline of
    * [[Shuffles.saltedJoinBySkew]] (q148) applied to an AGGREGATE: at
    * crawl scale a node with 10⁸ in-edges makes `groupBy(dst, label)`
    * useless map-side in iteration 0 (labels start unique, so nothing
    * combines) and funnels its whole in-neighborhood's distinct labels
    * into the one `dst` argmax reducer.
    *
    * The audit runs ONCE (in-degree is iteration-invariant): dst keys
    * holding ≥ `thresholdPpm` of the edge rows ([[Shuffles
    * .hotKeysByShare]] — bounded by construction, always broadcasts).
    * Per iteration, ONLY those keys take the salted path: the label
    * count splits per (dst, label, hash(src) % salts) then sums — an
    * exact integer refold — and the argmax splits per
    * (dst, hash(label) % salts) partial-min then final min — min of a
    * struct is associative, so min-of-mins ≡ the global min. Cold keys
    * aggregate plain under salt 0. Law (GraphsSpec): ≡
    * [[labelPropagation]] for ANY threshold/salts — correctness never
    * depends on the audit, only the skew protection does.
    *
    * Measured honesty (lpaskew storm, 24M edges / 30% into 3 celebrity
    * dsts): the PLAIN form wins there (56 vs 76 s) — count and min
    * partials combine map-side and the composite (dst, label) key
    * hash-spreads a celebrity's rows, so Spark's two-phase aggregation
    * already absorbs this skew class. This variant is insurance for
    * the regime that measurement can't reach in-memory: per-task
    * partial-agg hash maps spilling to sort-fallback on a node whose
    * in-neighborhood exceeds executor memory. Default to
    * [[labelPropagation]]; reach for this when the skew audit (q145)
    * shows single keys holding whole-executor shares. */
  def labelPropagationSkewAware(edges: DataFrame, iters: Int,
                                salts: Int = 8,
                                thresholdPpm: Long = 10000L): DataFrame = {
    require(iters >= 0, s"iters=$iters must be non-negative")
    require(salts > 0, s"salts=$salts must be positive")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // same setup ordering as labelPropagation: edge cache first, node
    // universe from the cache
    val ed = e.repartition(col("src")).persist()
    ed.count()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct()
      .persist()
    nodes.count()
    // one audit for the whole run: key-list-sized, broadcast into every
    // iteration (the q148 reuse discipline — hotKeysByShare is split
    // out exactly so a loop pays the fact scan once)
    val hot = Shuffles.hotKeysByShare(ed, "dst", thresholdPpm)
      .select(col("dst"), lit(true).as("__hot"))
      .localCheckpoint(eager = true)
    try {
      var labels = nodes.select(col("node"), col("node").as("label"))
      for (_ <- 0 until iters) {
        val contrib = ed
          .join(labels.withColumnRenamed("node", "src").hint("shuffle_hash"),
            "src")
          .join(broadcast(hot), Seq("dst"), "left")
          .withColumn("__s1", when(col("__hot"),
            pmod(xxhash64(col("src")), lit(salts.toLong)).cast("int"))
            .otherwise(lit(0)))
        val cnt = contrib
          .groupBy(col("dst"), col("label"), col("__s1"))
          .agg(count(lit(1)).as("__pc"))
          .groupBy(col("dst"), col("label"))
          .agg(sum(col("__pc")).as("__c"))
        val top = cnt
          .join(broadcast(hot), Seq("dst"), "left")
          .withColumn("__s2", when(col("__hot"),
            pmod(xxhash64(col("label")), lit(salts.toLong)).cast("int"))
            .otherwise(lit(0)))
          .groupBy(col("dst"), col("__s2"))
          .agg(min(struct((-col("__c")).as("nc"), col("label").as("l")))
            .as("__pm"))
          .groupBy(col("dst").as("node"))
          .agg(min(col("__pm")).as("__m"))
          .select(col("node"), col("__m.l").as("__new"))
        labels = labels.join(top, Seq("node"), "left")
          .select(col("node"), coalesce(col("__new"), col("label")).as("label"))
      }
      labels.localCheckpoint(eager = true)
    } finally { ed.unpersist(blocking = false); nodes.unpersist(blocking = false) }
  }
}
