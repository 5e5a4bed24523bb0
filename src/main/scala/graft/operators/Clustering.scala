package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath

/** Corpus clustering — the grouping primitive a training-data pipeline
  * runs between dedup and sampling (topic balancing, domain discovery,
  * semantic-bucket curriculum: cluster the embedding space, then
  * sample/cap/mix per cluster with the q60/q61/q82 machinery).
  *
  * Reference scope: the reference pipeline (mabna_tables_update.py)
  * stops at relational maintenance; clustering is part of the
  * LLM-pipeline extension surface, same family as the ANN tier
  * (Similarity.scala).
  *
  * Design for 100 TB, which dictates everything here:
  *
  *  - Lloyd's k-means with k·dim driver-resident centroids. Centroids
  *    are metadata-scale (k ≤ a few thousand, dim ≤ a few thousand →
  *    MBs); the corpus NEVER shuffles. Assignment is a pure projection
  *    (k fused `squared_l2` kernel calls per row against centroid
  *    literals — whole-stage codegen, no join, no exchange), and the
  *    update step's only exchange is a map-side-combined
  *    (cluster, pos) partial-sum aggregate: k·dim·partitions rows,
  *    independent of corpus size.
  *  - Vectors are int8-quantized first (the `int8_quantize` kernel,
  *    q72's storage economics: a 100 TB f32 store scans 4× less as
  *    int8). Quantization also buys exactness: every component is an
  *    integral double, so distances are exact integers, centroid
  *    updates are floor-divided integer means (still integral), and
  *    the whole fixpoint iteration is bit-reproducible across engines
  *    — the DuckDB oracle replays ALL iterations, not a recall proxy.
  *  - Fixed iteration count, not convergence-test looping: at scale
  *    you budget passes over the data (each iteration is one scan);
  *    convergence deltas are observable from the returned centroids.
  *
  * Determinism contract: init = the k vectors with the smallest ids
  * (cluster id = rank in that order); assignment ties break toward the
  * smaller cluster id; empty clusters keep their previous centroid.
  */
object Clustering {

  /** One Lloyd assignment pass as a shuffle-free projection: per row,
    * `least()` over k (dist, cid) structs — lexicographic struct
    * ordering gives argmin-with-tie-on-cid in one codegen'd expression
    * tree. (`least` needs ≥ 2 arguments, so a single centroid — k=1,
    * or a corpus with one usable seed row — uses its struct directly.) */
  private def assign(qv: DataFrame, cents: Seq[(Int, Array[Double])]): DataFrame = {
    require(cents.nonEmpty, "no centroids: the quantized corpus yielded no seed rows")
    val structs = cents.map { case (cid, c) =>
      struct(
        ArrayMath.squaredL2(col("__qv"), typedlit(c.toSeq)).cast("long").as("d"),
        lit(cid).as("c"))
    }
    val best = if (structs.size == 1) structs.head else least(structs: _*)
    qv.withColumn("__best", best)
      .select(col("__id"), col("__qv"),
        col("__best.c").as("cluster"), col("__best.d").as("dist"))
  }

  /** Fixed-iteration k-means over the int8-quantized embedding space.
    *
    * Returns (assignments, centroids):
    *  - assignments: (id, cluster, dist) — dist is the EXACT integer
    *    squared L2 to the final centroid;
    *  - centroids: the final `(cluster, centroid: array<double>)`
    *    (integral components) so callers can persist/reuse them
    *    (e.g. as frozen IVF coarse centroids, q83-style).
    *
    * `iters` centroid updates are performed, then one final assignment
    * against the updated centroids. Each update runs one corpus scan;
    * the quantized projection is cached for the loop (the cluster-scale
    * analog is materializing the int8 column once — the pay-once
    * layout discipline of TextOps.writePostingIndex).
    *
    * Driver-side state is k·dim doubles per iteration (the update
    * aggregate's k·dim-row result — metadata-scale, same bound class
    * as the partition-list collects documented at TextOps.scala). */
  def kmeansQuantized(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int,
                      keepVec: Boolean = false): (DataFrame, Seq[(Int, Array[Double])]) = {
    require(k > 0, s"k=$k must be positive")
    require(iters >= 0, s"iters=$iters must be non-negative")
    ArrayMath.register(corpus.sparkSession)
    val qv = corpus
      .select(col(idCol).as("__id"),
        ArrayMath.int8Quantize(col(vecCol)).as("__qv"))
      .where(col("__qv").isNotNull)
      .persist()
    try {
      // init: the k smallest ids, cluster id = rank in id order.
      // TakeOrderedAndProject — per-partition heap, k·dim to the driver.
      var cents: Seq[(Int, Array[Double])] =
        qv.orderBy("__id").limit(k).collect().zipWithIndex.map {
          case (r, i) => (i, r.getSeq[Double](1).toArray)
        }.toSeq
      for (_ <- 0 until iters) {
        // update: component sums per cluster — the ONLY exchange in the
        // loop, k·dim groups, map-side combined. floor(sum/n) keeps
        // centroids integral (sums are integers < 2^53: exact in double
        // in any order, so the aggregate is associative and the oracle
        // replays it).
        val sums = assign(qv, cents)
          .select(col("cluster"), posexplode(col("__qv")).as(Seq("pos", "val")))
          .groupBy("cluster", "pos")
          .agg(sum("val").as("s"), count(lit(1)).as("n"))
          .select(col("cluster"), col("pos"),
            floor(col("s") / col("n").cast("double")).cast("double").as("m"))
          .collect()
        val byCluster: Map[Int, Map[Int, Double]] = sums
          .groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            cid -> rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
          }
        cents = cents.map { case (cid, old) =>
          byCluster.get(cid) match {
            case Some(m) => (cid, Array.tabulate(old.length)(p => m(p)))
            case None    => (cid, old) // empty cluster keeps its centroid
          }
        }
      }
      // materialize the final assignment BEFORE the cached quantized
      // projection is released: a lazy result over an unpersisted qv
      // would re-quantize the source on every downstream action.
      // localCheckpoint (not persist) so the blocks belong to the
      // returned Dataset's lineage-truncated RDD — the ContextCleaner
      // reclaims them when the caller drops the reference, instead of
      // accumulating session-lifetime cache entries.
      // keepVec returns the quantized vector with the assignment so
      // pair-forming consumers (SemDedup) don't pay a SECOND
      // O(n·k·dim) assignment pass just to re-attach vectors — at
      // k ∝ n (the SemDeDup prescription) that pass is the single
      // largest cost in the composition (measured in the sem storm).
      val outCols = Seq(col("__id").as("id"),
        col("cluster").cast("int"), col("dist")) ++
        (if (keepVec) Seq(col("__qv").as("qv")) else Nil)
      val out = assign(qv, cents).select(outCols: _*)
        .localCheckpoint(eager = true)
      (out, cents)
    } finally qv.unpersist(blocking = false)
  }

  /** Serve-path assignment against FROZEN centroids (the q83
    * frozen-quantizer discipline applied to k-means): quantize and
    * assign a batch without touching the training corpus — the
    * shuffle-free projection that routes new documents into an
    * existing cluster structure (cluster-balanced sampling, semantic
    * routing, incremental cluster stores). Same arithmetic as the
    * training loop's assignment, so batch ∪ train assigned here ≡ one
    * full run's final assignment (law in ClusteringSpec). */
  def assignToCentroids(batch: DataFrame, idCol: String, vecCol: String,
                        cents: Seq[(Int, Array[Double])]): DataFrame =
    assignToCentroidsKeepVec(batch, idCol, vecCol, cents).drop("qv")

  /** Driver-side integer Lloyd over a METADATA-scale point set (the k
    * fine centroids — k·dim doubles, never data). Mirrors the
    * distributed loop's rules exactly — init = the k smallest ids in
    * id order (cluster id = rank), argmin ties toward the smaller id,
    * floor(sum/n) means on exact integral sums, empty clusters keep
    * their centroid — so the SQL oracle can replay it with the same
    * CTE shapes it uses for the distributed loop. */
  private[operators] def lloydIntegral(points: Seq[(Int, Array[Double])],
                                       k: Int, iters: Int): Seq[(Int, Array[Double])] = {
    require(points.nonEmpty, "no points")
    val dim = points.head._2.length
    var cents: Seq[(Int, Array[Double])] =
      points.sortBy(_._1).take(k).zipWithIndex.map {
        case ((_, v), i) => (i, v.clone())
      }
    for (_ <- 0 until iters) {
      val byC = points
        .map { case (_, v) => (nearestIntegral(v, cents)._1, v) }
        .groupBy(_._1)
      cents = cents.map { case (c, old) =>
        byC.get(c) match {
          case Some(vs) =>
            val n = vs.size
            (c, Array.tabulate(dim)(p =>
              math.floor(vs.iterator.map(_._2(p)).sum / n)))
          case None => (c, old)
        }
      }
    }
    cents
  }

  /** Exact integer argmin over centroids sorted by id — strict `<`
    * keeps the first (smallest-id) centroid on distance ties, the
    * same rule as the distributed `least(struct(d, c))`. */
  private def nearestIntegral(v: Array[Double],
                              cents: Seq[(Int, Array[Double])]): (Int, Double) = {
    var bestC = Int.MaxValue
    var bestD = Double.PositiveInfinity
    cents.sortBy(_._1).foreach { case (c, cv) =>
      var d = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; bestC = c }
    }
    (bestC, bestD)
  }

  /** TWO-LEVEL assignment against frozen centroids — the large-k scale
    * path (the faiss IMI shape): cluster the k fine centroids into
    * ~√k coarse cells ON THE DRIVER ([[lloydIntegral]] — the
    * centroids are metadata, never data), route each row to its
    * nearest non-empty coarse cell, then argmin only over that cell's
    * fine centroids. Per-row cost drops from O(k·dim) to
    * O((k' + k/k')·dim) ≈ O(2√k·dim) — the difference between linear
    * and quadratic total work when k scales with the corpus
    * (SemDeDup's k ≈ n/256; see the sem storm in SCALE.md).
    *
    * This is an APPROXIMATION of the exact argmin: a row whose true
    * nearest fine centroid sits in a different coarse cell is routed
    * past it (q126 audits the agreement rate in-query). But it is a
    * DETERMINISTIC approximation — driver Lloyd mirrors the
    * distributed rules bit-for-bit, ties break identically at both
    * levels, all arithmetic is exact integers — so the full two-level
    * rule replays in the SQL oracle, certified like everything else,
    * and with coarseK = 1 it degenerates to the exact argmin (law).
    * Cells that attract no fine centroid are excluded from routing. */
  def assignToCentroidsTwoLevel(batch: DataFrame, idCol: String,
                                vecCol: String,
                                cents: Seq[(Int, Array[Double])],
                                coarseK: Int, coarseIters: Int): DataFrame = {
    require(cents.nonEmpty, "no centroids")
    require(coarseK > 0 && coarseIters >= 0, "bad coarse sizing")
    ArrayMath.register(batch.sparkSession)
    val coarse = lloydIntegral(cents, coarseK, coarseIters)
    val centMap = cents.toMap
    val cells: Map[Int, Seq[Int]] = cents
      .map { case (fc, v) => (nearestIntegral(v, coarse)._1, fc) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val coarseMap = coarse.toMap
    val qv = batch
      .select(col(idCol).as("__id"),
        ArrayMath.int8Quantize(col(vecCol)).as("__qv"))
      .where(col("__qv").isNotNull)
    val nonEmpty = cells.keys.toSeq.sorted
    val coarseStructs = nonEmpty.map { kc =>
      struct(
        ArrayMath.squaredL2(col("__qv"), typedlit(coarseMap(kc).toSeq))
          .cast("long").as("d"),
        lit(kc).as("c"))
    }
    val cBest =
      if (coarseStructs.size == 1) coarseStructs.head
      else least(coarseStructs: _*)
    def fineFor(kc: Int) = {
      val ss = cells(kc).map { fc =>
        struct(
          ArrayMath.squaredL2(col("__qv"), typedlit(centMap(fc).toSeq))
            .cast("long").as("d"),
          lit(fc).as("c"))
      }
      if (ss.size == 1) ss.head else least(ss: _*)
    }
    val caseExpr = nonEmpty.tail.foldLeft(
      when(col("__kc") === nonEmpty.head, fineFor(nonEmpty.head))) {
      (acc, kc) => acc.when(col("__kc") === kc, fineFor(kc))
    }
    qv.withColumn("__kc", cBest.getField("c"))
      .withColumn("__best", caseExpr)
      .select(col("__id").as("id"),
        col("__best").getField("c").cast("int").as("cluster"),
        col("__best").getField("d").as("dist"))
  }

  /** [[assignToCentroids]] that also RETURNS the int8-quantized vector
    * (`qv: array<double>`, integral components) alongside
    * (id, cluster, dist) — for consumers that pair rows AFTER routing
    * (SemDedup's within-cluster similarity) and would otherwise pay a
    * corpus-sized join to re-attach vectors to assignments. */
  def assignToCentroidsKeepVec(batch: DataFrame, idCol: String,
                               vecCol: String,
                               cents: Seq[(Int, Array[Double])]): DataFrame = {
    require(cents.nonEmpty, "no centroids")
    ArrayMath.register(batch.sparkSession)
    val qv = batch
      .select(col(idCol).as("__id"),
        ArrayMath.int8Quantize(col(vecCol)).as("__qv"))
      .where(col("__qv").isNotNull)
    assign(qv, cents).select(col("__id").as("id"),
      col("cluster").cast("int"), col("dist"), col("__qv").as("qv"))
  }
}
