package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for [[Graphs.pageRankFixed]]. The q98 oracle certifies the
  * full iteration against DuckDB on the trade graph; these pin the
  * arithmetic contract on hand-computable graphs. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private val S = Graphs.RankScale

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.pageRankFixed(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-cycle: the uniform distribution is an exact fixpoint") {
    // r0 = S/2 each; contrib = (S/2 DIV 1)*85 DIV 100; base = 15S/200
    // → r1 = S/2 again, for every iteration count
    for (it <- Seq(0, 1, 3)) {
      val m = ranks(Seq((1L, 2L), (2L, 1L)), it)
      assert(m == Map(1L -> S / 2, 2L -> S / 2), s"iters=$it broke the fixpoint")
    }
  }

  test("one dangling edge: hand-computed single pass") {
    // a→b, N=2: a keeps only the teleport base, b gets base + damped a
    val m = ranks(Seq((1L, 2L)), 1)
    val base = S * 15 / 200
    assert(m(1L) == base)
    assert(m(2L) == base + (S / 2) * 85 / 100)
  }

  test("iters=0 is the uniform start") {
    val m = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 0)
    assert(m.values.toSet == Set(S / 3))
  }

  test("duplicate edges collapse (multi-edge is not double mass)") {
    val once = ranks(Seq((1L, 2L), (2L, 1L)), 2)
    val dup = ranks(Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L)), 2)
    assert(once == dup)
  }

  test("hub of a symmetrized star outranks its spokes") {
    val star = (2L to 9L).flatMap(s => Seq((1L, s), (s, 1L)))
    val m = ranks(star, 3)
    assert((2L to 9L).forall(s => m(1L) > m(s)))
    // spokes are symmetric → identical ranks
    assert((2L to 9L).map(m).toSet.size == 1)
  }

  test("dangling redistribution conserves rank mass to flooring loss; " +
       "the default visibly leaks on a dangling-heavy graph") {
    // star into a sink: 1..8 each point at 0 — node 0 holds most of
    // the mass and has no out-edges, the worst case for the default
    import spark.implicits._
    val edges = (1L to 8L).map(i => (i, 0L)).toDF("src", "dst")
    def total(flag: Boolean): Long =
      Graphs.pageRankFixed(edges, iters = 3, redistributeDangling = flag)
        .agg(org.apache.spark.sql.functions.sum("rank_scaled"))
        .first().getLong(0)
    val on = total(true)
    val off = total(false)
    // flooring loses < 1 unit per floor-div per node per pass: with 9
    // nodes, 8 edges, 3 passes the bound is tiny next to RankScale
    val bound = 3L * (2 * 9 + 8 + 2)
    assert(Graphs.RankScale - on <= bound,
      s"redistribution still lost ${Graphs.RankScale - on} (> $bound)")
    assert(Graphs.RankScale - off > Graphs.RankScale / 10,
      s"expected the default to leak visibly here, lost only ${Graphs.RankScale - off}")
    // deterministic under repartitioning, like the base operator
    val a = Graphs.pageRankFixed(edges, 3, redistributeDangling = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graphs.pageRankFixed(edges.repartition(5), 3,
        redistributeDangling = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("rank mass is conserved up to floor loss, never created") {
    val edges = (1L to 50L).map(i => (i, i % 50 + 1)) ++
      (1L to 25L).map(i => (i, 51 - i))
    val m = ranks(edges, 3)
    val total = m.values.sum
    assert(total <= S)
    assert(total > S * 99 / 100, s"floor loss too large: $total of $S")
  }

  test("deterministic under repartitioning") {
    val edges = ((1L to 30L).map(i => (i, (i * 7) % 30 + 1)) ++
      (1L to 30L).map(i => ((i * 7) % 30 + 1, i))).toDF("src", "dst")
    val a = Graphs.pageRankFixed(edges, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graphs.pageRankFixed(edges.repartition(7), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  private def labels(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.labelPropagation(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("LPA hand-computed round on a symmetrized chain") {
    // 1-2-3: after one synchronous round, ends adopt the middle's
    // label and the middle tie-breaks to the smaller end
    val chain = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    assert(labels(chain, 1) == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    // round 2 oscillates back through the bipartite-ish structure
    assert(labels(chain, 2) == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("LPA labels never cross a component boundary") {
    val cliqueA = for (i <- 1L to 4L; j <- 1L to 4L if i != j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i != j) yield (i, j)
    val m = labels(cliqueA ++ cliqueB, 4)
    assert((1L to 4L).forall(n => m(n) <= 4L))
    assert((10L to 13L).forall(n => m(n) >= 10L))
  }

  test("LPA: a node with no in-edges keeps its own label") {
    val m = labels(Seq((1L, 2L)), 3)
    assert(m(1L) == 1L)
    assert(m(2L) == 1L) // 2's only voter is 1, every round
  }

  test("LPA iters=0 is the identity labeling and runs are deterministic") {
    val edges = ((1L to 20L).map(i => (i, i % 20 + 1)) ++
      (1L to 20L).map(i => (i % 20 + 1, i)))
    assert(labels(edges, 0) == (1L to 20L).map(i => i -> i).toMap)
    assert(labels(edges, 3) == labels(edges, 3))
  }

  test("skew-aware LPA ≡ plain for any threshold/salt on a celebrity graph") {
    // node 1 is the celebrity: every node votes into it; plus a chain
    // and a second community so labels actually move and tie-break
    val rnd = new scala.util.Random(11)
    val celeb = (2L to 60L).map(i => (i, 1L))
    val chain = (2L to 59L).map(i => (i, i + 1))
    val back = (1L to 30L).map(i => (1L, i * 2))
    val noise = Seq.fill(80)((rnd.nextInt(58) + 2).toLong ->
      (rnd.nextInt(58) + 2).toLong).filter(p => p._1 != p._2)
    val edges = (celeb ++ chain ++ back ++ noise).toDF("src", "dst")
    val plain = Graphs.labelPropagation(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // threshold 1 ppm: EVERY dst is hot (fully salted); 1e6: none is
    // (plain path through the gated plan); 10000: only the celebrity
    for ((ppm, salts) <- Seq((1L, 4), (10000L, 8), (1000000L, 3))) {
      val salted = Graphs.labelPropagationSkewAware(edges, 3,
          salts = salts, thresholdPpm = ppm)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(salted == plain, s"diverged at ppm=$ppm salts=$salts")
    }
  }
}
