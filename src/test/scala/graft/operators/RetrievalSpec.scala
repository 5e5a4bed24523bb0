package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def arm(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("query_id", "doc_id", "rank")

  private def collectFused(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("query_id", "rank").collect().map(_.toSeq.toSeq).toSeq

  test("single-arm fusion preserves the arm's ranking exactly") {
    val a = arm((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L))
    val fused = Retrieval.rrfFuse(Seq("a" -> a), k = 10)
    val got = fused.select("query_id", "rank", "doc_id").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L), (2L, 2L, 21L)))
    // audit column carries the arm rank verbatim
    assert(fused.filter(col("a_rank") =!= col("rank")).count() == 0)
  }

  test("fusion is arm-order invariant and consensus outranks single-arm") {
    val lex = arm((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val vec = arm((1L, 11L, 1L), (1L, 13L, 2L), (1L, 10L, 3L))
    val ab = collectFused(Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec), 10))
    val ba = collectFused(
      Retrieval.rrfFuse(Seq("vec" -> vec, "lex" -> lex), 10)
        .select("query_id", "rank", "doc_id", "rrf_score",
          "lex_rank", "vec_rank"))
    assert(ab == ba, "RRF must not depend on arm order")
    // docs 10 and 11 appear in both arms; 12 and 13 in one each —
    // every two-arm doc must outrank every one-arm doc here because
    // a single arm's best weight (rank 1) is below any two-arm sum
    val ranks = Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec), 10)
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    assert(Set(ranks(10L), ranks(11L)) == Set(1L, 2L))
    assert(Set(ranks(12L), ranks(13L)) == Set(3L, 4L))
  }

  test("hand-computed fixture: scores are the exact integer sums") {
    val lex = arm((1L, 10L, 1L), (1L, 11L, 2L))
    val vec = arm((1L, 11L, 1L), (1L, 12L, 2L))
    val got = Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec), 10)
      .select("doc_id", "rrf_score").as[(Long, Long)].collect().toMap
    val w = (r: Long) => Retrieval.RrfScale / (60L + r)
    assert(got == Map(10L -> w(1), 11L -> (w(2) + w(1)), 12L -> w(2)))
  }

  test("ties on fused score break by doc_id; k cuts after ranking") {
    // two docs each rank-1 in exactly one arm → identical scores
    val lex = arm((1L, 20L, 1L))
    val vec = arm((1L, 10L, 1L))
    val got = Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec), 1)
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L)), "tie must break to the smaller doc_id")
  }

  test("law: fused order equals a driver-side reference RRF on random " +
       "per-query rankings (and scaled-integer weights lose no rank " +
       "information at practical depths)") {
    // random-order distinct doc lists = arbitrary per-arm rankings
    val armGen = Gen.listOfN(2,
      Gen.listOfN(10, Gen.choose(0L, 14L)).map(_.distinct))
    val prop = Prop.forAll(armGen) { docLists =>
      val arms = docLists.zipWithIndex.map { case (docs, i) =>
        s"m$i" -> arm(docs.zipWithIndex.map {
          case (d, r) => (1L, d, (r + 1).toLong) }: _*)
      }
      val got = Retrieval.rrfFuse(arms, k = 100)
        .select("rank", "doc_id").as[(Long, Long)].collect()
        .sortBy(_._1).map(_._2).toSeq
      // reference: driver-side integer RRF (exact longs — k ≤ 15 keeps
      // floor(S/(60+r)) injective in r, so no rank info is lost)
      val ref = docLists
        .flatMap(docs => docs.zipWithIndex)
        .groupBy(_._1)
        .map { case (d, xs) =>
          (d, xs.map(x => Retrieval.RrfScale / (60L + x._2 + 1)).sum) }
        .toSeq.sortBy { case (d, s) => (-s, d) }.map(_._1)
      got == ref
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  private def rel(rows: (Long, Long)*): DataFrame =
    rows.toSeq.toDF("query_id", "neighbor_id")

  private def armN(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("query_id", "neighbor_id", "rank")

  test("rankingMetrics: a perfect arm scores mrr = ndcg = 1.0 and " +
       "sum_dcg = sum_idcg") {
    val exact = rel((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
    val perfect = armN((1L, 10L, 1L), (1L, 11L, 2L),
      (2L, 20L, 1L), (2L, 21L, 2L))
    val row = Retrieval.rankingMetrics(Seq("p" -> perfect), exact, k = 2)
      .collect().head
    assert(row.getAs[Double]("mrr") == 1.0)
    assert(row.getAs[Double]("ndcg") == 1.0)
    assert(row.getAs[Long]("sum_dcg") == row.getAs[Long]("sum_idcg"))
    assert(row.getAs[Long]("n_queries") == 2L)
  }

  test("rankingMetrics: hand-computed fixture — integer sums, missed " +
       "query contributes zero, junk at rank 1 halves the query's RR") {
    val d = Retrieval.dcgDiscounts
    val exact = rel((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
    // q1: junk doc 99 at rank 1, hits at 2 and 3; q2: missed entirely
    val a = armN((1L, 99L, 1L), (1L, 10L, 2L), (1L, 11L, 3L))
    val row = Retrieval.rankingMetrics(Seq("a" -> a), exact, k = 3)
      .collect().head
    assert(row.getAs[Long]("sum_rr") == Retrieval.DcgScale / 2)
    assert(row.getAs[Long]("sum_dcg") == d(1) + d(2)) // disc(2)+disc(3)
    assert(row.getAs[Long]("sum_idcg") == 2 * (d(0) + d(1) + d(2)))
    assert(row.getAs[Double]("mrr") ==
      math.rint(1e6 * (Retrieval.DcgScale / 2).toDouble /
        (2L * Retrieval.DcgScale).toDouble) / 1e6)
  }

  test("rankingMetrics law: equals a driver-side reference on random " +
       "arms (binary-gain DCG over the inlined discount table)") {
    val k = 5
    val gen = for {
      armDocs <- Gen.listOfN(3, Gen.listOfN(k, Gen.choose(0L, 9L))
        .map(_.distinct))
      relDocs <- Gen.listOfN(4, Gen.choose(0L, 9L)).map(_.distinct)
        .suchThat(_.nonEmpty)
    } yield (armDocs, relDocs)
    val prop = Prop.forAll(gen) { case (armDocs, relDocs) =>
      val exact = rel(relDocs.map(d => (1L, d)): _*)
      val arms = armDocs.zipWithIndex.map { case (docs, i) =>
        s"m$i" -> armN(docs.zipWithIndex.map {
          case (dd, r) => (1L, dd, (r + 1).toLong) }: _*)
      }
      val got = Retrieval.rankingMetrics(arms, exact, k)
        .select("method", "sum_rr", "sum_dcg").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val ref = armDocs.zipWithIndex.flatMap { case (docs, i) =>
        val hits = docs.zipWithIndex.collect {
          case (dd, r) if relDocs.contains(dd) => r + 1
        }
        if (hits.isEmpty) None
        else Some((s"m$i", Retrieval.DcgScale / hits.min,
          hits.map(r => Retrieval.dcgDiscounts(r - 1)).sum))
      }.toSet
      got == ref
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  test("hardNegatives: positives drop, negatives re-rank densely, cap holds") {
    import spark.implicits._
    val retrieved = Seq(
      // q1: ranks 1-5, positives at 1 and 3
      (1L, 1L, 101L), (1L, 2L, 102L), (1L, 3L, 103L), (1L, 4L, 104L),
      (1L, 5L, 105L),
      // q2: all positives — no negatives at all
      (2L, 1L, 201L), (2L, 2L, 202L),
      // q3: no positives — negatives are the list itself, capped
      (3L, 1L, 301L), (3L, 2L, 302L), (3L, 3L, 303L), (3L, 4L, 304L)
    ).toDF("query_id", "rank", "neighbor_id")
    val positives = Seq((1L, 101L), (1L, 103L), (2L, 201L), (2L, 202L),
      (9L, 999L)) // a label for an unretrieved query must change nothing
      .toDF("query_id", "neighbor_id")
    val got = Retrieval.hardNegatives(retrieved, positives, nNeg = 3)
      .select("query_id", "neg_rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 1L, 102L), (1L, 2L, 104L), (1L, 3L, 105L), // dense past the gaps
      (3L, 1L, 301L), (3L, 2L, 302L), (3L, 3L, 303L)  // capped at 3
    ))
  }
}
