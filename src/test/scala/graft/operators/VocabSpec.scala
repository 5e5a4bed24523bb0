package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  /** Seeded corpus with a Zipf-ish token distribution: tok0 appears in
    * every doc, tok1 in every 2nd, … so counts (and count TIES) are
    * known, plus singleton noise to exercise the cnt=1 tail. */
  private def corpus(nDocs: Int = 60, seed: Int = 7): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val docs = (0 until nDocs).map { i =>
      val zipf = (0 until 12).filter(k => i % (k + 1) == 0).map(k => s"tok$k")
      val noise = Seq.fill(3)(s"rare${rnd.nextInt(1000)}")
      (i.toLong, rnd.shuffle(zipf ++ noise).mkString(" "))
    }
    docs.toDF("doc_id", "text")
  }

  /** The naive formulation the decomposition must reproduce exactly:
    * one global row_number over (cnt DESC, token ASC). */
  private def naive(docs: DataFrame, minCount: Long): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .withColumn("vocab_id", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token"))).cast("long"))

  test("rank law: decomposed vocab_id equals the naive global row_number") {
    val docs = corpus()
    val got = Vocab.vocabulary(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = naive(docs, 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("rank law holds for every prefixLen (bucket split is invisible)") {
    val docs = corpus(nDocs = 40, seed = 11)
    val want = naive(docs, 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (p <- Seq(1, 2, 4)) {
      val got = Vocab.vocabulary(docs, "text", minCount = 1L, prefixLen = p)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"prefixLen=$p diverged from the naive rank")
    }
  }

  test("id 1 is the most frequent token; count ties break in token order") {
    val docs = Seq(
      (1L, "b b b a a c c"),
      (2L, "b a c d")
    ).toDF("doc_id", "text")
    // counts: b=4, a=3, c=3, d=1 → ids: b=1, a=2 (tie a<c), c=3, d=4
    val got = Vocab.vocabulary(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got == Map("b" -> 1L, "a" -> 2L, "c" -> 3L, "d" -> 4L))
  }

  test("minCount boundary: cnt == minCount kept, cnt < minCount dropped") {
    val docs = Seq((1L, "x x y"), (2L, "x y z")).toDF("doc_id", "text")
    // x=3, y=2, z=1
    val got = Vocab.vocabulary(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("x", 3L, 1L), ("y", 2L, 2L)))
  }

  test("empty tokens from repeated spaces never enter the vocabulary") {
    val docs = Seq((1L, "a  b   a")).toDF("doc_id", "text")
    val got = Vocab.vocabulary(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 2L, 1L), ("b", 1L, 2L)))
  }

  test("merged count states re-ranked equal the from-scratch vocabulary") {
    val docs = corpus(nDocs = 50, seed = 3)
    val slice = pmod(col("doc_id"), lit(3L))
    // three-way slicing, merged pairwise-then-once (associativity) vs
    // one merge of all three vs the from-scratch recount
    val states = (0 until 3).map(i =>
      Vocab.tokenCountState(docs.filter(slice === i), "text"))
    val allAtOnce = Vocab.vocabularyFromState(
      Vocab.mergeTokenCountState(states), minCount = 2L)
    val pairwise = Vocab.vocabularyFromState(
      Vocab.mergeTokenCountState(Seq(
        Vocab.mergeTokenCountState(states.take(2)), states(2))), minCount = 2L)
    val scratch = Vocab.vocabulary(docs, "text", minCount = 2L)
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = set(scratch)
    assert(set(allAtOnce) == want && set(pairwise) == want && want.nonEmpty)
  }

  test("rankedBy ascending assigns ids least-value-first") {
    val df = Seq(("a", 3L), ("b", 1L), ("c", 1L), ("d", 2L)).toDF("k", "v")
    val got = Vocab.rankedBy(df, col("v"), descending = false,
        substring(col("k"), 1, 1), orderInBucket = col("k"), outCol = "id")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    // v ASC, then k: b(1)=1, c(1)=2, d(2)=3, a(3)=4
    assert(got == Map("b" -> 1L, "c" -> 2L, "d" -> 3L, "a" -> 4L))
  }

  test("the unpartitioned window's histogram is bounded by distinct " +
       "(cnt, prefix) pairs and does NOT grow with corpus size") {
    // the construction whose size makes Vocab's single-partition window
    // safe (the WindowExec warning in the bench tail is THIS window):
    // one row per (count-value, token-prefix) pair, never per token
    val state = Vocab.tokenCountState(corpus(nDocs = 60), "text")
    val hist = Vocab.bucketHistogram(state, col("cnt"),
      substring(col("token"), 1, 1))
    val histRows = hist.count()
    val bound = state.select(countDistinct(col("cnt")),
        countDistinct(substring(col("token"), 1, 1)))
      .head() match { case r => r.getLong(0) * r.getLong(1) }
    val tokens = state.count()
    assert(histRows <= bound,
      s"histogram $histRows exceeds the |cnt|x|prefix| bound $bound")
    assert(histRows < tokens,
      s"histogram ($histRows) must be smaller than the token state ($tokens)")
    // growth invariance: doubling the corpus doubles every count IN
    // PLACE (merge of two identical states), so the histogram must not
    // grow — this is what a future caller with a near-unique bucketVal
    // would break, and the contract this spec exists to defend
    val doubled = Vocab.mergeTokenCountState(Seq(state, state))
    val histRows2 = Vocab.bucketHistogram(doubled, col("cnt"),
      substring(col("token"), 1, 1)).count()
    assert(histRows2 <= histRows,
      s"corpus 2x grew the histogram $histRows -> $histRows2")
  }
}
