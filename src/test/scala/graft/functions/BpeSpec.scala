package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

/** Laws for the BPE family. The q116-q118 oracles certify the trainer
  * and the counts against the unrolled-SQL replay; these pin the
  * semantic contract independently: hand-computed merges, total-order
  * tie-breaks, left-to-right non-overlapping application, the
  * encode/decode round trip, and kernel ≡ codegen ≡ driver parity. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed training: 'ab ab abc' learns (a,b) then (ab,c)") {
    val merges = Bpe.learn(Array(("ab", 2L), ("abc", 1L)), 2)
    assert(merges.toSeq == Seq(("a", "b"), ("ab", "c")))
    // and a word neither dict entry spelled: both merges apply in order
    assert(Bpe.encodeWord("ababc", merges).toSeq == Seq("ab", "abc"))
  }

  test("count ties break toward the lexicographically smallest pair") {
    val merges = Bpe.learn(Array(("ba", 2L), ("ca", 2L)), 1)
    assert(merges.toSeq == Seq(("b", "a")),
      s"tie must pick (b,a) over (c,a): got ${merges.toSeq}")
  }

  test("application is left-to-right and non-overlapping ('aaaa' → aa|aa)") {
    val merges = Bpe.learn(Array(("aaaa", 1L)), 1)
    assert(merges.toSeq == Seq(("a", "a")))
    assert(Bpe.encodeWord("aaaa", merges).toSeq == Seq("aa", "aa"))
    assert(Bpe.encodeWord("aaa", merges).toSeq == Seq("aa", "a"))
    assert(Bpe.encodeWord("aaaaa", merges).toSeq == Seq("aa", "aa", "a"))
  }

  test("overlapping pair counting: 'aaa' carries (a,a) twice") {
    // freq 1 'aaa' (pair count 2) must beat freq 1 'bc' + 'bc' words
    // seen once each... construct: aaa:1 gives (a,a)=2; bc:1 gives
    // (b,c)=1 — (a,a) wins despite equal word frequency
    val merges = Bpe.learn(Array(("aaa", 1L), ("bc", 1L)), 1)
    assert(merges.toSeq == Seq(("a", "a")))
  }

  test("encode/decode round-trips every corpus word and OOV words") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = TextOps.bpeLearnMerges(d, "text", 16)
    val words = d.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0))
    (words ++ Seq("zzz", "qqqxyz", "a", "ab0ba")).foreach { w =>
      val toks = Bpe.encodeWord(w, merges)
      assert(Bpe.decode(toks) == w, s"round trip broke for '$w'")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("bpeTokenCounts (codegen expression) ≡ driver-side encode, " +
       "stable under repartitioning, null-safe") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = TextOps.bpeLearnMerges(d, "text", 16)
    def expected(text: String): Long =
      text.split(" ").filter(_.nonEmpty)
        .map(w => Bpe.encodeWord(w, merges).length.toLong).sum
    val got = TextOps.bpeTokenCounts(d, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = d.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty && got.forall { case (id, n) => n == expected(texts(id)) })
    val reparted = TextOps.bpeTokenCounts(d.repartition(7), "doc_id",
        "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reparted == got)
    // nulls propagate, empty/space-only text counts zero
    val edge = Seq((1L, null: String), (2L, ""), (3L, "   "), (4L, "ab"))
      .toDF("id", "text")
    val e = TextOps.bpeTokenCounts(edge, "id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(e(1L) == null && e(2L) == 0L && e(3L) == 0L)
  }

  test("a later merge never re-enables an earlier one (rank-order " +
       "apply ≡ priority encode on trained models)") {
    // structural guarantee: merge i's pair mentions only symbols that
    // existed at step i. Verify on a real model: no merge's left or
    // right equals the CONCATENATION produced by any later merge.
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val merges = TextOps.bpeLearnMerges(d, "text", 32)
    val produced = merges.map { case (l, r) => l + r }
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val later = produced.drop(i).toSet // symbols born at step > i
      assert(!later.contains(l) && !later.contains(r),
        s"merge $i ($l,$r) references a symbol produced at a later step")
    }
  }

  test("priority encode ≡ rank-order encode on trained models " +
       "(corpus, OOV and adversarial-repetition words)") {
    // the serve-path encoder (lowest-present-rank loop, merge-count-
    // independent) against the executable spec (one pass per rank) —
    // the equality the BpeModel expression relies on at 32k merges
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    for (m <- Seq(4, 32)) {
      val merges = TextOps.bpeLearnMerges(d, "text", m)
      val rankOf = merges.iterator.zipWithIndex.map { case (p, i) => (p, i) }.toMap
      val words = d.select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0).distinct()
        .collect().map(_.getString(0))
      val oov = Seq("zzz", "a", "aaaa", "aaaaaaa", "ababab", "abcabcabc",
        words.take(20).mkString("") /* one pathological long word */)
      (words ++ oov).foreach { w =>
        assert(Bpe.encodeWordPriority(w, rankOf, merges).toSeq ==
          Bpe.encodeWord(w, merges).toSeq,
          s"priority ≠ rank-order for '$w' at numMerges=$m")
      }
    }
  }

  test("BpeModel keeps the FIRST rank for a duplicated merge pair — " +
       "serve path cannot diverge from rank-order encoding") {
    // a merge list can mention the same pair twice when a later merge
    // recreates a symbol an earlier pair produced; .toMap's last-wins
    // would rank (a,b) at 3 here, so the priority encoder would apply
    // (b,c) first on "abc" ("a"+"bc", 2 tokens) while rank-order
    // encoding yields "abc" (1 token) — keep-first restores equality
    val merges = Array(("a", "b"), ("b", "c"), ("ab", "c"), ("a", "b"))
    assert(Bpe.encodeWord("abc", merges).toSeq == Seq("abc"))
    val model = new BpeModel(merges)
    assert(model.wordTokenCount("abc") == 1L,
      "last-wins rankOf diverges: merges (b,c) first and emits [a, bc]")
  }

  test("incremental trainer ≡ the full-recount reference, merge for " +
       "merge (real dict + adversarial tie/overlap dicts)") {
    // the production-scale trainer (delta counts + inverted index +
    // ordered heap) must be BIT-identical to the naive executable
    // spec it replaced — including argmax ties and the overlapping
    // (a,a)-style adjacency — or the unrolled SQL oracles break
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dict = d
      .select(explode(split(col("text"), " ", -1)).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(2000)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for (m <- Seq(1, 8, 64)) {
      assert(Bpe.learn(dict, m).toSeq == Bpe.learnReference(dict, m).toSeq,
        s"trainers diverged at numMerges=$m")
    }
    // run-dry parity: this tiny dict merges to completion well before
    // 10k steps — both trainers must refuse at the SAME merge index
    // (a delta-bookkeeping leak would dry the fast trainer early)
    val eFast = intercept[IllegalArgumentException](Bpe.learn(dict, 10000))
    val eRef = intercept[IllegalArgumentException](
      Bpe.learnReference(dict, 10000))
    assert(eFast.getMessage == eRef.getMessage,
      s"run-dry diverged: '${eFast.getMessage}' vs '${eRef.getMessage}'")
    val adversarial = Array(("aaaa", 3L), ("aaa", 2L), ("ba", 2L),
      ("ca", 2L), ("abab", 1L), ("aabb", 1L))
    for (m <- 1 to 6) {
      assert(Bpe.learn(adversarial, m).toSeq ==
        Bpe.learnReference(adversarial, m).toSeq,
        s"trainers diverged on the adversarial dict at numMerges=$m")
    }
  }
}
