package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // distinct filler vocabularies per doc so nothing repeats by accident
  private def filler(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$tag$i")
  private val planted = (1 to 20).map(i => s"p$i") // the shared 20-token run

  private def corpus = Seq(
    // doc 1: planted run at offset 5
    1L -> (filler("a", 5) ++ planted ++ filler("b", 7)).mkString(" "),
    // doc 2: planted run at offset 0
    2L -> (planted ++ filler("c", 9)).mkString(" "),
    // doc 3: planted run at the very end
    3L -> (filler("d", 11) ++ planted).mkString(" "),
    // doc 4: no repeats at all
    4L -> filler("e", 25).mkString(" "),
    // docs 5/6: full-document exact duplicates
    5L -> filler("f", 18).mkString(" "),
    6L -> filler("f", 18).mkString(" "),
    // doc 7: shorter than k — must emit no grams and survive untouched
    7L -> filler("g", 4).mkString(" ")
  ).toDF("doc_id", "text")

  test("planted run reports as ONE maximal span of exactly its length") {
    val spans = SpanDedup.duplicatedSpans(corpus, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = spans.groupBy(_._1)
    // docs 1-3: exactly one span each, exactly the 20 planted tokens at
    // the planted offset — maximality: the unique neighbours never
    // extend the span by even one token
    assert(byDoc(1L).toSeq == Seq((1L, 5L, 20L, planted.mkString(" "))))
    assert(byDoc(2L).toSeq == Seq((2L, 0L, 20L, planted.mkString(" "))))
    assert(byDoc(3L).toSeq == Seq((3L, 11L, 20L, planted.mkString(" "))))
    // docs 5/6: the whole 18-token doc is the span
    assert(byDoc(5L).toSeq == Seq((5L, 0L, 18L, filler("f", 18).mkString(" "))))
    assert(byDoc(6L).toSeq == Seq((6L, 0L, 18L, filler("f", 18).mkString(" "))))
    // docs 4 and 7: nothing
    assert(!byDoc.contains(4L) && !byDoc.contains(7L))
  }

  test("cut keeps the first occurrence, removes the rest, drops pure dups") {
    val out = SpanDedup.cutDuplicatedSpans(corpus, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 (lowest id): keeps the planted run, byte-identical text
    assert(out(1L) == ((filler("a", 5) ++ planted ++ filler("b", 7))
      .mkString(" "), 32L))
    // docs 2/3: the planted run is gone, their filler survives in order
    assert(out(2L) == (filler("c", 9).mkString(" "), 9L))
    assert(out(3L) == (filler("d", 11).mkString(" "), 11L))
    // untouched docs are byte-identical
    assert(out(4L) == (filler("e", 25).mkString(" "), 25L))
    assert(out(7L) == (filler("g", 4).mkString(" "), 4L))
    // doc 5 keeps the duplicated pair's only copy; doc 6 vanished
    assert(out(5L) == (filler("f", 18).mkString(" "), 18L))
    assert(!out.contains(6L))
  }

  test("recall law: a block-straddling repeat is invisible to the q81 grid") {
    val run = (1 to 10).map(i => s"r$i") // 10-token repeat, k=8 finds it
    val docs = Seq(
      // straddles the 16-token block boundary (positions 12..21)
      8L -> (filler("h", 12) ++ run ++ filler("i", 10)).mkString(" "),
      9L -> (filler("j", 3) ++ run ++ filler("k", 19)).mkString(" ")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(spans == Set((8L, 12L, run.mkString(" ")),
      (9L, 3L, run.mkString(" "))))
    // the 16-token block grid sees no repeated block: every block mixes
    // the run with doc-unique filler — both docs pass through unchanged
    val blocks = TextOps.removeDuplicatedBlocks(docs, "doc_id", "text",
        blockTokens = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(blocks(8L) == (filler("h", 12) ++ run ++ filler("i", 10)).mkString(" "))
    assert(blocks(9L) == (filler("j", 3) ++ run ++ filler("k", 19)).mkString(" "))
  }

  test("every reported span text really occurs in >= 2 documents") {
    val docs = corpus
    val spans = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .select("span_text").as[String].collect()
    val texts = docs.select("text").as[String].collect()
    spans.foreach { sp =>
      assert(texts.count(_.contains(sp)) >= 2, s"span not cross-doc: $sp")
    }
  }

  test("serve law: incremental cut == full-corpus cut restricted to the batch") {
    // history ids all precede batch ids — the documented precondition
    val history = Seq(
      1L -> (filler("a", 5) ++ planted ++ filler("b", 7)).mkString(" "),
      2L -> filler("f", 18).mkString(" ")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // exact copy of a history doc — must vanish
      10L -> filler("f", 18).mkString(" "),
      // carries the history-planted run — run cut, filler kept
      11L -> (filler("x", 3) ++ planted ++ filler("y", 6)).mkString(" "),
      // within-batch cross-doc pair, unseen by history: first kept
      12L -> (filler("q", 2) ++ (1 to 9).map(i => s"w$i") ++ filler("r", 4)).mkString(" "),
      13L -> ((1 to 9).map(i => s"w$i") ++ filler("z", 8)).mkString(" "),
      // clean doc — byte-identical
      14L -> filler("u", 20).mkString(" ")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("gramstore").toString + "/store"
    SpanDedup.writeGramStore(spark, history, "doc_id", "text", k = 8, path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val served = rows(
      SpanDedup.serveSpanCut(spark, path, batch, "doc_id", "text", k = 8))
    val full = rows(
      SpanDedup.cutDuplicatedSpans(history.unionByName(batch),
          "doc_id", "text", k = 8)
        .filter(col("doc_id") >= 10L))
    assert(served == full, "incremental serve diverged from the full run")
    // spot checks: exact-dup vanished, planted run cut, pair keeps first
    val byId = served.map(t => t._1 -> (t._2, t._3)).toMap
    assert(!byId.contains(10L))
    assert(byId(11L) == ((filler("x", 3) ++ filler("y", 6)).mkString(" "), 9L))
    assert(byId(12L)._2 == 15L) // full doc kept: first batch occurrence
    assert(byId(13L) == (filler("z", 8).mkString(" "), 8L))
    assert(byId(14L) == (filler("u", 20).mkString(" "), 20L))
    // bloom is an access path, not a semantics: delete it, same rows
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$path/grambloom"))
    assert(rows(SpanDedup.serveSpanCut(spark, path, batch,
      "doc_id", "text", k = 8)) == served)
  }

  test("serve with an empty-history store == the plain within-batch cut") {
    val batch = Seq(
      20L -> (filler("m", 3) ++ planted).mkString(" "),
      21L -> (planted ++ filler("n", 5)).mkString(" "),
      22L -> filler("o", 12).mkString(" ")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("gramstore-empty").toString + "/store"
    SpanDedup.writeGramStore(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", k = 8, path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(SpanDedup.serveSpanCut(spark, path, batch, "doc_id", "text",
        k = 8)) ==
      rows(SpanDedup.cutDuplicatedSpans(batch, "doc_id", "text", k = 8)))
  }

  test("benchmark spans: planted eval passage reported and cut surgically") {
    val leak = (1 to 12).map(i => s"e$i")
    val bench = Seq(100L -> (filler("bm", 6) ++ leak).mkString(" "))
      .toDF("doc_id", "text")
    val docs = Seq(
      // leak mid-doc
      1L -> (filler("a", 4) ++ leak ++ filler("b", 6)).mkString(" "),
      // clean doc
      2L -> filler("c", 15).mkString(" "),
      // doc that IS the benchmark text — vanishes entirely on cut
      3L -> (filler("bm", 6) ++ leak).mkString(" ")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.benchmarkSpans(docs, "doc_id", "text",
        bench, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(spans == Set((1L, 4L, leak.mkString(" ")),
      (3L, 0L, (filler("bm", 6) ++ leak).mkString(" "))))
    val cut = SpanDedup.cutBenchmarkSpans(docs, "doc_id", "text",
        bench, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // lockstep: exactly the reported spans are gone (spans are maximal
    // runs, hence disjoint, so kept = total − Σ span_tokens)
    assert(cut(1L) == ((filler("a", 4) ++ filler("b", 6)).mkString(" "), 10L))
    assert(cut(2L) == (filler("c", 15).mkString(" "), 15L))
    assert(!cut.contains(3L), "a pure benchmark copy must vanish")
  }

  test("minSpanTokens guard: short repeats survive, long ones still cut, " +
       "and the guard filters merged islands, not sub-repeats") {
    val long = (1 to 30).map(i => s"L$i") // 30-token repeat
    val short = (1 to 10).map(i => s"S$i") // 10-token repeat
    val docs = Seq(
      1L -> (long ++ filler("a", 3) ++ short).mkString(" "),
      2L -> (short ++ filler("b", 4) ++ long).mkString(" ")
    ).toDF("doc_id", "text")
    val out = SpanDedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 8,
        minSpanTokens = 24)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 ranks first everywhere: byte-identical
    assert(out(1L) == ((long ++ filler("a", 3) ++ short).mkString(" "), 43L))
    // doc 2: the 30-token repeat is cut (>= 24), the 10-token one kept
    assert(out(2L) == ((short ++ filler("b", 4)).mkString(" "), 14L))
    // guard off reproduces the unguarded cut (both repeats go)
    val plain = SpanDedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(plain(2L) == 4L)
  }

  test("store-backed decontam == direct benchmark cut, with or without bloom") {
    val leak = (1 to 12).map(i => s"e$i")
    val bench1 = Seq(100L -> (filler("bm", 6) ++ leak).mkString(" "))
      .toDF("doc_id", "text")
    val bench2 = Seq(101L -> (1 to 10).map(i => s"n$i").mkString(" "))
      .toDF("doc_id", "text")
    val docs = Seq(
      1L -> (filler("a", 4) ++ leak ++ filler("b", 6)).mkString(" "),
      2L -> ((1 to 10).map(i => s"n$i") ++ filler("c", 5)).mkString(" "),
      3L -> filler("d", 15).mkString(" ")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("benchstore").toString + "/store"
    SpanDedup.writeGramStore(spark, bench1, "doc_id", "text", k = 8, path)
    SpanDedup.appendGrams(bench2, "doc_id", "text", k = 8, path, 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val stored = rows(SpanDedup.cutSpansAgainstStore(spark, path, docs,
      "doc_id", "text", k = 8))
    val direct = rows(SpanDedup.cutBenchmarkSpans(docs, "doc_id", "text",
      bench1.unionByName(bench2), "doc_id", "text", k = 8))
    assert(stored == direct, "store-backed decontam diverged from direct")
    // both eval sets bite: doc 1 loses the leak, doc 2 the n-run
    val byId = stored.map(t => t._1 -> t._3).toMap
    assert(byId == Map(1L -> 10L, 2L -> 5L, 3L -> 15L))
    // the sketch is an access path, not a semantics
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$path/grambloom"))
    assert(rows(SpanDedup.cutSpansAgainstStore(spark, path, docs,
      "doc_id", "text", k = 8)) == direct)
  }

  test("intra-doc repeats alone do not flag (cross-doc only, q54's lane)") {
    val rep = (1 to 9).map(i => s"s$i")
    val docs = Seq(
      // the run repeats twice WITHIN one doc, nowhere else
      10L -> (rep ++ filler("t", 5) ++ rep).mkString(" ")
    ).toDF("doc_id", "text")
    assert(SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 8).isEmpty)
    val out = SpanDedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == 23L)
  }
}
