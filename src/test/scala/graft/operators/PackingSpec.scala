package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences fills bins contiguously per shard in id order") {
    val docs = Seq(
      // shard A: tokens 1000, 900, 300, 2500, 100
      ("A", 1L, 1000L), ("A", 2L, 900L), ("A", 3L, 300L),
      ("A", 4L, 2500L), ("A", 5L, 100L),
      // shard B: a single over-budget doc then a small one
      ("B", 1L, 5000L), ("B", 2L, 10L)
    ).toDF("shard", "id", "toks")
    val out = Packing.packSequences(docs, "shard", "id", "toks", 2048L)
      .select("shard", "id", "bin", "bin_offset")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // shard A exclusive prefixes: 0, 1000, 1900, 2200, 4700
    assert(out(("A", 1L)) == (0L, 0L))
    assert(out(("A", 2L)) == (0L, 1000L))
    assert(out(("A", 3L)) == (0L, 1900L))   // starts inside bin 0
    assert(out(("A", 4L)) == (1L, 152L))    // 2200 = 2048 + 152
    assert(out(("A", 5L)) == (2L, 604L))    // 4700 = 2*2048 + 604
    // shard B: prefixes 0, 5000
    assert(out(("B", 1L)) == (0L, 0L))
    assert(out(("B", 2L)) == (2L, 904L))
  }

  test("bucket/bin arithmetic is exact beyond double precision (2^53)") {
    // ns-epoch-scale values with an odd width: a double-coerced long
    // division would land some of these one bucket off
    val width = 3600000001L
    val ts = Seq(1700000000000000000L, 1700000000000000000L + width - 1,
      1700000000000000000L + width, 9210000000000000000L)
    val df = ts.map(t => ("s", t, 1L)).toDF("shard", "id", "toks")
    val bins = Packing.packSequences(df, "shard", "id", "toks", width)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // prefix sums are 0,1,2,3 → all bin 0; the real check is the as-of
    // bucket kernel below, driven through asofJoinBucketed at the same
    // magnitudes
    assert(bins.values.forall(_ == 0L))
    val facts = ts.zipWithIndex
      .map { case (t, i) => (i.toLong, 1L, t) }.toDF("fid", "k", "t")
    val dims = ts.map(t => (1L, t - 1, s"v${t % 1000}"))
      .toDF("k", "dt", "dval")
      .groupBy("k", "dt").agg(org.apache.spark.sql.functions.min("dval").as("dval"))
    val plain = Joins.asofJoin(facts, dims, "k", "t", "dt", Seq("dval"))
      .collect().map(_.toSeq).toSet
    val bucketed = Joins.asofJoinBucketed(
      facts, dims, "k", "t", "dt", Seq("dval"), width)
      .collect().map(_.toSeq).toSet
    assert(bucketed == plain, "bucketed as-of diverged at ns-epoch magnitudes")
  }

  test("packing is deterministic under repartitioning") {
    val docs = (1L to 2000L).map(i => (i % 5, i, 50 + i % 400))
      .toDF("shard", "id", "toks")
    val a = Packing.packSequences(docs, "shard", "id", "toks", 1024L)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Packing.packSequences(docs.repartition(13), "shard", "id", "toks", 1024L)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // bins are dense from 0 within each shard
    assert(a.values.min == 0L)
  }

  test("packInterleaved: image leads its doc, chunks follow, fill is contiguous") {
    def words(tag: String, n: Int) =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      // doc 0 has media (40 text tokens → 2 chunks of 32 + 8)
      (0L, "s", words("a", 40)),
      // doc 1 text-only (10 tokens → 1 chunk)
      (1L, "s", words("b", 10)),
      // doc 4 has media (5 tokens → 1 chunk)
      (4L, "s", words("c", 5))
    ).toDF("doc_id", "source", "text")
    val out = Packing.packInterleaved(docs, "source", "doc_id", "text",
        hasMedia = col("doc_id") % 4 === 0, imageTokens = 64L,
        chunkTokens = 32, budgetTokens = 128L)
      .orderBy("doc_id", "item_idx")
      .select("doc_id", "item_idx", "modality", "cost_tokens", "bin",
        "bin_offset", "doc_straddles")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // layout: (doc, item) order with exclusive prefixes
    // doc0: img 64 @0, chunk 32 @64, chunk 8 @96 → all bin 0
    // doc1: chunk 10 @104 → bin 0
    // doc4: img 64 @114 → bin 0 (straddles: next lands in bin 1)
    //       chunk 5 @178 → bin 1
    assert(out.toSeq == Seq(
      (0L, 0L, "image", 64L, 0L, 0L, false),
      (0L, 1L, "text", 32L, 0L, 64L, false),
      (0L, 2L, "text", 8L, 0L, 96L, false),
      (1L, 1L, "text", 10L, 0L, 104L, false),
      (4L, 0L, "image", 64L, 0L, 114L, true),
      (4L, 1L, "text", 5L, 1L, 50L, true)))
  }

  test("packItems composite order differs from id-only order when it must") {
    val items = Seq(
      ("s", 1L, 1L, 100L), ("s", 1L, 0L, 30L), ("s", 2L, 0L, 10L)
    ).toDF("shard", "id", "idx", "toks")
    val out = Packing.packItems(items, "shard", Seq("id", "idx"), "toks", 64L)
      .select("id", "idx", "bin", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // order (1,0) 30 → (1,1) 100 → (2,0) 10: prefixes 0, 30, 130
    assert(out((1L, 0L)) == (0L, 0L))
    assert(out((1L, 1L)) == (0L, 30L))
    assert(out((2L, 0L)) == (2L, 2L))
  }

  test("contamination: planted copies score 1.0, clean docs score low") {
    val bench = Seq((1000L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // full copy
      (2L, "alpha beta gamma delta unrelated words here now"), // partial
      (3L, "completely different text with no overlap at all")
    ).toDF("doc_id", "text")
    val out = TextOps.contamination(docs, "doc_id", "text", bench, n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) > 0.2 && out(2L) < 0.5) // 2 of 6 shingles hit
    assert(out(3L) == 0.0)
  }
}
