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
