package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

// top-level: Spark cannot synthesize an encoder for a class nested in
// the suite (no outer-scope access at deserialization time)
case class Doc(doc_id: Long, text: String)

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    Doc(1L, "a b c d e"), Doc(2L, "a b c d e"), Doc(3L, "a b c d x"),
    Doc(4L, "z y x w v u t"), Doc(5L, "z y x w v u t"),
    Doc(8L, "a b c d e"), Doc(16L, "z y x w v u t"),
    Doc(24L, "q r s t u v w"), Doc(32L, "q r s t u v w"),
    Doc(40L, "completely different words here entirely"))

  test("streamed candidate set equals the batch band self-join, across batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DedupStream.nearDupCandidates(in.toDF(), "doc_id", "text")
      .writeStream.format("memory").queryName("stream_cands").start()
    try {
      // history arrives first, then the increment — pairs must span both
      val (history, batch) = docs.partition(_.doc_id % 8 != 0)
      in.addData(history: _*)
      q.processAllAvailable()
      val afterHistory = spark.table("stream_cands").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      in.addData(batch: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_cands").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the law: every pair sharing >= 1 band, regardless of arrival
      // batch, exactly once as a (least, greatest) id pair
      val want = TextOps.incrementalCandidates(
          TextOps.signatureStore(docs.toDF(), "doc_id", "text"),
          "doc_id", lit(true))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == want && streamed.nonEmpty,
        s"streamed $streamed vs batch $want")
      // and the increment genuinely added new-vs-history pairs
      assert((streamed -- afterHistory).nonEmpty)
    } finally q.stop()
  }

  test("redelivered documents emit nothing new (at-least-once safe)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DedupStream.nearDupCandidates(in.toDF(), "doc_id", "text")
      .writeStream.format("memory").queryName("stream_cands_redeliver").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val first = spark.table("stream_cands_redeliver").count()
      in.addData(docs: _*) // full redelivery
      q.processAllAvailable()
      assert(spark.table("stream_cands_redeliver").count() == first,
        "redelivery must be a membership no-op")
    } finally q.stop()
  }

  test("a hot bucket stops growing state at maxPerBucket but still pairs") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    // 8 identical docs, cap 2: arrivals past the cap pair against the 2
    // retained representatives only
    val q = DedupStream.nearDupCandidates(in.toDF(), "doc_id", "text",
        maxPerBucket = 2)
      .writeStream.format("memory").queryName("stream_cands_hot").start()
    try {
      val clones = (1L to 8L).map(i => Doc(i, "same same same same text"))
      in.addData(clones: _*)
      q.processAllAvailable()
      val pairs = spark.table("stream_cands_hot").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // every doc appears in at least one pair (clusterable), but the
      // pair count stays far below the full clique x 16 bands
      val covered = pairs.flatMap(p => Seq(p._1, p._2))
      assert((1L to 8L).forall(covered.contains),
        s"a clone fell out of the cluster: $pairs")
      assert(pairs.size < 28, // full clique would be C(8,2) = 28 distinct
        s"cap did not bound pairing: ${pairs.size}")
    } finally q.stop()
  }

  test("over-cap redelivery re-emits duplicate pairs but never a NEW pair " +
       "(the docstring's scoped at-least-once contract)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DedupStream.nearDupCandidates(in.toDF(), "doc_id", "text",
        maxPerBucket = 2)
      .writeStream.format("memory").queryName("stream_cands_overcap").start()
    try {
      val clones = (1L to 8L).map(i => Doc(i, "same same same same text"))
      in.addData(clones: _*)
      q.processAllAvailable()
      def rows() = spark.table("stream_cands_overcap").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val (firstRows, firstSet) = (rows(), rows().toSet)
      // doc 8 arrived after the bucket hit cap → was never retained, so
      // its redelivery is NOT a membership no-op: it re-pairs against
      // the retained representatives (duplicate pairs) — but the
      // DISTINCT pair set must not grow (no new information)
      in.addData(Doc(8L, "same same same same text"))
      q.processAllAvailable()
      val after = rows()
      assert(after.size > firstRows.size,
        "over-cap redelivery should re-emit (at-least-once)")
      assert(after.toSet == firstSet,
        s"redelivery invented a new pair: ${after.toSet -- firstSet}")
    } finally q.stop()
  }
}
