package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Clustering

case class Vec(vec_id: Long, embedding: Array[Float])

/** The stream-maintained semantic-dedup store must be
  * indistinguishable from the batch composition over the same
  * vectors: final members ≡ routing the union through the frozen
  * centroids, each batch's pairs ≡ a batch probe against the members
  * that preceded it, and replaying any prefix changes nothing. */
class SemStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private val (thrNum, thrDen, cap, seed) = (49L, 400L, 32L, "graft")

  private def memberRows(path: String) = spark.read
    .parquet(s"$path/members")
    .select(col("id"), col("cluster").cast("int"), col("dist"))
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  private def pairRows(path: String) = spark.read
    .parquet(s"$path/pairs")
    .select(col("b").cast("long"), col("cluster"), col("store_id"),
      col("batch_id"))
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("streamed sem store ≡ batch composition, whatever the " +
       "micro-batch boundaries; pairs see exactly the prior members") {
    implicit val ctx = spark.sqlContext
    val e = fixture
    val seedCorpus = e.filter(col("vec_id") % 3 === 0)
    val streamRows = e.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[Vec].collect().toSeq.sortBy(_.vec_id)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semstream").toString
    SemStream.init(seedCorpus, "vec_id", "embedding",
      k = 4, iters = 2, s"$dir/store")
    val in = MemoryStream[Vec]
    val q = SemStream.maintainSemStore(in.toDF(), "vec_id", "embedding",
      s"$dir/store", thrNum, thrDen, cap, seed, s"$dir/ckpt")
    val (b1, b2) = streamRows.splitAt(streamRows.size / 2)
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      q.processAllAvailable() // empty epoch: marker only
      in.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // members ≡ routing the union through the frozen centroids
    val (_, cents) = Clustering.kmeansQuantized(
      seedCorpus, "vec_id", "embedding", k = 4, iters = 2)
    val want = Clustering.assignToCentroidsKeepVec(
        seedCorpus.unionByName(e.filter(col("vec_id") % 3 =!= 0)),
        "vec_id", "embedding", cents)
      .select(col("id"), col("cluster"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(memberRows(s"$dir/store") == want,
      "streamed members drifted from the routed union")
    // each batch's pairs = batch probe against the PRIOR store only:
    // replay the lifecycle batch-wise and compare
    val replayDir = java.nio.file.Files
      .createTempDirectory("graft-semreplay").toString
    SemStream.init(seedCorpus, "vec_id", "embedding",
      k = 4, iters = 2, s"$replayDir/store")
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      SemStream.applyBatch(b.toDF(), "vec_id", "embedding",
        s"$replayDir/store", thrNum, thrDen, cap, seed, i + 1L)
    }
    assert(pairRows(s"$dir/store") == pairRows(s"$replayDir/store"))
    assert(pairRows(s"$dir/store").nonEmpty, "pair law vacuous")
    // effectively-once: replaying any prefix of applied batches is a
    // no-op for members AND pairs
    val before = (memberRows(s"$replayDir/store"),
      pairRows(s"$replayDir/store"))
    SemStream.applyBatch(b1.toDF(), "vec_id", "embedding",
      s"$replayDir/store", thrNum, thrDen, cap, seed, 1L)
    assert((memberRows(s"$replayDir/store"),
      pairRows(s"$replayDir/store")) == before,
      "replayed batch mutated the store")
    Seq(dir, replayDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }
}
