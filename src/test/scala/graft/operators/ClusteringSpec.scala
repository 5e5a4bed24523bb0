package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for [[Clustering.kmeansQuantized]]. The q97 oracle certifies
  * the full iteration against DuckDB; these pin the semantic contract
  * independently: assignments are true argmins, the fixpoint is
  * reproducible under repartitioning, centroids stay integral, and
  * empty clusters survive. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated groups in 4-d plus a lone outlier; float vectors
  // like the embeddings table
  private def vecs = Seq(
    (0L, Array(10f, 0f, 0f, 0f)), (1L, Array(11f, 1f, 0f, 0f)),
    (2L, Array(9f, -1f, 0f, 0f)),
    (10L, Array(0f, 10f, 0f, 0f)), (11L, Array(1f, 11f, 0f, 0f)),
    (12L, Array(-1f, 9f, 0f, 0f)),
    (20L, Array(0f, 0f, 10f, 0f)), (21L, Array(0f, 1f, 11f, 0f)),
    (22L, Array(0f, -1f, 9f, 0f)),
    (30L, Array(-10f, -10f, -10f, 10f)))
  private def df = vecs.toDF("id", "vec")

  test("every assignment is the exact argmin over the final centroids") {
    val (assign, cents) =
      Clustering.kmeansQuantized(df, "id", "vec", k = 3, iters = 2)
    val quant = df
      .select(col("id"), graft.functions.ArrayMath.int8Quantize(col("vec")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Long =
      a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum.toLong
    assign.collect().foreach { r =>
      val (id, cluster, dist) = (r.getLong(0), r.getInt(1), r.getLong(2))
      val best = cents.map { case (cid, c) => (d2(quant(id), c), cid) }.min
      assert((dist, cluster) == best,
        s"id=$id assigned ($cluster, $dist) but argmin is $best")
    }
  }

  test("iters=0 assigns against the k smallest-id seeds themselves") {
    val (assign, cents) =
      Clustering.kmeansQuantized(df, "id", "vec", k = 3, iters = 0)
    // seeds are ids 0,1,2 in id order → cluster ids 0,1,2; each seed
    // point sits at distance 0 from its own centroid
    val byId = assign.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(byId(0L)._2 == 0L && byId(0L)._1 == 0)
    assert(cents.map(_._1).sorted == Seq(0, 1, 2))
  }

  test("fixpoint is invariant under repartitioning and reruns") {
    def run(d: org.apache.spark.sql.DataFrame) = {
      val (a, c) = Clustering.kmeansQuantized(d, "id", "vec", k = 3, iters = 3)
      (a.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet,
        c.map { case (cid, v) => (cid, v.toSeq) }.toSet)
    }
    assert(run(df) == run(df.repartition(7)))
  }

  test("k=1 (single centroid) assigns everything to cluster 0") {
    // least() needs ≥ 2 args; the single-struct special case must
    // keep k=1 working rather than dying at plan build
    val (assign, cents) =
      Clustering.kmeansQuantized(df, "id", "vec", k = 1, iters = 2)
    assert(cents.map(_._1) == Seq(0))
    val rows = assign.collect()
    assert(rows.length == vecs.length && rows.forall(_.getInt(1) == 0))
    val batch = Clustering.assignToCentroids(df, "id", "vec", cents)
    assert(batch.collect().forall(_.getInt(1) == 0))
  }

  test("centroid components stay integral through every iteration") {
    val (_, cents) = Clustering.kmeansQuantized(df, "id", "vec", k = 3, iters = 4)
    cents.foreach { case (_, c) =>
      c.foreach(x => assert(x == math.floor(x) && math.abs(x) <= 127.0))
    }
  }

  test("a cluster that never wins a member keeps its previous centroid") {
    // two identical points, k=2 → both seeds coincide, every
    // assignment ties toward cluster 0, cluster 1 stays empty through
    // every iteration and must retain its seed centroid (not vanish,
    // not divide by zero)
    val tight = Seq(
      (0L, Array(5f, 5f)), (1L, Array(5f, 5f))).toDF("id", "vec")
    val (assign, cents) =
      Clustering.kmeansQuantized(tight, "id", "vec", k = 2, iters = 2)
    assert(assign.filter(col("cluster") === 1).count() == 0)
    // (5,5) quantizes to (127,127); cluster 1's centroid is preserved
    assert(cents.toMap.apply(1).toSeq == Seq(127.0, 127.0))
  }

  test("assignToCentroids replays the run's own final assignment") {
    val (assign, cents) =
      Clustering.kmeansQuantized(df, "id", "vec", k = 3, iters = 2)
    val served = Clustering.assignToCentroids(df, "id", "vec", cents)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val trained = assign
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == trained)
  }

  test("assignToCentroids routes an unseen batch to its true argmin") {
    val (_, cents) =
      Clustering.kmeansQuantized(df, "id", "vec", k = 3, iters = 2)
    val batch = Seq((100L, Array(10.5f, 0.5f, 0f, 0f)),
      (101L, Array(0f, 0f, 9.5f, 0.5f))).toDF("id", "vec")
    val got = Clustering.assignToCentroids(batch, "id", "vec", cents)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    def d2(a: Array[Double], b: Array[Double]): Long =
      a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum.toLong
    val quant = batch
      .select(col("id"), graft.functions.ArrayMath.int8Quantize(col("vec")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    got.foreach { case (id, (cluster, dist)) =>
      val best = cents.map { case (cid, c) => (d2(quant(id), c), cid) }.min
      assert((dist, cluster) == best)
    }
  }

  test("well-separated groups land in distinct clusters") {
    val (assign, _) = Clustering.kmeansQuantized(df, "id", "vec", k = 3, iters = 3)
    val m = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(m(0L), m(1L), m(2L)).size == 1)
    assert(Set(m(10L), m(11L), m(12L)).size == 1)
    assert(Set(m(20L), m(21L), m(22L)).size == 1)
  }
}
