package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents finds transitive components with min labels") {
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L)).toDF("id_a", "id_b")
    val cc = TextOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents converges on chains deeper than 10 hops") {
    val chain = (1L to 24L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = TextOps.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet == Set(1L)) // one component, min label 1
  }

  test("reliable-checkpoint CC equals the executor-local-cut result") {
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    val pairs = ((1L to 24L).map(i => (i, i + 1)) ++ Seq((40L, 41L)))
      .toDF("id_a", "id_b")
    val local = TextOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val durable = TextOps.connectedComponents(pairs, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(durable == local)
    // the rounds really did checkpoint to the reliable store
    assert(new java.io.File(dir).listFiles != null &&
      new java.io.File(dir).listFiles.nonEmpty,
      s"no checkpoint data written under $dir")
  }

  test("dedupClusters works when the id column is literally named 'id'") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("id", "text")
    val out = TextOps.dedupClusters(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false))
  }

  test("dedupClusters: singletons keep themselves; dup groups keep the smallest id") {
    val docs = Seq(
      (10L, "a b c d e f"),
      (20L, "a b c d e f"),  // dup of 10
      (30L, "z y x w v u")   // singleton
    ).toDF("doc_id", "text")
    val out = TextOps.dedupClusters(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(10L) == (10L, true))
    assert(out(20L) == (10L, false))
    assert(out(30L) == (30L, true))
  }

  test("keeper count equals cluster count on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextOps.dedupClusters(docs, "doc_id", "text").cache()
    val keepers = out.filter(col("is_keeper")).count()
    val clusters = out.select("cluster_id").distinct().count()
    assert(keepers == clusters)
    assert(out.count() == docs.count()) // every doc classified exactly once
  }

  test("softDedupWeights: every doc kept once, singleton weight is " +
       "full, per-cluster mass is one floored document") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextOps.softDedupWeights(docs, "doc_id", "text").cache()
    val n = docs.count()
    assert(out.count() == n, "soft dedup must keep every document")
    assert(out.select("doc_id").distinct().count() == n)
    val rows = out.collect()
    rows.foreach { r =>
      val dc = r.getAs[Long]("dup_count")
      val w = r.getAs[Long]("weight_ppm")
      assert(w == 1000000L / dc, "weight must be 1e6 div dup_count")
      assert(r.getAs[Long]("eff_tokens_ppm") ==
        r.getAs[Long]("ws_tokens") * w)
    }
    val singles = rows.filter(_.getAs[Long]("dup_count") == 1L)
    assert(singles.nonEmpty &&
      singles.forall(_.getAs[Long]("weight_ppm") == 1000000L))
    assert(rows.exists(_.getAs[Long]("dup_count") > 1L),
      "fixture must exercise a real dup cluster")
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (_, rs) =>
      val dc = rs.head.getAs[Long]("dup_count")
      val mass = rs.map(_.getAs[Long]("weight_ppm")).sum
      assert(rs.size == dc, "dup_count must equal the cluster's row count")
      assert(mass <= 1000000L && mass > 1000000L - dc,
        s"cluster mass $mass outside the floored-one-document band")
    }
    out.unpersist()
  }
}
