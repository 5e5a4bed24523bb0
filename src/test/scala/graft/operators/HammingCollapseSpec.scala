package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the round-18 identical-hash collapse ([[Hamming]]): the
  * hot-bucket fix must be an ACCESS-PATH change only — on a
  * duplicate-heavy corpus (the blank-thumbnail regime the round-17
  * verdict named as the scale-killer input) every collapsed engine
  * must equal its brute-force semantics exactly. */
class HammingCollapseSpec extends SparkSpec {
  import spark.implicits._

  /** Duplicate-heavy hash table: 3 identical mega-groups (12, 9, 7
    * members), a near-dup chain around each (distance 1-3 off the
    * group value), and distinct fillers — ~40% of rows share a hash. */
  private lazy val dupHeavy: Seq[(Long, Long)] = {
    val g1 = 0x0123456789abcdefL
    val g2 = 0x7edcba9876543210L
    val g3 = 0x00ff00ff00ff00ffL
    val rnd = new scala.util.Random(42)
    val mega = (0L until 12L).map(i => (100L + i, g1)) ++
      (0L until 9L).map(i => (200L + i, g2)) ++
      (0L until 7L).map(i => (300L + i, g3))
    val near = Seq(
      (400L, g1 ^ 1L), (401L, g1 ^ 3L), (402L, g2 ^ (1L << 40)),
      (403L, g3 ^ ((1L << 63) | 1L)), (404L, g3 ^ (1L << 63)))
    val fill = (0L until 40L).map(i => (500L + i, rnd.nextLong()))
    mega ++ near ++ fill
  }

  private def bruteForce(rows: Seq[(Long, Long)], maxDist: Int) =
    (for {
      (a, ha) <- rows; (b, hb) <- rows
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= maxDist
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet

  test("collapsedPairs ≡ brute force on a 40%-duplicate corpus, " +
       "every maxDist 0..4") {
    val df = dupHeavy.toDF("id", "h")
    (0 to 4).foreach { d =>
      val got = Hamming.collapsedPairs(df, "id", "h", 64, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == bruteForce(dupHeavy, d), s"maxDist=$d")
    }
  }

  test("collapsedPairs: a pure mega-cluster (ALL rows identical) emits " +
       "exactly C(m,2) zero-distance pairs") {
    val m = 25
    val df = (0L until m.toLong).map(i => (i, 0x5555aaaa5555aaaaL))
      .toDF("id", "h")
    val got = Hamming.collapsedPairs(df, "id", "h", 64, 3).collect()
    assert(got.length == m * (m - 1) / 2)
    assert(got.forall(_.getLong(2) == 0L))
  }

  test("collapsedPairs intermediate: the banded join runs over DISTINCT " +
       "hashes — the candidate stage is duplicate-blind") {
    // 3 distinct hashes, two far apart, one near: the distinct-hash
    // pair stage must see 3 rows regardless of 1000 members behind one
    val df = ((0L until 1000L).map(i => (i, 1L)) ++
      Seq((2000L, 3L), (3000L, Long.MaxValue))).toDF("id", "h")
    val hp = Hamming.distinctHashPairs(df, "h", 64, 3).collect()
    // 1 vs 3 at distance 1; everything else out of range
    assert(hp.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 3L, 1L)))
  }

  test("sparseEdges: connected components ≡ all-pairs components " +
       "(same min labels) on the duplicate-heavy corpus") {
    val df = dupHeavy.toDF("id", "h")
    val full = Hamming.collapsedPairs(df, "id", "h", 64, 3)
      .select("id_a", "id_b")
    val sparse = Hamming.sparseEdges(df, "id", "h", 64, 3)
    def labelsOf(pairs: org.apache.spark.sql.DataFrame) =
      TextOps.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelsOf(sparse) == labelsOf(full))
    // and the sparse edge count is linear where all-pairs is quadratic:
    // the 12-member mega-group contributes 11 star edges, not C(12,2)
    val nSparse = sparse.count()
    val nFull = full.count()
    assert(nSparse < nFull,
      s"sparse=$nSparse should undercut all-pairs=$nFull on dup-heavy input")
  }

  test("sparseEdges star edges anchor at the group min, distance peers " +
       "link group mins") {
    val df = Seq((7L, 10L), (3L, 10L), (9L, 10L), // group min 3
      (20L, 11L)).toDF("id", "h") // hamming(10,11)=1
    val got = Hamming.sparseEdges(df, "id", "h", 64, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 7L), (3L, 9L), (3L, 20L)))
  }

  test("phashDedupClusters on a duplicate-heavy media corpus ≡ clusters " +
       "from brute-force pairs") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 20L).map(i =>
      (i, Seq.fill(50)(rnd.nextInt(1000).toString).mkString(" "))) ++
      (0 until 8).map(i => (100L + i, "blank thumbnail " * 12)) ++ // mega
      (0 until 5).map(i => (200L + i, "placeholder gif " * 13))    // mega
    val media = Multimodal.asMediaTable(docs.toDF("id", "payload"),
      "id", "payload", "image")
    val hashes = Multimodal.perceptualHash(media, 64).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    // brute-force min-reachable-label per id
    val ids = hashes.keys.toSeq.sorted
    val adj = ids.map(a => a -> ids.filter(b => b != a &&
      java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3)).toMap
    def reachMin(start: Long): Long = {
      val seen = scala.collection.mutable.Set(start)
      val stack = scala.collection.mutable.Stack(start)
      while (stack.nonEmpty) adj(stack.pop()).foreach(n =>
        if (seen.add(n)) stack.push(n))
      seen.min
    }
    val expected = ids.map(i => i -> reachMin(i)).toMap
    val got = Multimodal.phashDedupClusters(media, 64, 3).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(got == expected)
    // the two planted mega-groups each collapse to one keeper
    assert((0 until 8).forall(i => got(100L + i) == got(100L)))
    assert((0 until 5).forall(i => got(200L + i) == got(200L)))
  }

  test("simhashDedupClusters on a duplicate-heavy corpus ≡ clusters from " +
       "brute-force fingerprint pairs") {
    val rnd = new scala.util.Random(23)
    val docs = (0L until 25L).map(i =>
      (i, Seq.fill(40)(rnd.nextInt(800).toString).mkString(" "))) ++
      (0 until 7).map(i => (100L + i, "boilerplate footer text " * 9)) ++
      (0 until 6).map(i => (200L + i, "syndicated wire copy " * 10))
    val df = docs.toDF("doc_id", "text")
    val fps = TextOps.simhash(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val ids = fps.keys.toSeq.sorted
    val adj = ids.map(a => a -> ids.filter(b => b != a &&
      java.lang.Long.bitCount(fps(a) ^ fps(b)) <= 3)).toMap
    def reachMin(start: Long): Long = {
      val seen = scala.collection.mutable.Set(start)
      val stack = scala.collection.mutable.Stack(start)
      while (stack.nonEmpty) adj(stack.pop()).foreach(n =>
        if (seen.add(n)) stack.push(n))
      seen.min
    }
    val expected = ids.map(i => i -> reachMin(i)).toMap
    val got = TextOps.simhashDedupClusters(df, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("cluster_id")).toMap
    assert(got == expected)
    // the planted mega-groups each collapse onto their min id
    assert((0 until 7).forall(i => got(100L + i) == got(100L)))
    assert((0 until 6).forall(i => got(200L + i) == got(200L)))
  }

  test("servePhashDedup on duplicate-heavy store AND batch ≡ brute-force " +
       "replay (history wins, within-batch min-id, fresh is fresh)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-phash-collapse").toString
    def mt(rows: Seq[(Long, String)]) = Multimodal.asMediaTable(
      rows.toDF("id", "payload"), "id", "payload", "image")
    val shared = "the very same payload " * 10
    val other = "another duplicated blob " * 11
    // store: 6 identical copies of `shared` + 3 of `other` + 2 distinct
    val histRows = (0 until 6).map(i => (50L + i) -> shared) ++
      (0 until 3).map(i => (70L + i) -> other) ++
      Seq(90L -> ("history unique one " * 9), 91L -> ("history unique two " * 9))
    Multimodal.writePhashStore(mt(histRows), width = 64, dir)
    // batch: 5 copies of shared, 4 of a novel dup-cluster, 1 distinct
    val novel = "novel batch cluster " * 12
    val batchRows = (0 until 5).map(i => (10L + i) -> shared) ++
      (0 until 4).map(i => (20L + i) -> novel) ++
      Seq(30L -> ("fresh and alone " * 10))
    val batch = mt(batchRows)
    val maxDist = 3
    val hHash = Multimodal.perceptualHash(mt(histRows), 64).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    val bHash = Multimodal.perceptualHash(batch, 64).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    val expected = bHash.map { case (x, hx) =>
      val histMin = hHash.collect { case (h, hh)
        if java.lang.Long.bitCount(hx ^ hh) <= maxDist => h }
        .minOption
      val peerMin = bHash.collect { case (p, hp)
        if p < x && java.lang.Long.bitCount(hx ^ hp) <= maxDist => p }
        .minOption
      x -> histMin.orElse(peerMin)
    }
    val got = Multimodal.servePhashDedup(spark, dir, batch, 64, maxDist)
      .collect().map(r => r.getAs[Long]("media_id") ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == expected)
    // spot-check the planted structure: every shared-copy dups to the
    // store's min id 50; the novel cluster dups within-batch to 20
    (0 until 5).foreach(i => assert(got(10L + i).contains(50L)))
    assert(got(20L).isEmpty)
    (1 until 4).foreach(i => assert(got(20L + i).contains(20L)))
    assert(got(30L).isEmpty)
  }

  test("serveSimhashDedup on duplicate-heavy store AND batch ≡ " +
       "brute-force replay (the shared core on the text lens)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-simhash-collapse").toString
    val shared = "the very same boilerplate page text " * 8
    val other = "another duplicated template chrome " * 9
    val histRows = (0 until 6).map(i => (50L + i) -> shared) ++
      (0 until 3).map(i => (70L + i) -> other) ++
      Seq(90L -> ("history unique document one " * 7),
        91L -> ("completely different unique history page " * 6))
    TextOps.writeSimhashStore(histRows.toDF("id", "text"), "id", "text", dir)
    val novel = "novel batch duplicate cluster wording " * 8
    val batchRows = (0 until 5).map(i => (10L + i) -> shared) ++
      (0 until 4).map(i => (20L + i) -> novel) ++
      Seq(30L -> ("fresh and alone entirely new phrasing " * 7))
    val batch = batchRows.toDF("id", "text")
    val maxDist = 3
    def fps(rows: Seq[(Long, String)]): Map[Long, Long] =
      TextOps.simhash(rows.toDF("id", "text"), "id", "text").collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    val (hHash, bHash) = (fps(histRows), fps(batchRows))
    val expected = bHash.map { case (x, hx) =>
      val histMin = hHash.collect { case (h, hh)
        if java.lang.Long.bitCount(hx ^ hh) <= maxDist => h }
        .minOption
      val peerMin = bHash.collect { case (p, hp)
        if p < x && java.lang.Long.bitCount(hx ^ hp) <= maxDist => p }
        .minOption
      x -> histMin.orElse(peerMin)
    }
    val got = TextOps.serveSimhashDedup(spark, dir, batch, "id", "text",
        maxDist)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == expected)
    // planted structure: every shared copy dups to the store's min id
    // 50; the novel cluster dups within-batch to 20; 30 is fresh
    (0 until 5).foreach(i => assert(got(10L + i).contains(50L)))
    assert(got(20L).isEmpty)
    (1 until 4).foreach(i => assert(got(20L + i).contains(20L)))
    assert(got(30L).isEmpty)
  }

  test("phashLeaks on a duplicate-heavy eval index ≡ brute-force " +
       "(closest eval min-id, distinct-match counts SUM across groups)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-phash-leaks-collapse").toString
    def mt(rows: Seq[(Long, String)]) = Multimodal.asMediaTable(
      rows.toDF("id", "payload"), "id", "payload", "image")
    val evalDoc = "benchmark eval image " * 10
    val evalRows = (0 until 5).map(i => (700L + i) -> evalDoc) ++
      Seq(800L -> ("held out unique " * 12))
    Multimodal.writePhashStore(mt(evalRows), width = 64, dir)
    val batch = mt(Seq(1L -> evalDoc, 2L -> ("clean batch doc " * 11)))
    val eHash = Multimodal.perceptualHash(mt(evalRows), 64).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    val bHash = Multimodal.perceptualHash(batch, 64).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    val expected = bHash.flatMap { case (x, hx) =>
      val ms = eHash.toSeq.map { case (e, he) =>
        (java.lang.Long.bitCount(hx ^ he).toLong, e) }
        .filter(_._1 <= 3)
      if (ms.isEmpty) None
      else Some(x -> (ms.min, ms.map(_._2).distinct.size.toLong))
    }
    val got = Multimodal.phashLeaks(spark, dir, batch, 64, 3).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("hamming"), r.getAs[Long]("eval_id")),
          r.getAs[Long]("n_eval_matches"))).toMap
    assert(got == expected)
    // the 5-copy eval group must count as 5 distinct leaked eval ids
    assert(got(1L)._2 == 5L && got(1L)._1 == ((0L, 700L)))
    assert(!got.contains(2L))
  }
}
