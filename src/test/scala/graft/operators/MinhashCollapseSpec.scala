package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the round-18 identical-SIGNATURE collapse in
  * [[TextOps.minhashDedupPairs]]: representative-level banding must
  * reproduce the uncollapsed candidate set exactly (identical
  * signatures → identical band keys → two docs share a band iff their
  * representatives do), and the verified output must equal brute-force
  * exact Jaccard on a duplicate-heavy corpus where LSH recall is 1. */
class MinhashCollapseSpec extends SparkSpec {
  import spark.implicits._

  /** Duplicate-heavy corpus: two exact-duplicate mega-groups (8 and 5
    * byte-identical copies), one high-similarity near-dup pair, and
    * distinct fillers. */
  private lazy val docs: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(5)
    val blank = "lorem ipsum boilerplate footer text " * 6
    val tpl = "breaking news wire copy syndicated " * 7
    val base = Seq.fill(40)(rnd.nextInt(500).toString).mkString(" ")
    (0L until 8L).map(i => (100L + i, blank)) ++
      (0L until 5L).map(i => (200L + i, tpl)) ++
      Seq((300L, base), (301L, base + " tail")) ++ // near-dup pair
      (0L until 20L).map(i => (400L + i,
        Seq.fill(40)(rnd.nextInt(500).toString).mkString(" ")))
  }

  private def shingleSet(text: String, n: Int): Set[Seq[String]] = {
    val toks = text.split(" ").filter(_.nonEmpty).toSeq
    if (toks.length < n) Set.empty else toks.sliding(n).map(_.toSeq).toSet
  }

  private def bruteJaccard(n: Int, threshold: Double) = {
    val sets = docs.map { case (id, t) => id -> shingleSet(t, n) }.toMap
    (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      if inter >= 1
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= threshold
    } yield (a, b)).toSet
  }

  test("collapsed minhashDedupPairs ≡ brute-force exact Jaccard on the " +
       "duplicate-heavy corpus (recall 1 at 0.8 with k=64, bands=16)") {
    val got = TextOps.minhashDedupPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, threshold = 0.8, k = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = bruteJaccard(3, 0.8)
    assert(got == expected)
    // planted structure: each mega-group yields all C(m,2) pairs at
    // jaccard 1.0 — the collapse must not lose within-group pairs
    assert((for (i <- 100L until 108L; j <- (i + 1) until 108L)
      yield (i, j)).forall(got.contains))
    assert((for (i <- 200L until 205L; j <- (i + 1) until 205L)
      yield (i, j)).forall(got.contains))
  }

  test("representative-level candidates expand to EXACTLY the " +
       "uncollapsed band-bucket candidate set") {
    // the uncollapsed reference, rebuilt from the public signature
    // store: all pairs sharing any (band, band_key)
    val df = docs.toDF("doc_id", "text")
    val store = TextOps.signatureStore(df, "doc_id", "text",
      n = 3, k = 64, bands = 16)
    val l = store.select(col("doc_id").as("id_a"), col("band"),
      col("band_key"))
    val r = store.select(col("doc_id").as("id_b"), col("band"),
      col("band_key"))
    val uncollapsed = l.join(r, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // the collapsed engine's output at threshold 0 with a >=1-shingle
    // overlap filter is exactly its candidate set intersected with
    // "shares a shingle" — compare on that common ground by filtering
    // the uncollapsed reference the same way
    val sets = docs.map { case (id, t) => id -> shingleSet(t, 3) }.toMap
    val uncollapsedSharing = uncollapsed.filter { case (a, b) =>
      (sets(a) & sets(b)).nonEmpty }
    val collapsedAtZero = TextOps.minhashDedupPairs(df, "doc_id", "text",
        n = 3, threshold = 0.0, k = 64, bands = 16)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(collapsedAtZero == uncollapsedSharing)
  }

  test("a 1000-copy mega-group: candidates stay exactly output-sized " +
       "(C(m,2) within-group pairs, nothing band-amplified)") {
    val blank = "the exact same document body every time " * 4
    val big = (0L until 60L).map(i => (i, blank)) ++
      Seq((900L, "one genuinely different document here " * 5))
    val got = TextOps.minhashDedupPairs(big.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, threshold = 0.8, k = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 60 * 59 / 2)
    assert(got.forall(_._3 == 1.0))
  }
}
