package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Jalali, TextHash}
import graft.operators.{Dedup, TableStore, TextOps}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based laws (SURVEY.md §5.3). Pure functions go through
  * ScalaCheck; Spark-level laws run on seeded random data (a prop per
  * Spark job would be minutes, not seconds). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("jalali roundtrip identity + month/day ranges (property)") {
    val days = Gen.choose(-20000, 60000) // ±~55 years around 1970
    check(Prop.forAll(days) { epochDay =>
      val (jy, jm, jd) = Jalali.fromEpochDay(epochDay)
      val (gy, gm, gd) = Jalali.toGregorian(jy, jm, jd)
      val back = LocalDate.of(gy, gm, gd).toEpochDay.toInt
      back == epochDay && jm >= 1 && jm <= 12 && jd >= 1 && jd <= 31
    })
  }

  test("jalali date string ordering ≡ day ordering (property)") {
    val days = Gen.choose(-20000, 60000)
    check(Prop.forAll(days, days) { (a, b) =>
      (Jalali.jDateString(a) < Jalali.jDateString(b)) == (a < b)
    })
  }

  test("pigeonhole banding: any pair within Hamming d shares a chunk (property)") {
    // the guarantee phashNearDups/servePhashDedup's candidate equi-join
    // rests on: 64 bits split into (d+1) chunks (last takes the
    // remainder) — flipping ≤ d bits cannot touch every chunk
    val hash = Gen.choose(Long.MinValue, Long.MaxValue)
    val d = Gen.choose(0, 7)
    val flips = Gen.listOf(Gen.choose(0, 63))
    def chunks(h: Long, dd: Int): Seq[(Int, Long)] = {
      val n = dd + 1; val cw = 64 / n
      (0 until n).map { c =>
        val bits = if (c == n - 1) 64 - c * cw else cw
        val mask = if (bits == 64) -1L else (1L << bits) - 1
        c -> ((h >> (c * cw)) & mask)
      }
    }
    check(Prop.forAll(hash, d, flips) { (h, dd, fl) =>
      val b = fl.take(dd).distinct.foldLeft(h)((acc, i) => acc ^ (1L << i))
      java.lang.Long.bitCount(h ^ b) > dd ||
        chunks(h, dd).intersect(chunks(b, dd)).nonEmpty
    })
  }

  test("native hash60 ≡ md5-hex-parse definition (property)") {
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      val bytes = s.getBytes("UTF-8")
      val native = TextHash.hash60(bytes, 0, bytes.length)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString.take(15)
      native == java.lang.Long.parseLong(hex, 16)
    })
  }

  test("native shingle hashes ≡ declarative shingles + hash60 (seeded Spark check)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "")
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val viaStrings = TextOps.shingleIndex(docs, "doc_id", "text", 3)
      .select(col("doc_id"), TextOps.hash60(col("shingle")).as("h"))
      .as[(Long, Long)].collect().toSet
    graft.functions.TextHashFunctions.register(spark)
    val viaNative = docs.select(col("doc_id"),
      explode(graft.functions.TextHashFunctions.shingleHash60(col("text"), 3)).as("h"))
      .as[(Long, Long)].collect().toSet
    assert(viaNative == viaStrings)
  }

  test("ngram_counts kernel ≡ declarative totals + string-distinct (seeded)") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "dd", "")
    val docs = (0 until 80).map { i =>
      (i.toLong, (0 until rnd.nextInt(14)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.repetitionScore(df, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    docs.foreach { case (id, text) =>
      val w = text.split(" ", -1)
      val grams = (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" "))
      assert(got(id) == (grams.length.toLong, grams.distinct.length.toLong),
        s"doc $id '$text': ${got(id)} vs (${grams.length}, ${grams.distinct.length})")
    }
  }

  test("chunkDocuments reconstructs every doc for random geometries (seeded)") {
    val rnd = new scala.util.Random(17)
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(30))).map(j => s"w$j").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((chunk, overlap) <- Seq((5, 0), (5, 2), (8, 7), (3, 1))) {
      val stride = chunk - overlap
      val out = TextOps.chunkDocuments(df, "doc_id", "text", chunk, overlap)
        .collect().groupBy(_.getLong(0))
      docs.foreach { case (id, text) =>
        val chunks = out(id).sortBy(_.getLong(1)).map(_.getString(2))
        val rebuilt = (chunks.head +: chunks.tail.map(
          _.split(" ", -1).drop(overlap).mkString(" ")))
          .filter(_.nonEmpty).mkString(" ")
        assert(rebuilt == text,
          s"chunk=$chunk overlap=$overlap doc $id: '$rebuilt' != '$text'")
      }
    }
  }

  test("redactPii output never contains a redactable span (seeded)") {
    val rnd = new scala.util.Random(19)
    def word() = rnd.nextInt(4) match {
      case 0 => s"u${rnd.nextInt(99)}@${Seq("a.com","b-x.org","m.co.uk")(rnd.nextInt(3))}"
      case 1 => (0 until 5 + rnd.nextInt(8)).map(_ => rnd.nextInt(10)).mkString
      case 2 => s"t${rnd.nextInt(50)}"
      case _ => s"${rnd.nextInt(999999)}" // short digits must survive
    }
    val docs = (0 until 120).map(i =>
      (i.toLong, (0 until rnd.nextInt(10)).map(_ => word()).mkString(" ")))
    val out = TextOps.redactPii(docs.toDF("id", "text"), "id", "text")
      .as[(Long, Long, Long, String)].collect()
    val email = TextOps.EmailRe.r
    val digits = TextOps.LongDigitRe.r
    out.foreach { case (id, nE, nD, red) =>
      assert(email.findFirstIn(red).isEmpty, s"doc $id leaked an email: $red")
      assert(digits.findFirstIn(red).isEmpty, s"doc $id leaked a digit run: $red")
      // counts agree with a JVM-regex recount on the original
      val text = docs(id.toInt)._2
      assert(nE == email.findAllIn(text).size, s"doc $id email count")
      assert(nD == digits.findAllIn(
        email.replaceAllIn(text, "<EMAIL>")).size, s"doc $id digit-run count")
    }
  }

  test("keep-last dedup is idempotent and order-insensitive (seeded Spark check)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      (rnd.nextInt(20).toLong, s"t${rnd.nextInt(4)}", rnd.nextInt(50).toLong, rnd.nextDouble())
    }
    val df = rows.toDF("k1", "k2", "v", "x")
    val shuffled = rnd.shuffle(rows).toDF("k1", "k2", "v", "x")
    val keys = Seq("k1", "k2")
    val ord = Seq(col("v"), col("x"))
    val once = Dedup.keepLast(df, keys, ord).collect().toSet
    val twice = Dedup.keepLast(Dedup.keepLast(df, keys, ord), keys, ord).collect().toSet
    val fromShuffled = Dedup.keepLast(shuffled, keys, ord).collect().toSet
    assert(once == twice && once == fromShuffled)
  }

  test("watermark monotonicity: appends never lower the max (seeded Spark check)") {
    import graft.operators.Incremental
    val base = Seq((1L, "a"), (5L, "b")).toDF("v", "p")
    val wm0 = Incremental.maxWatermark(base, "v").get
    (1 to 5).foreach { i =>
      val appended = base.union(Seq((i.toLong * 2, "x")).toDF("v", "p"))
      assert(Incremental.maxWatermark(appended, "v").get >= wm0)
    }
  }

  test("replay ≡ full refresh on random version-stamped streams (seeded Spark check)") {
    val rnd = new scala.util.Random(23)
    (0 until 2).foreach { trial =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-prop-$trial").toString
      val store = TableStore(spark, root)
      val n = 120
      val all = (1 to n).map { v =>
        (v.toLong, s"k${rnd.nextInt(9)}", s"t${rnd.nextInt(3)}", rnd.nextDouble())
      }
      val keys = Seq("k", "t")
      val ord = Seq(col("v"))
      val full = Dedup.keepLast(all.toDF("v", "k", "t", "x"), keys, ord)
      // random overlapping batch boundaries
      val cuts = (Seq(0, n) ++ (0 until 4).map(_ => rnd.nextInt(n))).sorted.distinct
      var last = full.limit(0)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        val overlapStart = math.max(0, a - rnd.nextInt(10)) // late duplicates
        val batch = all.slice(overlapStart, b).toDF("v", "k", "t", "x")
        last = store.incrementalUpsert("prod", "s", batch, "v", keys, ord)
      }
      assert(last.collect().toSet == full.collect().toSet, s"trial $trial")
    }
  }

  test("asofJoin ≡ brute-force latest-at-or-before lookup (seeded Spark check)") {
    import graft.operators.Joins
    val rnd = new scala.util.Random(41)
    val fact = (1 to 120).map(i =>
      (i.toLong, (rnd.nextInt(8) + 1).toLong, rnd.nextInt(100).toLong)).toDF("fid", "k", "t")
    // unique (k, dt) per the operator's determinism contract
    val dim = rnd.shuffle((1 to 8).flatMap(k => (0 until 12).map(j =>
      (k.toLong, (j * 9 + k).toLong, s"v$k-$j")))).toDF("k", "dt", "dval")
    val out = Joins.asofJoin(fact, dim, "k", "t", "dt", Seq("dval"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    val dims = dim.as[(Long, Long, String)].collect()
    val facts = fact.as[(Long, Long, Long)].collect()
    facts.foreach { case (fid, k, t) =>
      val expected = dims.filter(d => d._1 == k && d._2 <= t)
        .sortBy(_._2).lastOption.map(_._3).orNull
      assert(out(fid) == expected, s"fact $fid (k=$k t=$t)")
    }
  }

  test("simhashPairs pigeonhole candidates are complete: ≡ brute-force hamming (seeded)") {
    val rnd = new scala.util.Random(43)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 20).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val viaPigeonhole = TextOps.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = TextOps.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3
    } yield (a, b)).toSet
    assert(viaPigeonhole == brute)
  }

  test("rangeJoin ≡ theta containment join (seeded Spark check)") {
    import graft.operators.Joins
    val rnd = new scala.util.Random(47)
    val probes = (1 to 150).map(i => (i.toLong, rnd.nextDouble() * 1000)).toDF("pid", "v")
    val intervals = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 950
      (i.toLong, lo, lo + rnd.nextDouble() * 80) // widths ≤ bucketWidth
    }.toDF("iid", "lo", "hi")
    val bucketized = Joins.rangeJoin(probes, "v", intervals, "lo", "hi", 100.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val theta = probes.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketized == theta && theta.nonEmpty)
  }

  test("splitCuts partition the hash space for any valid fractions (property)") {
    import graft.operators.Sampling
    // random split vectors: 2-6 positive fractions normalized to sum 1
    val fracsGen = for {
      n <- Gen.choose(2, 6)
      raw <- Gen.listOfN(n, Gen.choose(1, 1000))
    } yield {
      val total = raw.sum.toDouble
      raw.map(_ / total)
    }
    check(Prop.forAll(fracsGen) { fs =>
      // shrinking can hand back out-of-contract vectors ([0.0]) — the
      // contract is the generator's, so vacuously pass those
      val valid = fs.size >= 2 && fs.forall(_ > 0.0) &&
        math.abs(fs.sum - 1.0) < 1e-9
      !valid || {
        val cuts = Sampling.splitCuts(fs.zipWithIndex.map { case (f, i) => (s"s$i", f) })
        // strictly increasing (no empty split can swallow another) and
        // the last cut covers the whole space up to float accumulation:
        // one ulp near 1.0 is ~2^60 × 2.2e-16 ≈ 256 hash units, and the
        // cumulative sum can be a few ulps off per term
        cuts.zip(cuts.tail).forall { case (a, b) => a < b } &&
          math.abs(cuts.last - Sampling.threshold(1.0)) <= 1024L * fs.size
      }
    })
  }

  test("rankedBy ≡ naive global row_number for random values (seeded Spark check)") {
    import graft.operators.Vocab
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(17)
    for (descending <- Seq(true, false); trial <- 1 to 2) {
      // heavy value ties (values 0-6) exercise the bucket-sub tie-break
      val rows = (1 to 300).map { i =>
        (f"k${rnd.nextInt(1000)}%03d-$i", rnd.nextInt(7).toLong)
      }
      val df = rows.toDF("k", "v")
      val b1 = if (descending) col("__n1").desc else col("__n1").asc
      val naive = df.withColumn("__n1", col("v"))
        .withColumn("id", row_number().over(Window.orderBy(b1, col("k"))).cast("long"))
        .select("k", "v", "id")
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      val got = Vocab.rankedBy(df, col("v"), descending,
          substring(col("k"), 1, 2), orderInBucket = col("k"), outCol = "id")
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      assert(got == naive, s"descending=$descending trial=$trial diverged")
    }
  }

  test("exactGroupedRankValues ≡ naive sorted rank on random shapes " +
       "(seeded Spark check)") {
    // the round-12 core change, fuzzed: random group layouts (skew,
    // ties, negatives, tiny/huge groups), random requested ranks,
    // adversarially small buckets/cutoff — the two-phase path must
    // equal the in-memory sorted reference for EVERY (group, rank)
    val rnd = new scala.util.Random(12)
    for (trial <- 1 to 5) {
      val nGroups = 1 + rnd.nextInt(6)
      val rows = (1 to 2000 + rnd.nextInt(3000)).map { _ =>
        val g = s"g${rnd.nextInt(nGroups)}"
        // mixture: heavy ties (quantized), smooth, negative ranges
        val v = rnd.nextInt(3) match {
          case 0 => math.floor(rnd.nextDouble() * 20) / 3.0
          case 1 => rnd.nextDouble() * 1e6 - 5e5
          case _ => rnd.nextGaussian()
        }
        (g, v)
      }
      val df = rows.toDF("g", "v").repartition(1 + rnd.nextInt(8))
      // memoized per group size so the assertion replays the same picks
      val picks = scala.collection.mutable.Map.empty[Long, Seq[(String, Long)]]
      val stableRanks: Long => Seq[(String, Long)] =
        n => picks.getOrElseUpdate(n, Seq(
          ("r1", 1L), ("rq", 1L + (rnd.nextInt(100) % n.toInt)), ("rn", n)))
      val got = graft.operators.Stats.exactGroupedRankValues(
          df, "g", "v", stableRanks,
          buckets = 2 + rnd.nextInt(6), cutoff = 1 + rnd.nextInt(4))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
        .toMap
      val byG = rows.groupBy(_._1)
      for ((g, vs) <- byG; (stat, k) <- picks(vs.size.toLong)) {
        val want = vs.map(_._2).sorted.apply(k.toInt - 1)
        assert(got((g, stat)) == want,
          s"trial $trial group $g $stat rank $k: got ${got((g, stat))}, want $want")
      }
    }
  }

  test("minhash signature agreement tracks true jaccard (statistical)") {
    val rnd = new scala.util.Random(31)
    val base = (0 until 60).map(i => s"w$i")
    def doc(drop: Int): String =
      (base.drop(drop) ++ (0 until drop).map(i => s"z$i$drop")).mkString(" ")
    val docs = Seq((0L, doc(0)), (1L, doc(3)), (2L, doc(25))).toDF("doc_id", "text")
    val sig = TextOps.minhashSignatures(docs, "doc_id", "text", 3, 128)
      .collect().map(r => r.getLong(0) -> (1 to 128).map(r.getLong)).toMap
    def agree(a: Long, b: Long) =
      sig(a).zip(sig(b)).count { case (x, y) => x == y } / 128.0
    // similar pair estimates high, dissimilar pair estimates low
    assert(agree(0L, 1L) > agree(0L, 2L) + 0.2,
      s"similar=${agree(0L, 1L)} dissimilar=${agree(0L, 2L)}")
  }
}
