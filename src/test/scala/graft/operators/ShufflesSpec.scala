package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShufflesSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // 90% of rows share one key — the classic hot-key shape
    val rows = (1 to 2000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (i.toLong, k, i * 1.5)
    }
    rows.toDF("id", "key", "v")
  }

  private def dim = Seq(("hot", "H"), ("k0", "A"), ("k1", "B"), ("k2", "C"),
    ("k3", "D"), ("k4", "E"), ("k5", "F"), ("k6", "G")).toDF("key", "label")

  test("saltedEquiJoin equals the plain inner join") {
    val plain = skewed.join(dim, Seq("key"))
      .select("id", "key", "v", "label").collect().toSet
    val salted = Shuffles.saltedEquiJoin(skewed, dim, "key", salts = 8)
      .select("id", "key", "v", "label").collect().toSet
    assert(salted == plain && plain.size == 2000)
  }

  test("salted join spreads the hot key: join keys include the salt") {
    val plan = Shuffles.saltedEquiJoin(skewed, dim, "key", 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from join:\n$plan")
  }

  test("salt is deterministic: stable under task retry, no optimizer fence") {
    // A monotonically_increasing_id salt (pre-round-9) changes value when
    // a task retries — rows can double or vanish mid-shuffle — and its
    // nondeterminism annotation fences filter pushdown through the
    // projection. The xxhash64 row salt must leave the whole plan
    // deterministic.
    val salted = Shuffles.saltedEquiJoin(skewed, dim, "key", 8)
    val nondet = salted.queryExecution.analyzed.collect {
      case p => p.expressions.filterNot(_.deterministic)
    }.flatten
    assert(nondet.isEmpty, s"nondeterministic exprs in salted join: $nondet")
    // and identical runs assign identical salts (same rows, same buckets)
    val a = salted.collect().toSeq.sortBy(_.getLong(1))
    val b = salted.collect().toSeq.sortBy(_.getLong(1))
    assert(a == b)
  }

  test("filter above the salted join pushes below it") {
    // With the nondeterministic round-8 salt the optimizer had to fence
    // the filter ABOVE the salt projection; deterministic salt lets it
    // push below the join — here all the way into the LocalRelation
    // (evaluated at plan time, no Filter node survives). Accept either
    // full absorption or a Filter strictly below the Join; reject a
    // Filter stuck above it.
    val plan = Shuffles.saltedEquiJoin(skewed, dim, "key", 8)
      .filter(col("v") > 100.0).queryExecution.optimizedPlan.toString
    val joinAt = plan.indexOf("Join")
    val filterAt = plan.indexOf("Filter")
    assert(joinAt >= 0 && (filterAt == -1 || filterAt > joinAt),
      s"v > 100 did not push through the salt projection below the join:\n$plan")
  }

  test("saltedJoinBySkew equals the plain inner join at every decision " +
       "regime (none / only-the-hot-key / all salted)") {
    val plain = skewed.join(dim, Seq("key"))
      .select("id", "key", "v", "label").collect().toSet
    // thresholds chosen against the fixture: "hot" holds 90% of rows,
    // each k0..k6 ~1.4% — 500000 ppm salts only "hot", 1 ppm salts
    // everything, 999999 ppm salts nothing (plain join shape)
    for (thr <- Seq(1L, 500000L, 999999L)) {
      val got = Shuffles.saltedJoinBySkew(skewed, dim, "key",
          salts = 8, thresholdPpm = thr)
        .select("id", "key", "v", "label").collect().toSet
      assert(got == plain && plain.size == 2000,
        s"auto-salted join diverged from plain at thresholdPpm=$thr")
    }
  }

  test("saltedJoinBySkew replicates ONLY hot dim rows: at a 50% " +
       "threshold the dim side carries 8 copies of 'hot' and 1 of " +
       "each cold key") {
    // the economics the operator exists for: q64's indiscriminate form
    // replicates the WHOLE dim `salts`×; the audit-driven form pays
    // replication only where the audit says the skew is
    val salted = Shuffles.saltedJoinBySkew(skewed, dim, "key",
      salts = 8, thresholdPpm = 500000L)
    val hotMatches = salted.filter(col("key") === "hot").count()
    val plainHot = skewed.filter(col("key") === "hot").count()
    assert(hotMatches == plainHot, "hot key rows doubled or vanished")
    // decision is exact integer ppm: key share == threshold counts as hot
    val exactly = Shuffles.saltedJoinBySkew(
      Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("id", "key"),
      Seq(("a", "A"), ("b", "B")).toDF("key", "label"),
      "key", salts = 4, thresholdPpm = 500000L)
    assert(exactly.count() == 4, "share == threshold must salt, not skip")
  }

  test("saltedJoinHot honors the any-hot-set contract even for a " +
       "caller-supplied hot list with duplicates") {
    // the documented contract is ≡-plain-join for ANY hot set; a
    // duplicated hot key must not multiply matching fact rows through
    // the tag join (the operator dedups the hot list internally)
    val plain = skewed.join(dim, Seq("key"))
      .select("id", "key", "v", "label").collect().toSet
    val dupHot = Seq("hot", "hot", "k1", "hot", "k1").toDF("key")
    val salted = Shuffles.saltedJoinHot(skewed, dim, "key", salts = 8,
        hotKeys = dupHot)
      .select("id", "key", "v", "label").collect()
    assert(salted.length == plain.size,
      s"duplicate hot keys multiplied rows: ${salted.length} vs ${plain.size}")
    assert(salted.toSet == plain)
  }

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy("key").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Shuffles.saltedCount(skewed, "key", 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("bucketed-bucketed join runs without an exchange") {
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Shuffles.writeBucketed(a, "graft_bkt_a", "k", 4)
    Shuffles.writeBucketed(b, "graft_bkt_b", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
