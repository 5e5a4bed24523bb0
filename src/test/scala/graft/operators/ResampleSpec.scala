package graft.operators

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("resampleLocf snapshots the latest observation at every grid tick") {
    // key 1 observed at t=95..430; hourly-ish step 100 → ticks 100..400
    val obs = Seq(
      (1L, 95L, 10.0), (1L, 130L, 20.0), (1L, 401L, 40.0), (1L, 430L, 50.0),
      (2L, 100L, 7.0), // exactly on a tick: that tick carries it
      (3L, 55L, 9.0)   // span shorter than a step → no ticks at all
    ).toDF("k", "t", "v")
    val out = Resample.resampleLocf(obs, "k", "t", Seq("v", "t"), stepUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out == Map(
      (1L, 100L) -> (10.0, 95L),  // latest at-or-before 100 is t=95
      (1L, 200L) -> (20.0, 130L), // carried forward across an empty hour
      (1L, 300L) -> (20.0, 130L),
      (1L, 400L) -> (20.0, 130L), // t=401 is after the tick
      (2L, 100L) -> (7.0, 100L)   // equal time matches (≤ semantics)
    ))
  }

  test("grid math is exact at the long extremes (no negate/add wrap)") {
    // spans hugging Long.MinValue / Long.MaxValue: ceil(lo/step) must
    // not wrap (a long negate of MinValue or lo + step - 1 near Max
    // would); expected ticks computed in BigInt
    val step = 7L
    // floor division in BigInt (BigInt / truncates toward zero)
    def floorD(x: BigInt, d: BigInt) =
      { val q = x / d; if (x % d != 0 && x < 0) q - 1 else q }
    for (lo <- Seq(Long.MinValue, Long.MinValue + 3, Long.MaxValue - 20)) {
      val hi = lo + 15
      val obs = Seq((1L, lo, 1.0), (1L, hi, 2.0)).toDF("k", "t", "v")
      val got = Resample.resampleLocf(obs, "k", "t", Seq("v"), step)
        .select("grid_ts").collect().map(_.getLong(0)).sorted
      val klo = floorD(BigInt(lo) + (step - 1), step)
      val khi = floorD(BigInt(hi), step)
      val want = (klo to khi).map(k => (k * step).toLong).toArray
      assert(got.sameElements(want),
        s"lo=$lo: got ${got.mkString(",")} want ${want.mkString(",")}")
    }
  }

  test("ticks are never null-valued: each key's grid starts at-or-after its first obs") {
    val rnd = new scala.util.Random(7)
    val obs = (1 to 3000).map { i =>
      ((rnd.nextInt(20) + 1).toLong, rnd.nextLong(100000L), rnd.nextDouble())
    }.toDF("k", "t", "v")
      .groupBy("k", "t").agg(org.apache.spark.sql.functions.max("v").as("v"))
    val out = Resample.resampleLocf(obs, "k", "t", Seq("v"), stepUs = 777L)
    assert(out.filter(out("v").isNull).isEmpty, "LOCF produced a null snapshot")
    // every tick is a step multiple
    assert(out.filter(out("grid_ts") % 777L =!= 0L).isEmpty)
  }
}
