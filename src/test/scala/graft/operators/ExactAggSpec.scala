package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The long-units aggregation must be bit-identical to the wide-decimal
  * formulation it replaced (q07's oracle convention: HALF_UP
  * double→decimal cast, exact decimal sums, one final double cast). */
class ExactAggSpec extends SparkSpec {
  import spark.implicits._

  test("fixedPointUnits reproduces the HALF_UP decimal cast exactly") {
    // values chosen where naive double×100 arithmetic rounds differently
    // from the decimal cast of the shortest string representation
    val vals = Seq(2.675, 0.145, 1001.15, 0.005, 99.995, 123456.78, 0.0, 9.99)
    val df = vals.toDF("x")
    val got = df.select(
      ExactAgg.fixedPointUnits(col("x"), 8, 2).as("units"),
      (col("x").cast("decimal(18,2)") * lit(100).cast("decimal(3,0)"))
        .cast("long").as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"row $r"))
  }

  test("exactSums equals the wide-decimal sum chain on random money data") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      val price = math.round(rnd.nextDouble() * 10000000) / 100.0 // 2-dec
      val disc = rnd.nextInt(11) / 100.0                          // 0.00-0.10
      val qty = (rnd.nextInt(50) + 1).toDouble
      (s"k${i % 4}", price, disc, qty)
    }
    val df = rows.toDF("k", "price", "disc", "qty").repartition(7)

    val cents = ExactAgg.fixedPointUnits(col("price"), 8, 2)
    val dcents = ExactAgg.fixedPointUnits(col("disc"), 1, 2)
    val fast = ExactAgg.exactSums(df, Seq(col("k")),
        sums = Seq(("sum_price", cents, 2),
          ("sum_disc_price", cents * (lit(100L) - dcents), 4)),
        carryDouble = Seq(("sum_qty", col("qty"))), countName = "n")
      .orderBy("k").collect()

    val ref = df.groupBy(col("k"))
      .agg(
        sum(col("price").cast("decimal(18,2)")).cast("double").as("sum_price"),
        sum(col("price").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,6)") - col("disc").cast("decimal(18,6)")))
          .cast("double").as("sum_disc_price"),
        sum(col("qty")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("k").collect()

    fast.zip(ref).foreach { case (f, r) =>
      assert(f.getAs[String]("k") == r.getAs[String]("k"))
      assert(f.getAs[Double]("sum_price") == r.getAs[Double]("sum_price"))
      assert(f.getAs[Double]("sum_disc_price") == r.getAs[Double]("sum_disc_price"))
      assert(f.getAs[Double]("sum_qty") == r.getAs[Double]("sum_qty"))
      assert(f.getAs[Long]("n") == r.getAs[Long]("n"))
    }
  }

  test("out-of-domain value fails loudly instead of vanishing as NULL") {
    // with ANSI off a cast overflow yields NULL, which sum() would drop
    // silently; the guard must convert that into a runtime error.
    val over = Seq(1.0e9, 2.5).toDF("x") // 1e9 needs 10 int digits > 8
    val ex = intercept[Exception] {
      over.select(ExactAgg.fixedPointUnits(col("x"), 8, 2).as("u"))
        .agg(sum(col("u"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("fixedPointUnits")), ex.toString)

    // nulls still pass through untouched (excluded from sums as before)
    val withNull = Seq[Option[Double]](Some(2.5), None).toDF("x")
    val got = withNull
      .select(ExactAgg.fixedPointUnits(col("x"), 8, 2).as("u"))
      .agg(sum(col("u"))).first().getLong(0)
    assert(got == 250L)
  }

  test("partial long sums stay bounded: units magnitude contract") {
    // the two-level reduce is safe while a single scan partition's unit
    // sum fits a long; with ≤1e9 units/row that is ≥9e9 rows/partition —
    // far beyond any real partition. Pin the extraction bound itself.
    val df = Seq(99999999.99).toDF("x") // max for decimal(10,2)
    val units = df.select(ExactAgg.fixedPointUnits(col("x"), 8, 2)).first().getLong(0)
    assert(units == 9999999999L)
    assert(units < (1L << 34)) // ~1.7e10: 5e8 rows/partition min headroom
  }
}
