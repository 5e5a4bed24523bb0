package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins DimDate.generate to the reference's one shipped data artifact
  * (full-dimdate-pb.xlsx, sheet DATES, 40,151 rows spanning 1941-03-21
  * → 2051-02-22). fixtures/dimdate_golden.csv holds 956 rows extracted
  * from the xlsx: every Nowruz (1/1, 1/2), every Esfand 28–30 (the leap
  * boundary), every Gregorian year boundary, every Jalali half-year
  * boundary (6/31, 7/1), plus a systematic every-731-days sample.
  * Every generated column is asserted against the artifact's value.
  */
class GoldenDimDateSpec extends SparkSpec {

  // xlsx column O (JWeekDay) is the Farsi weekday name; our jweek_day
  // is the Persian-week index 1=Saturday..7=Friday.
  private val faWeekday = Map(
    "شنبه" -> 1, "یکشنبه" -> 2, "دوشنبه" -> 3, "سه شنبه" -> 4,
    "چهارشنبه" -> 5, "پنج شنبه" -> 6, "جمعه" -> 7)

  test("every golden xlsx row is reproduced exactly") {
    val path = getClass.getResource("/fixtures/dimdate_golden.csv").getPath
    val golden = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path)
    val nGolden = golden.count()
    assert(nGolden == 956)

    val gen = DimDate.generate(spark, "1941-03-21", "2051-03-20")
    val joined = golden.alias("g")
      .join(gen.alias("e"), col("g.miladi") === col("e.miladi"), "left")
      .cache()
    assert(joined.count() == nGolden)

    val mismatch = joined.filter(
      col("e.jalali").isNull ||
        col("g.jalali") =!= col("e.jalali") ||
        col("g.jyear") =!= col("e.jyear") ||
        col("g.jmonth") =!= col("e.jmonth") ||
        col("g.jday") =!= col("e.jday") ||
        col("g.mmonth") =!= col("e.mmonth") ||
        col("g.mmonth_name") =!= col("e.mmonth_name") ||
        col("g.jquarter") =!= col("e.jquarter") ||
        col("g.mquarter") =!= col("e.mquarter") ||
        col("g.mnime") =!= col("e.mnime") ||
        col("g.jnime") =!= col("e.jnime") ||
        col("g.mweek_day") =!= col("e.mweek_day") ||
        col("g.mweek_num") =!= col("e.mweek_num") ||
        col("g.jweek_num") =!= col("e.jweek_num"))
    val bad = mismatch.select("g.miladi", "g.jalali", "e.jalali",
      "g.mweek_num", "e.mweek_num", "g.jweek_num", "e.jweek_num").take(5)
    assert(bad.isEmpty, s"golden mismatches: ${bad.mkString("; ")}")

    val wdBad = joined.collect().filter { r =>
      faWeekday(r.getAs[String]("jweek_day_fa")) != r.getAs[Int]("jweek_day")
    }
    assert(wdBad.isEmpty, s"weekday mismatches: ${wdBad.take(5).mkString("; ")}")
  }
}
