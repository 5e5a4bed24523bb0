package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions, Jalali}

class SargableJalaliFilterSpec extends SparkSpec {
  import spark.implicits._

  private def dates = {
    GraftFunctions.register(spark)
    spark.range(1)
      .select(explode(sequence(
        to_date(lit("2019-01-01")), to_date(lit("2022-12-31")))).as("d"))
  }

  test("jalali BETWEEN window rewrites to sargable date bounds") {
    val filtered = dates.filter(
      GraftFunctions.jalaliDate(col("d")).between("1399/01/01", "1399/12/30"))
    val optimized = filtered.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("jalali_date"),
      s"rule did not fire:\n$optimized")
    // 1399 is a leap Jalali year: exactly 366 days
    assert(filtered.count() == 366)
    // boundary check against the scalar converter
    val days = filtered.agg(min(col("d")), max(col("d"))).first()
    assert(days.getDate(0).toString == "2020-03-20") // 1399/01/01
    assert(days.getDate(1).toString == "2021-03-20") // 1399/12/30
  }

  test("rewrite preserves semantics against the unrewritten evaluation") {
    // evaluate the string comparison outside a Filter (rule targets
    // Filter conditions) and compare
    val expected = dates
      .withColumn("j", GraftFunctions.jalaliDate(col("d")))
      .collect().count { r =>
        val j = r.getString(1); j >= "1400/06/15" && j <= "1401/02/03"
      }
    val viaRule = dates.filter(
      GraftFunctions.jalaliDate(col("d")).between("1400/06/15", "1401/02/03"))
      .count()
    assert(viaRule == expected && expected > 0)
  }

  test("unparseable literals are left untouched") {
    val weird = dates.filter(GraftFunctions.jalaliDate(col("d")) === "not-a-date")
    assert(weird.count() == 0) // evaluates (to false), no crash
    val plan = weird.queryExecution.optimizedPlan.toString
    assert(plan.contains("jalali_date")) // not rewritten
  }

  test("non-canonical Jalali dates (Esfand 30 of non-leap year) are not rewritten") {
    // 1400 is not leap: '1400/12/30' names no real day; the original
    // string equality is vacuously false and must stay that way
    val bogus = dates.filter(GraftFunctions.jalaliDate(col("d")) === "1400/12/30")
    assert(bogus.queryExecution.optimizedPlan.toString.contains("jalali_date"))
    assert(bogus.count() == 0)
    // and a range ending on the bogus day must not gain the next real day
    val range = dates.filter(
      GraftFunctions.jalaliDate(col("d")).between("1400/12/01", "1400/12/30"))
    assert(range.count() == 29) // Esfand 1400 has 29 days
  }

  test("strict comparisons map through the day bijection") {
    val gt = dates.filter(GraftFunctions.jalaliDate(col("d")) > "1400/12/29").count()
    val geNext = dates.filter(GraftFunctions.jalaliDate(col("d")) >= "1401/01/01").count()
    assert(gt == geNext) // 1400 not leap: 12/29 is its last day
    assert(Jalali.isLeapJalaliYear(1400) == false)
  }
}
