package graft.functions

import graft.SparkSpec

class DimDateSpec extends SparkSpec {

  test("one row per day, correct Jalali new-year boundaries") {
    val df = DimDate.generate(spark, "2024-03-18", "2024-03-22").cache()
    assert(df.count() == 5)
    val byMiladi = df.collect().map(r =>
      r.getAs[String]("miladi") -> r.getAs[String]("jalali")).toMap
    assert(byMiladi("2024-03-19") == "1402/12/29")
    assert(byMiladi("2024-03-20") == "1403/01/01")
    assert(byMiladi("2024-03-21") == "1403/01/02")
  }

  test("month names, quarters, halves and day-of-year derive from parts") {
    val df = DimDate.generate(spark, "2024-03-20", "2024-03-20")
    val r = df.first()
    assert(r.getAs[String]("jmonth_name") == "Farvardin")
    assert(r.getAs[Int]("jquarter") == 1)
    assert(r.getAs[Int]("jnime") == 1)
    assert(r.getAs[Int]("jday_of_year") == 1)
    assert(r.getAs[Int]("jweek_num") == 1)
    assert(r.getAs[Int]("myear") == 2024)
    assert(r.getAs[Int]("mquarter") == 1)
  }

  test("jweek_day: Saturday=1 .. Friday=7") {
    // 2024-03-23 is a Saturday
    val df = DimDate.generate(spark, "2024-03-23", "2024-03-29")
    val days = df.collect().map(r =>
      r.getAs[String]("miladi") -> r.getAs[Int]("jweek_day")).toMap
    assert(days("2024-03-23") == 1) // Saturday
    assert(days("2024-03-29") == 7) // Friday
  }

  test("reference dim-date span (1320/01/01 ≈ 1941-03-21 onward) generates cleanly") {
    val df = DimDate.generate(spark, "1941-03-21", "2051-03-20")
    val n = df.count()
    assert(n > 40000) // the reference workbook is 40,151 rows
    assert(df.select("jalali").distinct().count() == n)
  }
}
