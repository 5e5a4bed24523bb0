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

  test("BI export carries the artifact's 18 columns and golden values") {
    val frame = DimDate.biFrame(spark, "1941-03-21", "2051-03-20")
    assert(frame.columns.toSeq == Seq("Miladi", "Jalali_1", "Jalali_2",
      "Miladi", "jyear", "mmonthN", "jmonthN", "mmonthT", "jmonthT",
      "mnime", "jnime", "JquarterN", "JQuarterT", "MquarterN",
      "JWeekDay", "MWeekDay", "MWeekNum", "JWeekNum"))
    // golden-diff the artifact-shaped values on the pinned rows: the
    // Farsi weekday strings (exact xlsx spellings incl. the space in
    // "سه شنبه"), both Jalali renderings, and the week numbers
    val path = getClass.getResource("/fixtures/dimdate_golden.csv").getPath
    val golden = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path)
    // positional aliases: the frame's duplicate `Miladi` headers make
    // name-based references ambiguous by design (artifact parity)
    val bi = frame.toDF((0 until 18).map(i => s"c$i"): _*)
    val j = golden.alias("g")
      .join(bi.alias("e"), col("g.miladi") === col("e.c0"))
    assert(j.count() == golden.count())
    val bad = j.filter(
      col("g.jalali") =!= col("e.c1") ||
        format_string("%d/%d/%d", col("g.jyear"), col("g.jmonth"),
          col("g.jday")) =!= col("e.c2") ||
        col("g.miladi").cast("string") =!= col("e.c3") ||
        col("g.jyear").cast("string") =!= col("e.c4") ||
        col("g.mmonth") =!= col("e.c5") ||
        col("g.jmonth") =!= col("e.c6") ||
        col("g.mmonth_name") =!= col("e.c7") ||
        (col("g.mnime") === 1) =!=
          (col("e.c9") === "First Half of Year") ||
        (col("g.jnime") === 1) =!= (col("e.c10") === "نیمه اول سال") ||
        col("g.jquarter") =!= col("e.c11") ||
        col("g.mquarter") =!= col("e.c13") ||
        col("g.jweek_day_fa") =!= col("e.c14") ||
        col("g.mweek_day") =!= col("e.c15") ||
        col("g.mweek_num") =!= col("e.c16") ||
        col("g.jweek_num") =!= col("e.c17"))
    val sample = bad.select("g.miladi", "g.jweek_day_fa", "e.c14").take(5)
    assert(sample.isEmpty, s"BI golden mismatches: ${sample.mkString("; ")}")
  }

  test("BI CSV export writes one header + one row per day, UTF-8 intact") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-dimdate").toString + "/bi"
    DimDate.exportBiCsv(spark, "2024-03-20", "2024-04-02", out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length == 1, "coalesce(1) must emit exactly one csv")
    val lines = scala.io.Source.fromFile(files.head, "UTF-8")
      .getLines().toVector
    assert(lines.head == "Miladi,Jalali_1,Jalali_2,Miladi,jyear," +
      "mmonthN,jmonthN,mmonthT,jmonthT,mnime,jnime,JquarterN," +
      "JQuarterT,MquarterN,JWeekDay,MWeekDay,MWeekNum,JWeekNum")
    assert(lines.size == 1 + 14) // 2024-03-20..2024-04-02 inclusive
    // Nowruz 1403: first data row is 1403/01/01, a Wednesday (چهارشنبه)
    assert(lines(1).startsWith("2024-03-20,1403/01/01,1403/1/1," +
      "2024-03-20,1403,3,1,March,فروردین,First Half of Year"))
    assert(lines(1).contains("چهارشنبه"))
  }
}
