package graft.functions

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

class JalaliSpec extends AnyFunSuite {

  // Authoritative golden dates (public Persian-calendar tables).
  private val golden = Seq(
    // (gregorian, jalali)
    ("1970-01-01", (1348, 10, 11)),
    ("1995-03-21", (1374, 1, 1)),
    ("2016-03-20", (1395, 1, 1)),
    ("2020-03-19", (1398, 12, 29)), // 1398 not leap
    ("2020-03-20", (1399, 1, 1)),
    ("2021-03-20", (1399, 12, 30)), // 1399 IS leap
    ("2021-03-21", (1400, 1, 1)),
    ("2024-03-20", (1403, 1, 1)),
    ("2025-03-20", (1403, 12, 30)), // 1403 IS leap
    ("2025-03-21", (1404, 1, 1)),
    ("2026-08-12", (1405, 5, 21))
  )

  test("golden Gregorian→Jalali conversions") {
    golden.foreach { case (g, j) =>
      val d = LocalDate.parse(g)
      assert(Jalali.fromGregorian(d.getYear, d.getMonthValue, d.getDayOfMonth) == j,
        s"for $g")
    }
  }

  test("golden Jalali→Gregorian conversions (inverse)") {
    golden.foreach { case (g, (jy, jm, jd)) =>
      val d = LocalDate.parse(g)
      assert(Jalali.toGregorian(jy, jm, jd) ==
        ((d.getYear, d.getMonthValue, d.getDayOfMonth)), s"for $jy/$jm/$jd")
    }
  }

  test("known leap years (33-year cycle with Birashk breaks)") {
    val leaps = Set(1370, 1375, 1379, 1383, 1387, 1391, 1395, 1399, 1403, 1408)
    (1370 to 1410).foreach { jy =>
      assert(Jalali.isLeapJalaliYear(jy) == leaps.contains(jy), s"year $jy")
    }
  }

  test("roundtrip identity over 1900-2100") {
    var d = LocalDate.of(1900, 1, 1)
    val end = LocalDate.of(2100, 12, 31)
    while (!d.isAfter(end)) {
      val (jy, jm, jd) = Jalali.fromGregorian(d.getYear, d.getMonthValue, d.getDayOfMonth)
      assert(Jalali.toGregorian(jy, jm, jd) ==
        ((d.getYear, d.getMonthValue, d.getDayOfMonth)), s"roundtrip $d")
      assert(jm >= 1 && jm <= 12 && jd >= 1 && jd <= 31)
      d = d.plusDays(1)
    }
  }

  test("jDateString is zero-padded and lexicographically monotonic") {
    var d = LocalDate.of(1990, 1, 1)
    var prev = ""
    val end = LocalDate.of(2030, 12, 31)
    while (!d.isAfter(end)) {
      val s = Jalali.jDateString(d.toEpochDay.toInt)
      assert(s.length == 10, s)
      assert(s > prev, s"$s after $prev")
      prev = s
      d = d.plusDays(1)
    }
  }

  test("agrees with ICU4J PersianCalendar over 1950-2077") {
    import com.ibm.icu.util.{GregorianCalendar, PersianCalendar, TimeZone, ULocale}
    val utc = TimeZone.getTimeZone("GMT")
    var d = LocalDate.of(1950, 1, 1)
    val end = LocalDate.of(2077, 12, 31)
    var checked = 0
    while (!d.isAfter(end)) {
      val g = new GregorianCalendar(utc, ULocale.US)
      g.clear()
      g.set(d.getYear, d.getMonthValue - 1, d.getDayOfMonth)
      val p = new PersianCalendar(utc, ULocale.US)
      p.setTime(g.getTime)
      val icu = (p.get(com.ibm.icu.util.Calendar.EXTENDED_YEAR),
        p.get(com.ibm.icu.util.Calendar.MONTH) + 1,
        p.get(com.ibm.icu.util.Calendar.DAY_OF_MONTH))
      val ours = Jalali.fromGregorian(d.getYear, d.getMonthValue, d.getDayOfMonth)
      assert(ours == icu, s"for $d")
      checked += 1
      d = d.plusDays(7) // weekly stride keeps the suite fast
    }
    assert(checked > 6000)
  }
}
