package graft.functions

/** Jalali (Solar Hijri) ↔ Gregorian conversion.
  *
  * The reference keeps all dates as Jalali strings ('1401/12/25') sliced
  * from a compact payload (mabna_tables_create.py:149-152) and computes
  * "today" with the jdatetime package (:18); its 40,151-row dim-date
  * workbook (full-dimdate-pb.xlsx) is the Jalali↔Gregorian bridge for BI.
  * This module replaces both with an arithmetic conversion so the
  * dim-date table is generated, not shipped.
  *
  * Algorithm: the public Khayyam-calendar arithmetic used by jalaali-js /
  * jdatetime (Birashk break-years table). Cross-validated in tests
  * against ICU4J's PersianCalendar (icu4j ships in /opt/spark/jars).
  *
  * All arithmetic is integer-exact; `div` truncates toward negative
  * infinity like the reference implementations (Math.floorDiv).
  */
object Jalali {

  private val breaks = Array(-61, 9, 38, 199, 426, 686, 756, 818, 1111,
    1181, 1210, 1635, 2060, 2097, 2192, 2262, 2324, 2394, 2456, 3178)

  private def div(a: Int, b: Int): Int = Math.floorDiv(a, b)
  private def mod(a: Int, b: Int): Int = Math.floorMod(a, b)

  /** leap-ness of Jalali year jy, the Gregorian year its Farvardin 1
    * falls in, and the March day of that new year. */
  private[functions] def jalCal(jy: Int): (Int, Int, Int) = {
    require(jy > breaks.head && jy < breaks.last, s"Jalali year $jy out of range")
    val gy = jy + 621
    var leapJ = -14
    var jp = breaks(0)
    var jump = 0
    var i = 1
    var broke = false
    while (i < breaks.length && !broke) {
      val jm = breaks(i)
      jump = jm - jp
      if (jy < jm) broke = true
      else {
        leapJ += div(jump, 33) * 8 + div(mod(jump, 33), 4)
        jp = jm
      }
      i += 1
    }
    var n = jy - jp
    leapJ += div(n, 33) * 8 + div(mod(n, 33) + 3, 4)
    if (mod(jump, 33) == 4 && jump - n == 4) leapJ += 1
    val leapG = div(gy, 4) - div((div(gy, 100) + 1) * 3, 4) - 150
    val march = 20 + leapJ - leapG
    if (jump - n < 6) n = n - jump + div(jump + 4, 33) * 33
    var leap = mod(mod(n + 1, 33) - 1, 4)
    if (leap == -1) leap = 4
    (leap, gy, march)
  }

  /** jalCal's `leap` counts years since the last leap year; 0 means jy
    * itself is leap (jalaali-js `isLeapJalaaliYear`). */
  def isLeapJalaliYear(jy: Int): Boolean = jalCal(jy)._1 == 0

  /** Gregorian calendar date → Julian day number (floor-division-safe
    * March-based variant of Fliegel & Van Flandern 1968). */
  private[functions] def g2d(gy: Int, gm: Int, gd: Int): Int = {
    val a = div(14 - gm, 12) // 1 for Jan/Feb, 0 otherwise
    val y = gy + 4800 - a
    val m = gm + 12 * a - 3
    gd + div(153 * m + 2, 5) + 365 * y + div(y, 4) - div(y, 100) + div(y, 400) - 32045
  }

  /** Julian day number → Gregorian (y, m, d) (Fliegel & Van Flandern
    * inverse; all intermediates positive, so floor ≡ truncation). */
  private[functions] def d2g(jdn: Int): (Int, Int, Int) = {
    var l = jdn + 68569
    val n = div(4 * l, 146097)
    l -= div(146097 * n + 3, 4)
    val i = div(4000 * (l + 1), 1461001)
    l = l - div(1461 * i, 4) + 31
    val j = div(80 * l, 2447)
    val gd = l - div(2447 * j, 80)
    l = div(j, 11)
    val gm = j + 2 - 12 * l
    val gy = 100 * (n - 49) + i + l
    (gy, gm, gd)
  }

  /** Jalali date → Julian day number. */
  def j2d(jy: Int, jm: Int, jd: Int): Int = {
    val (_, gy, march) = jalCal(jy)
    g2d(gy, 3, march) + (jm - 1) * 31 - div(jm, 7) * (jm - 7) + jd - 1
  }

  /** Julian day number → Jalali (y, m, d). */
  def d2j(jdn: Int): (Int, Int, Int) = {
    val gy = d2g(jdn)._1
    var jy = gy - 621
    val (leap, _, march) = jalCal(jy)
    val jdn1f = g2d(gy, 3, march)
    var k = jdn - jdn1f
    if (k >= 0) {
      if (k <= 185) return (jy, 1 + div(k, 31), mod(k, 31) + 1)
      k -= 186
    } else {
      jy -= 1
      k += 179
      if (leap == 1) k += 1
    }
    (jy, 7 + div(k, 30), mod(k, 30) + 1)
  }

  def fromGregorian(gy: Int, gm: Int, gd: Int): (Int, Int, Int) =
    d2j(g2d(gy, gm, gd))

  def toGregorian(jy: Int, jm: Int, jd: Int): (Int, Int, Int) =
    d2g(j2d(jy, jm, jd))

  /** Days since Unix epoch (Spark's internal DateType value) → Jalali. */
  def fromEpochDay(epochDay: Int): (Int, Int, Int) =
    d2j(epochDay + 2440588) // JDN of 1970-01-01

  /** 'yyyy/MM/dd' zero-padded Jalali string (lexicographically ordered —
    * the reference's F2 BETWEEN depends on this). */
  def jDateString(epochDay: Int): String = {
    val (jy, jm, jd) = fromEpochDay(epochDay)
    f"$jy%04d/$jm%02d/$jd%02d"
  }
}
