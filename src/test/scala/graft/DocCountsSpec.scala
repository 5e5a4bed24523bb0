package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for doc-count drift (a recurring class: rounds 4-9
  * each shipped a README/COVERAGE count that lagged the last commits of
  * the round). The docs' numbers are asserted against the code itself,
  * so a new query or spec that lands without a doc sync fails `sbt
  * test` instead of reaching a verdict. */
class DocCountsSpec extends AnyFunSuite {

  private def read(p: String): String = Files.readString(Paths.get(p))

  private def firstInt(text: String, pattern: scala.util.matching.Regex,
                       where: String): Int =
    pattern.findFirstMatchIn(text)
      .getOrElse(fail(s"count sentence not found in $where — " +
        s"update the doc AND this regex together"))
      .group(1).toInt

  test("README query count equals SparkEntry.queries.size") {
    val claimed = firstInt(read("README.md"),
      raw"(\d+) named queries".r, "README.md")
    assert(claimed == SparkEntry.queries.size,
      s"README says $claimed queries; SparkEntry has ${SparkEntry.queries.size}")
  }

  test("COVERAGE query count equals SparkEntry.queries.size") {
    val claimed = firstInt(read("COVERAGE.md"),
      raw"(\d+) oracle-verified queries".r, "COVERAGE.md")
    assert(claimed == SparkEntry.queries.size,
      s"COVERAGE says $claimed queries; SparkEntry has ${SparkEntry.queries.size}")
  }

  test("README spec count equals the test call sites in src/test/scala") {
    // static `test(` call sites == runtime test count in this tree (no
    // dynamically-registered tests; this spec's own five sites included)
    val testRx = raw"(?m)^\s*test\(".r
    val actual = {
      val s = Files.walk(Paths.get("src/test/scala"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.toString.endsWith(".scala"))
          .map(p => testRx.findAllIn(read(p.toString)).size).sum
      } finally s.close()
    }
    val claimed = firstInt(read("README.md"),
      raw"(\d+) unit/property/law specs".r, "README.md")
    assert(claimed == actual,
      s"README says $claimed specs; src/test/scala defines $actual")
  }

  test("NOTES suite counts match the suite classes in src/test/scala") {
    // round-11 drift class: NOTES/commit text claimed 46 suites when
    // scalatest reports 45 (one helper class is not a suite). Every
    // "N suites" claim in NOTES must equal the static suite count:
    // classes extending a scalatest base — helper classes excluded —
    // OR be a historical note for an earlier round (strictly smaller).
    val suiteRx = raw"(?m)^class\s+\w+\s+extends\s+(SparkSpec|AnyFunSuite|AnyPropSpec)".r
    val actual = {
      val s = Files.walk(Paths.get("src/test/scala"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.toString.endsWith(".scala"))
          .map(p => suiteRx.findAllIn(read(p.toString)).size).sum
      } finally s.close()
    }
    val claims = raw"(\d+) suites".r.findAllMatchIn(read("NOTES.md"))
      .map(_.group(1).toInt).toSeq
    assert(claims.nonEmpty, "NOTES.md has no 'N suites' claim")
    assert(claims.max == actual,
      s"NOTES.md's largest suite claim ${claims.max} != actual $actual suites")
  }

  test("every registered query has a COVERAGE row") {
    val coverage = read("COVERAGE.md")
    val missing = SparkEntry.queries.keys.filterNot(coverage.contains).toSeq.sorted
    assert(missing.isEmpty,
      s"queries with no COVERAGE.md row: ${missing.mkString(", ")}")
  }

  test("every registered query has an oracle") {
    val missing = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .toSeq.sorted
    assert(missing.isEmpty,
      s"queries with no oracleSql entry (driver degrades to rows-only): " +
        missing.mkString(", "))
  }
}
