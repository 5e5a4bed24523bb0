package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the bench's window sentinel ([[Bench.windowSuspects]]):
  * a synthetic mid-run contention window must flag exactly the queries
  * it bracketed — not the clean stretches around it, not the run. */
class BenchWindowSpec extends AnyFunSuite {

  // 30 queries, winSize 10 → 3 windows, probe boundaries p0..p3
  private val prior = Some(0.1)

  test("a loaded middle window flags its queries and only its queries") {
    // window 1 (queries 10-19) bracketed by two 5x probes; 0 and 2 clean
    val probes = IndexedSeq(0.11, 0.52, 0.49, 0.10)
    val got = Bench.windowSuspects(30, 10, probes, prior)
    assert(got == (10 until 20).toSet)
  }

  test("a single spiky probe sample flags nothing (both brackets required)") {
    val probes = IndexedSeq(0.11, 0.55, 0.10, 0.12)
    assert(Bench.windowSuspects(30, 10, probes, prior).isEmpty)
  }

  test("whole-run contention flags every query") {
    val probes = IndexedSeq(0.5, 0.6, 0.55, 0.48)
    assert(Bench.windowSuspects(30, 10, probes, prior) == (0 until 30).toSet)
  }

  test("no prior probe (first round) flags nothing") {
    val probes = IndexedSeq(0.5, 0.6, 0.55, 0.48)
    assert(Bench.windowSuspects(30, 10, probes, None).isEmpty)
    assert(Bench.windowSuspects(30, 10, probes, Some(0.0)).isEmpty)
  }

  test("partial last window uses the end probe as its right bracket") {
    // 25 queries → windows 0,1,2 with queries 20-24 in window 2;
    // only window 2's brackets (p2, p3) are hot
    val probes = IndexedSeq(0.10, 0.11, 0.50, 0.55)
    val got = Bench.windowSuspects(25, 10, probes, prior)
    assert(got == (20 until 25).toSet)
  }

  test("clean run flags nothing") {
    assert(Bench.windowSuspects(30, 10,
      IndexedSeq(0.09, 0.12, 0.11, 0.10), prior).isEmpty)
  }
}
