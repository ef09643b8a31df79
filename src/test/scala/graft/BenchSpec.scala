package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the adaptive re-pass rule (round 17): the decision that
  * replaced the hand-listed min-of-3 set after four consecutive driver
  * benches false-flagged a min-of-2 query via whole-run contention
  * bursts. These are the exact scenarios from the VERDICT record.
  */
class BenchSpec extends AnyFunSuite {

  test("burst spanning both passes of an anchored query triggers a re-pass") {
    // the r16 ml_als_factors false flag: [11.23, 11.76] vs 3.31 anchor
    assert(Bench.repassNeeded(Seq(11.23, 11.76), Some(3.31)))
  }

  test("in-band min does not trigger") {
    // r17 quiet readings sit near or under their anchors
    assert(!Bench.repassNeeded(Seq(4.21, 3.20), Some(3.35)))
    assert(!Bench.repassNeeded(Seq(2.06, 1.86), Some(1.70)))
  }

  test("a re-pass that lands in-band stops the loop") {
    // third pass recovered the quiet min -> no fourth pass
    assert(!Bench.repassNeeded(Seq(11.23, 11.76, 4.43), Some(3.31)))
    // third pass still high -> one more (the caller caps at 2 extras)
    assert(Bench.repassNeeded(Seq(11.23, 11.76, 10.9), Some(3.31)))
  }

  test("noise-floor entries never trigger regardless of ratio") {
    // 0.15 s anchor, 0.39 s min = 2.6x but under the 0.4 s floor:
    // scheduler jitter, not signal
    assert(!Bench.repassNeeded(Seq(0.39, 0.39), Some(0.15)))
    assert(Bench.repassNeeded(Seq(0.41, 0.45), Some(0.15)))
  }

  test("anchorless and crashed queries never re-pass") {
    assert(!Bench.repassNeeded(Seq(99.0, 99.0), None))
    assert(!Bench.repassNeeded(Seq(-1.0, 11.76), Some(3.31)))
  }

  test("every bench-group query has an anchor") {
    // the adaptive rule only protects anchored entries, so a bench
    // entry must land WITH a (possibly provisional) anchor in the same
    // commit — pin it from a quiet TimeAll/local-bench reading and
    // re-pin after the first driver bench (the lda_em_topics_dist
    // pattern; Bench.anchors' scaladoc states the workflow)
    val missing = (SparkEntry.benchQueries ++ SparkEntry.benchQueries2)
      .filterNot(Bench.anchors.contains)
    assert(missing.isEmpty, s"bench entries without anchors: $missing")
  }
}
