package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plain-JVM pins for the driver-side statistical constants the
  * injected-quantile pattern ships into both query renderings.
  */
class StatsSpec extends AnyFunSuite {

  test("BH critical ladder matches known normal quantiles") {
    // zc(k) = invPhi(1 - 0.05·k/20): k=10 is the familiar two-sided .05
    // quantile, k=2 the .005 one; Acklam's approximation is 1.15e-9
    // relative, so 1e-6 tolerance leaves 3 orders of margin
    val zc = graft.ops.Aggregates.bhZCrit
    assert(zc.length == graft.ops.Aggregates.BhM)
    assert(math.abs(zc(9) - 1.9599639845) < 1e-6, s"zc(10) = ${zc(9)}")
    assert(math.abs(zc(1) - 2.5758293035) < 1e-6, s"zc(2) = ${zc(1)}")
    assert(math.abs(zc(0) - 2.8070337683) < 1e-6, s"zc(1) = ${zc(0)}")
    // strictly decreasing in k (larger k → weaker threshold)
    zc.sliding(2).foreach { case Array(a, b) => assert(a > b) }
  }

  test("RBO weight ladder: decreasing, and sums to the 1 - p^k identity") {
    // Σ_{m=1..k} W[m] = (1-p)·Σ_{d=1..k} p^{d-1}/d · |{m ≤ d}| =
    // (1-p)·Σ p^{d-1} = 1 - p^k — the truncated-RBO mass of two
    // IDENTICAL lists, i.e. the attainable maximum. Pinning it checks
    // the per-item rewrite W[m] = (1-p)Σ_{d≥m} p^{d-1}/d wholesale.
    val w = graft.ops.SimilarityOps.rboWeightNano
    val k = graft.ops.SimilarityOps.FusionDepth
    val p = graft.ops.SimilarityOps.RboP
    assert(w.length == k)
    w.sliding(2).foreach { case Array(a, b) => assert(a > b) }
    assert(w.last > 0)
    val idealNano = math.round((1 - math.pow(p, k)) * 1e9)
    assert(math.abs(w.sum - idealNano) <= k, // ±1 nano rounding per entry
      s"ladder sum ${w.sum} vs identity $idealNano")
  }

  test("advanced composition crosses below basic where the algebra says") {
    // eps0 = 0.1, delta' = 1e-6: advanced wins iff
    // 0.1·sqrt(2k·ln 1e6) + k·0.1·(e^0.1−1) < 0.1k  ⟺  k ≥ 35
    val c1 = math.sqrt(2 * math.log(1e6))
    val em1 = math.expm1(0.1)
    def adv(k: Int) = 0.1 * c1 * math.sqrt(k.toDouble) + k * 0.1 * em1
    def basic(k: Int) = k * 0.1
    assert(adv(34) >= basic(34))
    assert(adv(35) < basic(35))
  }
}
