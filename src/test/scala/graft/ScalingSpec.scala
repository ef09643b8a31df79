package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scaling

/** Pins the input-proportional shuffle-width rule (round 18) — the
  * SCALE.md "16-wide anomaly" lesson as code: partitions scale WITH
  * the data, floor at the core count, multiples of it above.
  */
class ScalingSpec extends AnyFunSuite {

  private val MiB = 1L << 20

  test("small inputs stay at the parallelism floor") {
    // sf0.1 (17 MB) and the 10x fixture (174 MB) both measured healthy
    // at 16-wide — the rule keeps them there
    assert(Scaling.widthFor(17 * MiB, 16) == 16)
    assert(Scaling.widthFor(174 * MiB, 16) == 16)
    assert(Scaling.widthFor(0L, 16) == 16)
  }

  test("the measured 100x fixture gets the measured-good width") {
    // 1.7 GB at 16-wide read 33.6 s; the 32-wide rerun read 10.95 s
    // (SCALE.md) — the rule must pick 32 for that input without a human
    assert(Scaling.widthFor(1700 * MiB, 16) == 32)
  }

  test("width keeps pace with the data and divides the cores") {
    // a 1000x corpus (~17 GB): ~272 partitions, a multiple of 16
    val w = Scaling.widthFor(17000 * MiB, 16)
    assert(w == 272, s"got $w")
    // monotone in bytes at fixed floor
    val ws = Seq(1L, 100L, 1000L, 10000L, 100000L)
      .map(m => Scaling.widthFor(m * MiB, 8))
    assert(ws == ws.sorted)
    ws.foreach(w => assert(w % 8 == 0))
  }

  test("floor must be positive") {
    intercept[IllegalArgumentException](Scaling.widthFor(1L, 0))
  }
}
