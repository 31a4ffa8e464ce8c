package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TierTransforms._

/** S4 — lossy transform properties, error-bound style (reference
  * compare_vectors tolerance, segment.rs:882-893).
  */
class TierTransformsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(11)

  test("paa of a constant signal is exact; means match chunk averages") {
    val const = Array.fill(16)(3.5)
    assert(paa(const, 4).toSeq == Seq.fill(4)(3.5))
    val xs = Array.tabulate(16)(_.toDouble)
    assert(paa(xs, 4).toSeq == Seq(1.5, 5.5, 9.5, 13.5))
    // reconstruction error bounded by max in-chunk deviation
    val ys = Array.fill(64)(rnd.nextDouble() * 10)
    val rec = paaReconstruct(paa(ys, 8), 8, 64)
    val bound = ys.grouped(8).map(c => c.max - c.min).max
    assert(maxAbsError(ys, rec) <= bound + 1e-9)
  }

  test("fftTruncate reproduces a low-frequency signal within tolerance") {
    val n = 64
    val smooth = Array.tabulate(n)(i =>
      math.sin(2 * math.Pi * i / n) + 0.5 * math.cos(2 * math.Pi * 2 * i / n))
    val rec = fftTruncate(smooth, keep = 4)
    assert(maxAbsError(smooth, rec) < 0.1, s"err=${maxAbsError(smooth, rec)}")
    // identity when keeping everything
    val recFull = fftTruncate(smooth, keep = n / 2 + 1)
    assert(maxAbsError(smooth, recFull) < 1e-9)
  }

  test("fftFeatures: DC coefficient is the sum; pure tone lands in its bin") {
    val n = 16
    val const = Array.fill(n)(3.0)
    val fc = fftFeatures(const, keep = 4)
    assert(fc.length == 8)
    assert(math.abs(fc(0) - 3.0 * n) < 1e-9)         // Re X_0 = sum
    assert(fc.drop(1).forall(v => math.abs(v) < 1e-9))
    // cos(2*pi*k0*i/n) has Re X_{k0} = n/2, everything else (kept) ~ 0
    val tone = Array.tabulate(n)(i => math.cos(2 * math.Pi * 2 * i / n))
    val ft = fftFeatures(tone, keep = 4)
    assert(math.abs(ft(4) - n / 2.0) < 1e-9, s"ReX_2=${ft(4)}")
    assert(ft.zipWithIndex.filter(_._2 != 4).forall(v => math.abs(v._1) < 1e-9))
  }

  test("lttb keeps endpoints, returns requested count, exact on linear data") {
    val lin = Array.tabulate(100)(i => 2.0 * i + 1)
    val pts = lttb(lin, 10)
    assert(pts.length == 10)
    assert(pts.head == ((0, 1.0)) && pts.last == ((99, 199.0)))
    val rec = lttbReconstruct(pts, 100)
    assert(maxAbsError(lin, rec) < 1e-9)
  }

  test("rrdSample keeps every k-th value") {
    val xs = Array.tabulate(20)(_.toDouble)
    assert(rrdSample(xs, 4).toSeq == Seq(0.0, 4.0, 8.0, 12.0, 16.0))
  }
}
