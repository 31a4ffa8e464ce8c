package graft.functions

import breeze.linalg.DenseVector
import breeze.math.Complex
import breeze.signal.{fourierTr, iFourierTr}

/** Lossy compaction transforms for the tier ladder — the Spark equivalents
  * of the reference's recoding codecs (PAA database/src/segment.rs:516,
  * Fourier-truncate segment.rs:699, LTTB/PLA compress/pla_lttb.rs:24,
  * RRD-sample compress/rrd_sample.rs:15). Pure Array[Double] functions:
  * used from compaction jobs via typed Dataset ops / UDFs (compaction is a
  * rewrite job, not a per-query hot path) and property-tested for error
  * bounds in TierSpec.
  */
object TierTransforms {

  /** Piecewise aggregate approximation: mean of each chunk of `w` values. */
  def paa(xs: Array[Double], w: Int): Array[Double] =
    xs.grouped(w).map(c => c.sum / c.length).toArray

  /** Reconstruct a PAA array back to original length (repeat means). */
  def paaReconstruct(means: Array[Double], w: Int, n: Int): Array[Double] =
    Array.tabulate(n)(i => means(i / w))

  /** FFT low-pass: keep the `keep` lowest-frequency coefficient pairs
    * (hermitian-symmetric), zero the rest, inverse-transform.
    */
  def fftTruncate(xs: Array[Double], keep: Int): Array[Double] = {
    val n = xs.length
    val spec: DenseVector[Complex] = fourierTr(DenseVector(xs))
    val kept = DenseVector.tabulate[Complex](n) { i =>
      if (i < keep || i > n - keep) spec(i) else Complex(0.0, 0.0)
    }
    iFourierTr(kept).map(_.real).toArray
  }

  /** Truncated-spectrum feature vector: the first `keep` DFT coefficients
    * as interleaved [Re X_0, Im X_0, ..., Re X_{keep-1}, Im X_{keep-1}] —
    * the Fourier-reduced representation for reduced-input 1-NN (the
    * reference's knn harness FFT flavor, knn/mod.rs:85-308). Hermitian
    * symmetry of real input means the low half of the spectrum carries all
    * the kept information, so Euclidean distance over these 2*keep numbers
    * is the standard spectral-domain proxy for the n-point distance.
    */
  def fftFeatures(xs: Array[Double], keep: Int): Array[Double] = {
    val spec: DenseVector[Complex] = fourierTr(DenseVector(xs))
    val out = new Array[Double](2 * keep)
    var k = 0
    while (k < keep) {
      out(2 * k) = spec(k).real
      out(2 * k + 1) = spec(k).imag
      k += 1
    }
    out
  }

  /** Largest-Triangle-Three-Buckets downsampling to `threshold` points
    * (Steinarsson 2013, public algorithm). Returns (index, value) pairs;
    * first and last points always kept.
    */
  def lttb(xs: Array[Double], threshold: Int): Array[(Int, Double)] = {
    val n = xs.length
    if (threshold >= n || threshold < 3) return xs.zipWithIndex.map(_.swap)
    val bucketSize = (n - 2).toDouble / (threshold - 2)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Double)]((0, xs(0)))
    var a = 0
    for (i <- 0 until threshold - 2) {
      val rangeStart = math.floor((i + 1) * bucketSize).toInt + 1
      val rangeEnd = math.min(math.floor((i + 2) * bucketSize).toInt + 1, n)
      val avgX = (rangeStart until rangeEnd).map(_.toDouble).sum / math.max(1, rangeEnd - rangeStart)
      val avgY = (rangeStart until rangeEnd).map(xs).sum / math.max(1, rangeEnd - rangeStart)
      val bStart = math.floor(i * bucketSize).toInt + 1
      val bEnd = math.min(math.floor((i + 1) * bucketSize).toInt + 1, n)
      var best = bStart; var bestArea = -1.0
      for (j <- bStart until bEnd) {
        val area = math.abs(
          (a - avgX) * (xs(j) - xs(a)) - (a - j) * (avgY - xs(a))) * 0.5
        if (area > bestArea) { bestArea = area; best = j }
      }
      out += ((best, xs(best)))
      a = best
    }
    out += ((n - 1, xs(n - 1)))
    out.toArray
  }

  /** Linear interpolation reconstruction from LTTB keypoints. */
  def lttbReconstruct(pts: Array[(Int, Double)], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    for (Array((i0, v0), (i1, v1)) <- pts.sliding(2).map(_.toArray)) {
      for (i <- i0 to i1) {
        out(i) = if (i1 == i0) v0 else v0 + (v1 - v0) * (i - i0).toDouble / (i1 - i0)
      }
    }
    out
  }

  /** Compressed normalized cross-correlation sequence (the reference's
    * nccc_compressed, database/src/kernel.rs:353): FFT both series at
    * length 2^ceil(log2(2n-1)), keep only the `keep` leading coefficient
    * pairs (kernel.rs:428 leading_fft zeroes indices in [keep, size-keep)),
    * multiply X * conj(D), inverse-transform, keep the 2n-1 circular
    * shifts ([0,n) head + (n-1) tail), and normalize by ||x||*||d||.
    */
  def ncccCompressed(x: Array[Double], d: Array[Double], keep: Int): Array[Double] = {
    val n = math.max(x.length, d.length)
    var size = 1
    while (size < 2 * n - 1) size <<= 1
    def spec(a: Array[Double]): DenseVector[Complex] = {
      val padded = DenseVector.tabulate[Complex](size)(i =>
        if (i < a.length) Complex(a(i), 0.0) else Complex.zero)
      val s = fourierTr(padded)
      DenseVector.tabulate[Complex](size)(i =>
        if (i < keep || i >= size - keep) s(i) else Complex.zero)
    }
    val fx = spec(x)
    val fd = spec(d)
    val mul = DenseVector.tabulate[Complex](size)(i => fx(i) * fd(i).conjugate)
    val cc = iFourierTr(mul).map(_.real) // breeze inverse includes the 1/size scale
    val shifts = (0 until n).map(cc(_)) ++ (size - (n - 1) until size).map(cc(_))
    val norm = math.sqrt(x.map(v => v * v).sum) * math.sqrt(d.map(v => v * v).sum)
    shifts.map(_ / norm).toArray
  }

  /** sum_k exp(gamma * ncc_k) over all shifts (kernel.rs:344). */
  def sumExpNcc(x: Array[Double], d: Array[Double], gamma: Double, keep: Int): Double =
    ncccCompressed(x, d, keep).map(v => math.exp(gamma * v)).sum

  /** SINK shift-invariant kernel similarity (kernel.rs:326 sinkcompressed):
    * sumExp(x,d) / sqrt(sumExp(x,x) * sumExp(d,d)); 1.0 at x == d.
    */
  def sink(x: Array[Double], d: Array[Double], gamma: Double, keep: Int): Double =
    sumExpNcc(x, d, gamma, keep) /
      math.sqrt(sumExpNcc(x, x, gamma, keep) * sumExpNcc(d, d, gamma, keep))

  /** RRDtool-style round-robin sampling: keep every k-th value. */
  def rrdSample(xs: Array[Double], k: Int): Array[Double] =
    xs.indices.collect { case i if i % k == 0 => xs(i) }.toArray

  def maxAbsError(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.foldLeft(0.0)(math.max)
}
