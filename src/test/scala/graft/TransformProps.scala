package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.{TextOps, TierTransforms => T}

/** ScalaCheck property suite for the pure transform kernels — the
  * property-based layer the reference wires up but barely uses (SURVEY §5:
  * "quickcheck is wired but aspirational"). Runs as native ScalaCheck
  * Properties under sbt's test-interface (no scalatest bridge needed).
  */
object TransformProps extends Properties("graft.transforms") {

  private val series: Gen[Array[Double]] =
    Gen.chooseNum(4, 96).flatMap(n =>
      Gen.containerOfN[Array, Double](n, Gen.chooseNum(-1e3, 1e3)))

  private val window: Gen[Int] = Gen.choose(1, 8)

  property("paa: reconstruction error bounded by each chunk's spread") =
    forAll(series, window) { (xs, w) =>
      val rec = T.paaReconstruct(T.paa(xs, w), w, xs.length)
      xs.grouped(w).zipWithIndex.forall { case (chunk, ci) =>
        val spread = chunk.max - chunk.min
        chunk.indices.forall { j =>
          math.abs(rec(ci * w + j) - chunk(j)) <= spread + 1e-9
        }
      }
    }

  property("paa: chunk-weighted mean preserves the series sum") =
    forAll(series, window) { (xs, w) =>
      val means = T.paa(xs, w)
      val counts = xs.grouped(w).map(_.length).toArray
      val total = means.zip(counts).map { case (m, c) => m * c }.sum
      math.abs(total - xs.sum) <= 1e-6 * math.max(1.0, math.abs(xs.sum))
    }

  property("fftTruncate: keeping every coefficient is the identity") =
    forAll(series) { xs =>
      val keep = xs.length / 2 + 1
      T.maxAbsError(T.fftTruncate(xs, keep), xs) <= 1e-7
    }

  property("lttb: endpoints kept, indices strictly increasing, size exact") =
    forAll(series, Gen.choose(3, 20)) { (xs, th) =>
      val pts = T.lttb(xs, th)
      val expectedSize = math.min(th, xs.length)
      Prop.all(
        Prop(pts.head == ((0, xs.head))) :| "first point kept",
        Prop(pts.last == ((xs.length - 1, xs.last))) :| "last point kept",
        Prop(pts.length == expectedSize) :| s"size ${pts.length} != $expectedSize",
        Prop(pts.map(_._1).toSeq.sliding(2).forall {
          case Seq(a, b) => a < b
          case _ => true
        }) :| "indices strictly increasing")
    }

  property("lttb: reconstruction recovers every kept value (FP tolerance)") =
    forAll(series, Gen.choose(3, 20)) { (xs, th) =>
      // re-check the generator bounds: ScalaCheck's shrinker ignores them,
      // and a single-point series has no segments to reconstruct from.
      // Tolerance, not equality: the interpolation v0 + (v1-v0)*t lands an
      // ulp off v1 at t=1 — the SQL oracle mirrors the same formula, so
      // this is the operator's actual (and verified) semantics
      (xs.length < 2 || th < 3) || {
        val pts = T.lttb(xs, th)
        val rec = T.lttbReconstruct(pts, xs.length)
        pts.forall { case (i, v) =>
          math.abs(rec(i) - v) <= 1e-9 * math.max(1.0, math.abs(v))
        }
      }
    }

  property("rrdSample: exactly every k-th value, in order") =
    forAll(series, Gen.choose(1, 8)) { (xs, k) =>
      T.rrdSample(xs, k).toSeq == xs.indices.filter(_ % k == 0).map(xs).toSeq
    }

  property("sink: self-similarity is 1, symmetric in its arguments") =
    forAll(series.suchThat(_.exists(_ != 0.0))) { xs =>
      val self = T.sink(xs, xs, gamma = 1.0, keep = 4)
      val shifted = xs.map(_ + 1.0)
      val ab = T.sink(xs, shifted, 1.0, 4)
      val ba = T.sink(shifted, xs, 1.0, 4)
      math.abs(self - 1.0) <= 1e-9 && math.abs(ab - ba) <= 1e-9
    }

  property("fnv32: stays in the unsigned 32-bit range; injective-ish on nearby strings") =
    forAll(Gen.asciiPrintableStr) { s =>
      val h = TextOps.fnv32(s)
      h >= 0L && h < (1L << 32) && (s.isEmpty || TextOps.fnv32(s + "x") != h)
    }

  // Holt-Winters fold: the additive model's two defining symmetries.
  private val segment16: Gen[Seq[Double]] =
    Gen.containerOfN[Seq, Double](16, Gen.chooseNum(-1e3, 1e3))

  property("holt-winters: level-shift equivariance (forecast(x+c) = forecast(x)+c)") =
    forAll(segment16, Gen.chooseNum(-1e3, 1e3)) { (xs, c) =>
      val f0 = graft.operators.TsQueries.hwForecast(xs)
      val f1 = graft.operators.TsQueries.hwForecast(xs.map(_ + c))
      math.abs(f1 - (f0 + c)) <= 1e-6 * math.max(1.0, math.abs(f0) + math.abs(c))
    }

  property("holt-winters: scale equivariance (forecast(a*x) = a*forecast(x))") =
    forAll(segment16, Gen.chooseNum(-8.0, 8.0)) { (xs, a) =>
      val f0 = graft.operators.TsQueries.hwForecast(xs)
      val f1 = graft.operators.TsQueries.hwForecast(xs.map(_ * a))
      math.abs(f1 - a * f0) <= 1e-6 * math.max(1.0, math.abs(a * f0))
    }

  property("holt-winters: steady period-4 pattern forecasts its own next value") =
    forAll(Gen.containerOfN[Seq, Double](4, Gen.chooseNum(-1e3, 1e3))) { pat =>
      val xs = Seq.fill(4)(pat).flatten // 16 rows, exactly periodic
      val f = graft.operators.TsQueries.hwForecast(xs)
      // next value is pat(0): level/trend/seasonal are all at fixpoint
      math.abs(f - pat.head) <= 1e-6 * math.max(1.0, pat.map(math.abs).max)
    }

  // distinct-element long arrays: a small domain (forces overlap and the
  // zero-key out-of-band path) and the full 64-bit domain
  private val distinctLongs: Gen[Array[Long]] = for {
    n <- Gen.chooseNum(0, 60)
    dom <- Gen.oneOf(Gen.chooseNum(0L, 20L),
      Gen.chooseNum(Long.MinValue, Long.MaxValue))
    s <- Gen.containerOfN[Set, Long](n, dom)
  } yield s.toArray

  property("jaccardDistinct equals the set-algebra definition") =
    forAll(distinctLongs, distinctLongs) { (a, b) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val j = graft.functions.TextHash.jaccardDistinct(
        new GenericArrayData(a), new GenericArrayData(b))
      val sa = a.toSet
      val sb = b.toSet
      val expected =
        if (sa.isEmpty && sb.isEmpty) 1.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      j == expected
    }
}
