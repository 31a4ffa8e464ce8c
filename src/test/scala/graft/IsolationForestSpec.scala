package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextOps
import graft.ml.IsolationForest

/** The distributed isolation forest against an independent sequential
  * reimplementation of the same derandomized algorithm — plus the
  * quality property that makes it an outlier detector at all (a planted
  * extreme point isolates early) and the plan shape that makes it a
  * 100 TB operator (map-only traversal via broadcast node tables).
  */
class IsolationForestSpec extends AnyFunSuite with SparkTest {

  private val Trees = 8
  private val Depth = 6
  // smaller than every fixture so the hash-rank top-ψ selection is real
  private val Psi = 32

  /** Sequential reference: same hash choices, plain recursive descent. */
  private def bruteScores(pts: Seq[(Long, Long, Array[Double])])
    : Map[(Long, Long), (Double, Double, Double)] = {
    def c(n: Long): Double =
      if (n > 2) 2.0 * (math.log(n - 1.0) + IsolationForest.Gamma) - 2.0 * (n - 1.0) / n
      else if (n == 2) 1.0 else 0.0
    val d = pts.head._3.length

    // (depth, pathLen) of one point in one tree, grown over the subsample
    def descend(tree: Int, node: Seq[Array[Double]], x: Array[Double],
                path: Long, level: Int): (Int, Double) = {
      val ns = node.size
      if (level == Depth) return (Depth, Depth + c(ns))
      if (ns <= 1) return (level, level + c(ns))
      val hf = (TextOps.fnv32(s"if:$tree:$path") % d).toInt
      val mn = node.map(_(hf)).min
      val mx = node.map(_(hf)).max
      if (mx == mn) return (level, level + c(ns))
      val frac = TextOps.fnv32(s"iv:$tree:$path").toDouble / 4294967296.0
      val split = mn + frac * (mx - mn)
      val goLeft = x(hf) < split
      val sub = node.filter(v => (v(hf) < split) == goLeft)
      descend(tree, sub, x, path * 2 + (if (goLeft) 0 else 1), level + 1)
    }

    val byTree = (0 until Trees).map { t =>
      // fixed-ψ hash-rank subsample: ψ smallest fnv32("is:t:id"), ties
      // broken by the id string — the selection fit() distributes
      val sub = pts.sortBy { case (a, b, _) =>
        (TextOps.fnv32(s"is:$t:$a:$b"), s"$a:$b") }.take(Psi).map(_._3)
      t -> sub
    }.toMap
    val cbar = (0 until Trees).map(t => c(byTree(t).size)).sum / Trees

    pts.map { case (a, b, x) =>
      val walks = (0 until Trees).map(t => descend(t, byTree(t), x, 1L, 0))
      val avgDepth = walks.map(_._1).sum.toDouble / Trees
      // ascending-tree left fold, as the engine sums
      val avgPath = walks.map(_._2).foldLeft(0.0)(_ + _) / Trees
      (a, b) -> (avgDepth,
        math.rint(avgPath * 1e6) / 1e6,
        math.rint(math.pow(2.0, -avgPath / cbar) * 1e6) / 1e6)
    }.toMap
  }

  private def fixture(n: Int): Seq[(Long, Long, Array[Double])] = {
    // deterministic scatter via the same public-domain mixer the engine
    // trusts, plus one planted far-out point per signal
    def u(k: String): Double = TextOps.fnv32(k).toDouble / 4294967296.0
    val base = for (s <- 0L until 3L; g <- 0L until n) yield
      (s, g, Array.tabulate(4)(j => 10.0 * u(s"p:$s:$g:$j")))
    base :+ ((3L, 0L, Array(500.0, -500.0, 500.0, -500.0)))
  }

  private def run(pts: Seq[(Long, Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    val df = pts.map { case (a, b, f) => (a, b, f(0), f(1), f(2), f(3)) }
      .toDF("signal_id", "seg", "f0", "f1", "f2", "f3")
    IsolationForest.scores(df, Seq("signal_id", "seg"),
      Seq("f0", "f1", "f2", "f3"), Trees, Depth, Psi)
  }

  test("distributed forest equals the sequential reference implementation") {
    val pts = fixture(40)
    val got = run(pts).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val want = bruteScores(pts)
    assert(got.keySet === want.keySet)
    for ((k, (gd, gp, gs)) <- got) {
      val (wd, wp, ws) = want(k)
      assert(gd === wd, s"avg_depth at $k")
      assert(math.abs(gp - wp) <= 2e-6, s"avg_path at $k: $gp vs $wp")
      assert(math.abs(gs - ws) <= 2e-6, s"score at $k: $gs vs $ws")
    }
  }

  test("a planted extreme point gets the highest anomaly score") {
    val rows = run(fixture(40)).orderBy(col("score").desc).collect()
    assert(rows.head.getLong(0) === 3L && rows.head.getLong(1) === 0L)
    // and it isolates fast — strictly shallower than the average inlier
    val planted = rows.head.getDouble(2)
    val rest = rows.tail.map(_.getDouble(2))
    assert(planted < rest.sum / rest.length)
  }

  test("forest is deterministic across runs") {
    val a = run(fixture(25)).collect().map(_.toSeq).sortBy(_.toString)
    val b = run(fixture(25)).collect().map(_.toSeq).sortBy(_.toString)
    assert(a === b)
  }

  test("frozen model traversal equals the distributed scores, with and without a fit filter") {
    import spark.implicits._
    val pts = fixture(40)
    val df = pts.map { case (a, b, f) => (a, b, f(0), f(1), f(2), f(3)) }
      .toDF("signal_id", "seg", "f0", "f1", "f2", "f3")
    for (ff <- Seq(lit(true), col("signal_id") % 2 === 0)) {
      val dist = IsolationForest.scores(df, Seq("signal_id", "seg"),
        Seq("f0", "f1", "f2", "f3"), Trees, Depth, Psi, fitFilter = ff)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      val model = IsolationForest.fit(df, Seq("signal_id", "seg"),
        Seq("f0", "f1", "f2", "f3"), Trees, Depth, Psi, fitFilter = ff)
      for ((a, b, f) <- pts) {
        assert(model.score(f) === dist((a, b)), s"point ($a,$b)")
      }
    }
  }

  test("adversarial shapes still match the sequential reference: dups, constants, tiny n") {
    import spark.implicits._
    def u(k: String): Double = TextOps.fnv32(k).toDouble / 4294967296.0
    val shapes: Seq[Seq[(Long, Long, Array[Double])]] = Seq(
      // every point identical (all splits degenerate at the root)
      (0L until 12L).map(i => (0L, i, Array(1.0, 1.0, 1.0, 1.0))),
      // one constant feature + duplicated pairs
      (0L until 20L).map(i =>
        (i % 3, i / 3, Array(5.0, u(s"d:${i / 2}"), u(s"e:${i / 2}"), 0.0))),
      // n = 1 and n = 2
      Seq((0L, 0L, Array(1.0, 2.0, 3.0, 4.0))),
      Seq((0L, 0L, Array(1.0, 2.0, 3.0, 4.0)),
        (0L, 1L, Array(4.0, 3.0, 2.0, 1.0))),
      // heavy ties on the split feature (integer-valued)
      (0L until 25L).map(i => (1L, i, Array((i % 5).toDouble,
        (i % 3).toDouble, (i % 2).toDouble, (i % 7).toDouble))))
    for ((pts, i) <- shapes.zipWithIndex) {
      val got = run(pts).collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      val want = bruteScores(pts)
      assert(got.keySet === want.keySet, s"shape $i keys")
      def close(a: Double, b: Double) =
        (a.isNaN && b.isNaN) || math.abs(a - b) <= 2e-6
      for ((k, (gd, gp, gs)) <- got) {
        val (wd, wp, ws) = want(k)
        assert(gd === wd && close(gp, wp) && close(gs, ws),
          s"shape $i at $k: $got vs $want")
      }
    }
  }

  test("a saved model loads back equal and scores identically") {
    import spark.implicits._
    val pts = fixture(30)
    val df = pts.map { case (a, b, f) => (a, b, f(0), f(1), f(2), f(3)) }
      .toDF("signal_id", "seg", "f0", "f1", "f2", "f3")
    val model = IsolationForest.fit(df, Seq("signal_id", "seg"),
      Seq("f0", "f1", "f2", "f3"), Trees, Depth, Psi)
    val path = java.nio.file.Files.createTempDirectory("iforest-rt").toString
    IsolationForest.save(spark, model, path)
    val loaded = IsolationForest.load(spark, path)
    assert(loaded === model) // Maps + doubles: bit-exact round trip
    for ((_, _, f) <- pts) assert(loaded.score(f) === model.score(f))
  }

  test("lossy-agreement row is well-formed and consistent") {
    val r = SparkEntry.queries("ml_iforest_lossy_agree")(
      spark, "/root/testdata/sf0.001").collect()
    assert(r.length === 1)
    val (k, ov, frac) = (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2))
    assert(k === 20L && ov >= 0L && ov <= k)
    assert(frac === ov.toDouble / k)
  }

  test("scoring is one map-only pass: no join, no exchange in the plan") {
    // the forest fits on the subsample (bounded model, eager); the
    // RETURNED plan — what runs over the full 100 TB of points — must be
    // a pure projection: no join, no shuffle, no aggregation
    val plan = run(fixture(40)).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "scoring must not join")
    assert(!plan.contains("Exchange"), "scoring must not shuffle")
    assert(!plan.contains("Aggregate"), "scoring must not aggregate")
  }
}
