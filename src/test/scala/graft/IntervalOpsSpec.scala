package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IntervalOps

/** As-of and range join edge semantics. */
class IntervalOpsSpec extends AnyFunSuite with SparkTest {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: inclusive match, forward carry, null before first state") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), "e0"),  // before any state -> null
      (1L, ts("2024-01-01 00:10:00"), "e1"),  // exactly at s1 -> s1 (inclusive)
      (1L, ts("2024-01-01 00:15:00"), "e2"),  // between s1 and s2 -> s1
      (1L, ts("2024-01-01 00:30:00"), "e3"),  // after s2 -> s2
      (2L, ts("2024-01-01 00:30:00"), "e4")   // other key, no states -> null
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 00:10:00"), "s1"),
      (1L, ts("2024-01-01 00:20:00"), "s2")
    ).toDF("k", "rt", "state")
    val out = IntervalOps.asofJoin(left, right, "k", "t", "rt", Seq("state"))
      .select(col("ev"), col("state")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("e0" -> null, "e1" -> "s1", "e2" -> "s1",
      "e3" -> "s2", "e4" -> null))
  }

  test("asofJoinTolerance nulls matches older than the tolerance") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:10:00"), "e1"),  // 0s stale -> s1
      (1L, ts("2024-01-01 00:14:59"), "e2"),  // 299s -> s1 (within 300s)
      (1L, ts("2024-01-01 00:15:00"), "e3"),  // exactly 300s -> s1 (inclusive)
      (1L, ts("2024-01-01 00:15:01"), "e4"),  // 301s -> stale, null
      (1L, ts("2024-01-01 00:05:00"), "e5")   // before any state -> null
    ).toDF("k", "t", "ev")
    val right = Seq((1L, ts("2024-01-01 00:10:00"), "s1")).toDF("k", "rt", "state")
    val out = IntervalOps.asofJoinTolerance(
        left, right, "k", "t", "rt", Seq("state"), toleranceSec = 300L)
      .select(col("ev"), col("state")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("e1" -> "s1", "e2" -> "s1", "e3" -> "s1",
      "e4" -> null, "e5" -> null))
  }

  test("rangeJoinByBins: containment exact at boundaries, bins don't leak") {
    import spark.implicits._
    val pts = Seq((1L, 0.0), (2L, 49.999), (3L, 50.0), (4L, 100.0), (5L, -1.0))
      .toDF("id", "v")
    val ivals = Seq((10L, 0.0, 50.0), (20L, 50.0, 100.0), (30L, 25.0, 75.0))
      .toDF("ival", "lo", "hi")
    val out = IntervalOps.rangeJoinByBins(pts, "v", ivals, "lo", "hi", 20.0)
      .select(col("id"), col("ival")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0.0 in [0,50); 49.999 in [0,50)+[25,75); 50.0 in [50,100)+[25,75);
    // 100.0 and -1.0 match nothing (intervals are half-open [lo, hi))
    assert(out == Set(
      (1L, 10L),
      (2L, 10L), (2L, 30L),
      (3L, 20L), (3L, 30L)))
  }
}
