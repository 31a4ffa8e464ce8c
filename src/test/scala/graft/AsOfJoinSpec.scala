package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IntervalOps
import graft.plans.{AsOfJoinExec, NativeAsOf}

/** Native as-of join (custom LogicalPlan + Strategy + SparkPlan) — must
  * agree exactly with the composed union+window form on every edge case,
  * and must actually plan through [[AsOfJoinExec]].
  */
class AsOfJoinSpec extends AnyFunSuite with SparkTest
    with AdaptiveSparkPlanHelper {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture = {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), "e0"),  // before any state -> null
      (1L, ts("2024-01-01 00:10:00"), "e1"),  // exactly at s1 -> s1 (inclusive)
      (1L, ts("2024-01-01 00:15:00"), "e2"),  // between s1 and s2 -> s1
      (1L, ts("2024-01-01 00:30:00"), "e3"),  // after s2 -> s2
      (2L, ts("2024-01-01 00:30:00"), "e4"),  // other key, no states -> null
      (3L, ts("2024-01-01 00:05:00"), "e5")   // key with one exact state
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 00:10:00"), "s1"),
      (1L, ts("2024-01-01 00:20:00"), "s2"),
      (3L, ts("2024-01-01 00:05:00"), "s3"),
      (4L, ts("2024-01-01 00:00:00"), "s4")   // key absent on the left
    ).toDF("k", "rt", "state")
    (left, right)
  }

  test("native as-of join matches the composed union+window form") {
    val (left, right) = fixture
    val native = NativeAsOf.asofJoin(left, right, "k", "t", "rt", Seq("state"))
      .select(col("ev"), col("state")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val composed = IntervalOps.asofJoin(left, right, "k", "t", "rt", Seq("state"))
      .select(col("ev"), col("state")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(native == Map("e0" -> null, "e1" -> "s1", "e2" -> "s1",
      "e3" -> "s2", "e4" -> null, "e5" -> "s3"))
    assert(native == composed)
  }

  test("tolerance variant drops stale matches, agrees with the composed form") {
    val (left, right) = fixture
    // 5-minute tolerance: e1 (exact, 0s) and e5 keep their match; e2 is
    // 5min after s1 (== tolerance, inclusive) keeps; e3 is 10min after s2?
    // no — e3 (00:30) matches s2 (00:20), 10min stale -> dropped
    val native = NativeAsOf.asofJoinTolerance(
        left, right, "k", "t", "rt", Seq("state"), toleranceSec = 300L)
      .select(col("ev"), col("state")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(native == Map("e0" -> null, "e1" -> "s1", "e2" -> "s1",
      "e3" -> null, "e4" -> null, "e5" -> "s3"))
    val composed = IntervalOps.asofJoinTolerance(
        left, right, "k", "t", "rt", Seq("state"), toleranceSec = 300L)
      .select(col("ev"), col("state")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(native == composed)
    // non-timestamp time columns are rejected loudly
    import spark.implicits._
    val badL = Seq((1L, 10L, "x")).toDF("k", "t", "ev")
    val badR = Seq((1L, 5L, "s")).toDF("k", "rt", "state")
    val err = intercept[IllegalArgumentException] {
      NativeAsOf.asofJoinTolerance(badL, badR, "k", "t", "rt",
        Seq("state"), toleranceSec = 1L)
    }
    assert(err.getMessage.contains("TimestampType"))
  }

  test("self-join safe: right side derived from the left plan") {
    import spark.implicits._
    val readings = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (1L, 2L, ts("2024-01-01 00:01:00")),
      (1L, 3L, ts("2024-01-01 00:02:00")),
      (2L, 1L, ts("2024-01-01 00:00:30"))
    ).toDF("signal_id", "seq_no", "t")
    // seg starts derived FROM the same DataFrame -> shared exprIds unless
    // NativeAsOf re-aliases the right side
    val segStarts = readings
      .groupBy(col("signal_id"), (col("seq_no") > 1).cast("long").as("seg"))
      .agg(min(col("t")).as("seg_t"))
    val out = NativeAsOf.asofJoin(
        readings, segStarts, "signal_id", "t", "seg_t", Seq("seg"))
      .select(col("signal_id"), col("seq_no"), col("seg")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 1L) -> 0L, (1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (2L, 1L) -> 0L))
  }

  test("plans through AsOfJoinExec with keyed distribution on both sides") {
    val (left, right) = fixture
    val df = NativeAsOf.asofJoin(left, right, "k", "t", "rt", Seq("state"))
    df.collect()
    val execs = collect(df.queryExecution.executedPlan) {
      case e: AsOfJoinExec => e
    }
    assert(execs.size == 1, "expected exactly one AsOfJoinExec in the plan")
    // EnsureRequirements must have satisfied the clustered distribution:
    // both children sorted by (key, time) within partitions
    val e = execs.head
    assert(e.left.outputOrdering.nonEmpty && e.right.outputOrdering.nonEmpty)
  }

  test("as-of over bucketed+sorted tiers plans with no exchange and no sort") {
    // the production read path: both sides persisted bucketed by the key
    // and sorted by (key, time) with one file per bucket — the scan then
    // reports hash partitioning AND the sort order, so the as-of operator's
    // required distribution/ordering are satisfied for free and the whole
    // join is a pure streaming merge over the scans
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val r = graft.operators.Readings.of(spark, "/root/testdata/sf0.001")
    graft.sources.BucketedStore.writeBucketed(
      r.select(col("signal_id"), col("ts"), col("value")),
      "asof_left_b", "signal_id", buckets = 8, sortCols = Seq("signal_id", "ts"))
    val markers = r.filter(col("seq_no") % 16 === 1)
      .select(col("signal_id"), col("ts").as("mts"),
        graft.operators.Readings.segmentId(col("seq_no")).as("seg"))
    graft.sources.BucketedStore.writeBucketed(
      markers, "asof_right_b", "signal_id", buckets = 8,
      sortCols = Seq("signal_id", "mts"))
    // since Spark 3.0 a bucketed scan hides its sort order unless this
    // (functional, default-off since SPARK-28595) conf is on; the
    // one-file-per-bucket layout writeBucketed guarantees is exactly the
    // condition under which it is sound
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val j = NativeAsOf.asofJoin(
        spark.table("asof_left_b"), spark.table("asof_right_b"),
        "signal_id", "ts", "mts", Seq("seg"))
      val plan = j.queryExecution.executedPlan
      assert(collect(plan) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"as-of over bucketed tiers still shuffles:\n$plan")
      assert(collect(plan) { case s: SortExec => s }.isEmpty,
        s"as-of over bucketed+sorted tiers still sorts:\n$plan")
      // and it is correct: every reading at-or-after its segment's first
      // row picks up that segment marker
      val rows = j.filter(col("seg").isNotNull).count()
      assert(rows == j.count(), "every reading has a preceding segment marker")
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS asof_left_b")
      spark.sql("DROP TABLE IF EXISTS asof_right_b")
    }
  }

  test("duplicate right timestamps: last right row at equal (key, time) wins") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e")).toDF("k", "t", "ev")
    // two states at the same instant: the merge consumes both in input
    // order; the composed form's last(ignoreNulls) has the same semantics
    val right = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "rt", "state")
    val native = NativeAsOf.asofJoin(left, right, "k", "t", "rt", Seq("state"))
      .select(col("state")).collect().map(_.getString(0)).toSeq
    assert(native == Seq("b") || native == Seq("a")) // tie order not defined
    assert(native.size == 1)
  }
}
