package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Readings
import graft.sources.BucketedStore

/** Co-located joins: bucketed tables must join and aggregate without a
  * shuffle exchange.
  */
class BucketedStoreSpec extends AnyFunSuite with SparkTest {

  private lazy val prepared: Unit = {
    val r = Readings.of(spark, "/root/testdata/sf0.001")
    BucketedStore.writeBucketed(
      r.select(col("signal_id"), col("seq_no"), col("value")),
      "readings_b", "signal_id", buckets = 8, sortCols = Seq("seq_no"))
    BucketedStore.writeBucketed(
      r.groupBy(col("signal_id")).agg(max(col("value")).as("sig_max")),
      "sigstats_b", "signal_id", buckets = 8)
  }

  // on testdata-sized inputs the planner prefers broadcast over the
  // bucketed SMJ; disable auto-broadcast so the co-location is exercised
  // (at 100 TB neither side broadcasts — this IS the production path)
  private def withoutAutoBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed fact-fact join plans with no shuffle Exchange") {
    prepared
    withoutAutoBroadcast {
      val j = BucketedStore.colocatedJoin(spark, "readings_b", "sigstats_b", "signal_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      // and it is correct
      val n = j.filter(col("value") === col("sig_max")).count()
      assert(n >= spark.table("sigstats_b").count()) // at least one max row per signal
    }
  }

  test("bucketed aggregation on the bucket key plans with no shuffle Exchange") {
    prepared
    withoutAutoBroadcast {
      val a = BucketedStore.colocatedAgg(spark, "readings_b", "signal_id")
      val plan = a.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(a.count() == spark.table("sigstats_b").count())
    }
  }
}
