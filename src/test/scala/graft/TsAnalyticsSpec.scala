package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics fixtures for the round-8 analytics additions: CUSUM
  * changepoint, discord discovery and SAX words — each on a hand-built
  * series where the right answer is obvious.
  */
class TsAnalyticsSpec extends AnyFunSuite with SparkTest {

  private def readings(rows: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((sig, v), i) =>
      (sig, Timestamp.valueOf(f"2024-01-01 ${i / 3600}%02d:${(i / 60) % 60}%02d:${i % 60}%02d"), v)
    }.toDF("signal_id", "ts", "value")
      .withColumn("value_q", graft.functions.Quantize.quantize(col("value"), 2))
      .withColumn("seq_no", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("signal_id")).orderBy(col("ts"))).cast("long"))
  }

  test("CUSUM finds a level shift at the shift point") {
    // 10 readings at 1.0 then 10 at 5.0: |C_t| peaks exactly at t=10
    val rs = readings((1 to 10).map(_ => (7L, 1.0)) ++
      (1 to 10).map(_ => (7L, 5.0)))
    val row = changepointOf(rs).collect()(0)
    assert(row.getLong(1) == 10L, s"changepoint at ${row.getLong(1)}, want 10")
    // C_10 = 10*(1.0) - 10*(3.0) = -20 -> |C| = 20.0
    assert(math.abs(row.getDouble(2) - 20.0) < 1e-6)
  }

  private def changepointOf(rs: DataFrame) =
    graft.operators.TsQueries.queries("ts_changepoint")(spark, writeTmp(rs))

  // the registered queries read from a sf dir; give them one holding just
  // this fixture as the events table (same column mapping Readings.of uses)
  private def writeTmp(rs: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tsa").toString
    rs.select(col("signal_id").as("user_id"), col("ts"), col("value"),
        monotonically_increasing_id().as("event_id"),
        lit("e").as("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("discord discovery flags the planted anomalous segment") {
    // signal 3: three flat-ish segments + one wildly different one
    val flat = (0 until 16).map(i => 10.0 + (i % 2) * 0.5)
    val wild = (0 until 16).map(i => if (i % 2 == 0) -50.0 else 90.0)
    val rs = readings(
      (flat ++ flat ++ wild ++ flat).map(v => (3L, v)))
    val segs = graft.operators.Segments.completeQuantized(rs)
    import graft.functions.DtwFunctions.sqDistQ
    val a = segs.select(col("signal_id"), col("seg").as("seg_a"), col("qvals").as("qa"))
    val b = segs.select(col("signal_id"), col("seg").as("seg_b"), col("qvals").as("qb"))
    val nnd = a.join(b, Seq("signal_id")).where(col("seg_a") =!= col("seg_b"))
      .groupBy(col("signal_id"), col("seg_a"))
      .agg(min(sqDistQ(col("qa"), col("qb"))).as("nnd_q"))
      .orderBy(col("nnd_q").desc)
    val top = nnd.collect()(0)
    assert(top.getLong(1) == 2L, s"discord seg ${top.getLong(1)}, want 2")
  }

  test("motif discovery finds the planted repeating pair") {
    // segments: A, B, A' (A shifted by 0.01 -> distance 16), C — the
    // closest pair is (0, 2); B and C are far from everything
    val segA = (0 until 16).map(i => 10.0 + (i % 4) * 2.0)
    val segB = (0 until 16).map(i => 40.0 - (i % 3) * 5.0)
    val segA2 = segA.map(_ + 0.01)
    val segC = (0 until 16).map(i => -20.0 + i * 1.5)
    val rs = readings((segA ++ segB ++ segA2 ++ segC).map(v => (5L, v)))
    val out = graft.operators.TierQueries.queries("seg_motif")(spark, writeTmp(rs))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 2L,
      s"motif pair (${out(0).getLong(1)}, ${out(0).getLong(2)}), want (0, 2)")
    assert(out(0).getLong(3) == 16L) // 16 coords each off by exactly 1 q-unit
  }

  test("sqDistQ is the exact integer squared L2") {
    import graft.functions.Dtw
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array(0L, 3L, -2L))
    val b = new GenericArrayData(Array(4L, 0L, 1L))
    assert(Dtw.sqDistQ(a, b) == 16L + 9L + 9L)
    assert(Dtw.sqDistQ(a, a) == 0L)
  }

  test("SAX maps a two-level square wave to alternating extreme letters") {
    // chunks alternate far below / far above the mean -> letters a and d
    val lowHigh = (0 until 32).map(i => if ((i / 4) % 2 == 0) 0.0 else 100.0)
    val rs = readings(lowHigh.map(v => (9L, v)))
    val out = graft.operators.TierQueries.queries("tier_sax")(spark, writeTmp(rs))
      .orderBy(col("seg")).collect()
    assert(out.map(_.getString(2)).toSeq == Seq("adad", "adad"),
      s"words were ${out.map(_.getString(2)).toSeq}")
  }

  test("SAX drops zero-variance signals instead of dividing by zero") {
    val rs = readings((0 until 32).map(_ => (11L, 42.0)))
    val out = graft.operators.TierQueries.queries("tier_sax")(spark, writeTmp(rs))
    assert(out.count() == 0)
  }
}
