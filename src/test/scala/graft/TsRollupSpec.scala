package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics fixtures for the irregular-sampling / downsampling rollups:
  * time-weighted average (trapezoid), M4 min/max/first/last windows and
  * the per-signal ACF — each on a hand-built series with a closed-form
  * expected answer.
  */
class TsRollupSpec extends AnyFunSuite with SparkTest {

  private def frame(rows: Seq[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (sig, t, v) => (sig, Timestamp.valueOf(t), v) }
      .toDF("signal_id", "ts", "value")
      .withColumn("value_q", graft.functions.Quantize.quantize(col("value"), 2))
      .withColumn("seq_no", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("signal_id")).orderBy(col("ts"))).cast("long"))
  }

  test("ts_twa integrates the trapezoid exactly on an uneven grid") {
    // 1.0 for 10s rising to 3.0, then 3.0 rising to 5.0 over 20s:
    // integral = (100+300)*10e6 + (300+500)*20e6 = 2e10 q·us over 30e6 us
    // -> twa = 2e10 / (200 * 3e7) = 3.333333
    val rs = frame(Seq(
      (1L, "2024-03-05 00:00:00", 1.0),
      (1L, "2024-03-05 00:00:10", 3.0),
      (1L, "2024-03-05 00:00:30", 5.0)))
    val out = graft.operators.TsQueries.twaOf(rs).collect()
    assert(out.length == 1)
    val row = out(0)
    assert(row.getLong(2) == 2L) // two intervals
    assert(math.abs(row.getDouble(3) - 3.333333) < 1e-9)
  }

  test("ts_twa splits by the left endpoint's day and drops zero-span days") {
    // last reading of day 1 bridges into day 2: its interval belongs to
    // day 1; day 2's single reading has no successor -> no day-2 row
    val rs = frame(Seq(
      (2L, "2024-03-05 23:59:50", 2.0),
      (2L, "2024-03-06 00:00:10", 4.0)))
    val out = graft.operators.TsQueries.twaOf(rs).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == Timestamp.valueOf("2024-03-05 00:00:00").getTime / 1000)
    // (200+400)*20e6 / (200 * 20e6) = 3.0
    assert(math.abs(out(0).getDouble(3) - 3.0) < 1e-9)
  }

  test("ts_m4 keeps first/last/min/max and the lowest attaining positions") {
    // 16 rows: baseline 10.0, min 1.0 planted at seq 5 AND 9 (tie -> 5),
    // max 99.0 at seq 12; first=10.0, last=7.0
    val vals = (1 to 16).map {
      case 5 | 9 => 1.0
      case 12    => 99.0
      case 16    => 7.0
      case _     => 10.0
    }
    val rs = frame(vals.zipWithIndex.map { case (v, i) =>
      (3L, f"2024-01-01 00:00:${i}%02d", v)
    })
    val out = graft.operators.TsQueries.m4Of(rs).collect()
    assert(out.length == 1)
    val row = out(0)
    assert(row.getAs[Double]("first_v") == 10.0)
    assert(row.getAs[Double]("last_v") == 7.0)
    assert(row.getAs[Long]("vmin_q") == 100L)
    assert(row.getAs[Long]("vmax_q") == 9900L)
    assert(row.getAs[Long]("min_seq") == 5L)
    assert(row.getAs[Long]("max_seq") == 12L)
    assert(row.getAs[Long]("cnt") == 16L)
  }

  test("ts_acf matches the closed form on an alternating series") {
    // alternating 0.01 / 0.03 (q = 1, 3), n = 8: deviations alternate
    // ∓1 around the mean -> acf_1 = -(n-1)/n = -0.875, acf_2 = (n-2)/n
    val rs = frame((0 until 8).map { i =>
      (4L, f"2024-01-01 00:00:${i}%02d", if (i % 2 == 0) 0.01 else 0.03)
    })
    val row = graft.operators.TsQueries.acfOf(rs).collect()(0)
    assert(row.getAs[Long]("n") == 8L)
    assert(math.abs(row.getAs[Double]("acf_1") - (-0.875)) < 1e-9)
    assert(math.abs(row.getAs[Double]("acf_2") - 0.75) < 1e-9)
    assert(math.abs(row.getAs[Double]("acf_3") - (-0.625)) < 1e-9)
  }

  test("ts_bollinger collapses to the level on a constant series") {
    // constant 4.5 (q = 450): sd is exactly 0, all three bands equal the
    // level; only rows with a full 8-row history survive (seq 8..10)
    val rs = frame((0 until 10).map { i =>
      (6L, f"2024-01-01 00:00:${i}%02d", 4.5)
    })
    val out = graft.operators.TsQueries.bollingerOf(rs).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Double]("mid") == 4.5)
      assert(r.getAs[Double]("upper") == 4.5)
      assert(r.getAs[Double]("lower") == 4.5)
    }
  }

  test("weekly OHLC rolled up from daily equals weekly computed from raw") {
    // the hierarchical-rollup property: candles fold losslessly — the
    // weekly candle derived from the daily TIER must equal the weekly
    // candle computed straight from the raw readings
    val d = "/root/testdata/sf0.001"
    val fromDaily = graft.operators.TsQueries.queries("ts_ohlc_weekly")(spark, d)
    val rr = graft.operators.Readings.of(spark, d)
    val fromRaw = rr
      .withColumn("week_s",
        (floor(unix_timestamp(date_trunc("day", col("ts"))) / 604800.0) * 604800)
          .cast("long"))
      .groupBy(col("signal_id"), col("week_s"))
      .agg(min_by(col("value"), col("seq_no")).as("open_v"),
        max(col("value")).as("high_v"), min(col("value")).as("low_v"),
        max_by(col("value"), col("seq_no")).as("close_v"),
        count(lit(1)).as("cnt"))
    assert(fromDaily.exceptAll(fromRaw).count() == 0)
    assert(fromRaw.exceptAll(fromDaily).count() == 0)
  }

  test("ts_acf is null on a constant signal (zero variance)") {
    val rs = frame((0 until 6).map { i =>
      (5L, f"2024-01-01 00:00:${i}%02d", 2.0)
    })
    val row = graft.operators.TsQueries.acfOf(rs).collect()(0)
    assert(row.isNullAt(row.fieldIndex("acf_1")))
  }
}
