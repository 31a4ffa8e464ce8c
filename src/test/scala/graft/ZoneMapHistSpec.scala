package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Readings
import graft.plans.ZoneMap

/** The histogram "sketch" tier: percentiles served from persisted
  * value_q cell counts must equal percentile_cont over the dequantized
  * values, and the fold must be merge-exact (segment cells -> signal
  * cells, any grouping).
  */
class ZoneMapHistSpec extends AnyFunSuite with SparkTest {
  private lazy val r = Readings.of(spark, "/root/testdata/sf0.001").cache()

  test("sketch percentile equals exact percentile of dequantized values") {
    val fromSketch = ZoneMap.percentileFromHistogram(
        ZoneMap.segmentHistogram(r), Seq(0.5, 0.9), scale = 100.0)
      .collect().map(x => (x.getLong(0), x.getDouble(1)) -> x.getDouble(2)).toMap
    val exact = r.groupBy(col("signal_id"))
      .agg(expr("percentile(value_q / 100.0, 0.5)").as("p50"),
           expr("percentile(value_q / 100.0, 0.9)").as("p90"))
      .collect()
    assert(exact.nonEmpty)
    exact.foreach { row =>
      val sig = row.getLong(0)
      assert(math.abs(fromSketch((sig, 0.5)) - row.getDouble(1)) < 1e-6,
        s"p50 mismatch for signal $sig")
      assert(math.abs(fromSketch((sig, 0.9)) - row.getDouble(2)) < 1e-6,
        s"p90 mismatch for signal $sig")
    }
  }

  test("histogram fold is merge-exact across segment splits") {
    val whole = ZoneMap.foldHistogram(ZoneMap.segmentHistogram(r))
    val direct = r.groupBy(col("signal_id"), col("value_q"))
      .agg(count(lit(1)).as("cnt"))
    assert(whole.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(whole).count() === 0)
  }
}
