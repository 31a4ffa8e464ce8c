package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Quantize

/** E1/E2 — fixed-point quantization properties (reference
  * prec_double.rs roundtrip semantics). Property-style with a fixed seed
  * (scalatestplus bridge unavailable offline).
  */
class QuantizeSpec extends AnyFunSuite with SparkTest {

  private def runQ(vals: Seq[Double], scale: Int): Seq[(Double, Long, Double)] = {
    import spark.implicits._
    vals.toDF("v")
      .select(col("v"), Quantize.quantize(col("v"), scale).as("q"))
      .withColumn("dq", Quantize.dequantize(col("q"), scale))
      .as[(Double, Long, Double)].collect().toSeq
  }

  test("quantize/dequantize roundtrip error is bounded by 10^-scale") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(200)(rnd.nextDouble() * 2000.0 - 1000.0)
    runQ(vs, 2).foreach { case (v, _, dq) =>
      assert(math.abs(v - dq) <= 0.01 + 1e-12, s"v=$v dq=$dq")
    }
  }

  test("quantize uses floor semantics (engine-portable)") {
    val rows = runQ(Seq(1.239, -1.239, 0.0, 2.999), 2)
    assert(rows.map(_._2) == Seq(123L, -124L, 0L, 299L))
  }

  test("approxTruncate zeroes low bits and never increases the value") {
    val vals = Seq(12345L, 16L, 15L, 0L, 999999L)
    import spark.implicits._
    val out = vals.toDF("q")
      .select(Quantize.approxTruncate(col("q"), 4).as("t"))
      .as[Long].collect().toSeq
    out.zip(vals).foreach { case (t, q) =>
      assert(t % 16 == 0 && t <= q && q - t < 16)
    }
  }
}
