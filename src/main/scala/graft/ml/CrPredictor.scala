package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Quantize

/** M5 — compression-ratio prediction from a sample, mirroring the
  * reference's per-codec CR estimators (database/src/predict/
  * cr_predictor.rs:15-108): a driver-side policy heuristic (SURVEY §2:
  * "driver-side heuristic over df.sample, not an engine operator") that a
  * recoding scheduler uses to decide codec/tier per partition without
  * compressing the data first.
  *
  * Estimators (bytes-per-value relative to raw f64 = 8 bytes):
  *  - dict: distinct-ratio driven (Parquet dictionary encoding);
  *  - delta-bitpack (Sprintz/Gorilla-style): bits to cover the max
  *    quantized step between consecutive values per signal;
  *  - paa(w) / rrd(k): analytic 1/w and 1/k.
  */
object CrPredictor {

  def estimate(readings: DataFrame, sampleFraction: Double, scale: Int,
               paaW: Int = 4, rrdK: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = readings.sparkSession
    import spark.implicits._
    val s = readings.sample(withReplacement = false, sampleFraction, seed)
      .select(col("signal_id"), col("seq_no"),
        Quantize.quantize(col("value"), scale).as("q"))
      .cache()

    // one job for both sample stats (count + cardinality)
    val statsRow = s.agg(count(lit(1)).as("n"),
      countDistinct(col("q")).as("nd")).collect()(0)
    val n = statsRow.getLong(0).toDouble.max(1.0)
    val distinct = statsRow.getLong(1).toDouble
    // dictionary: key width ~ log2(cardinality) bits per value
    val dictBits = math.max(1.0, math.ceil(math.log(distinct.max(2.0)) / math.log(2.0)))

    // delta bit width from per-signal consecutive steps (order by seq_no)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("signal_id")).orderBy(col("seq_no"))
    val deltas = s.withColumn("d", col("q") - lag(col("q"), 1).over(w))
      .where(col("d").isNotNull)
      .select(abs(col("d")).as("ad"))
    val p95 = deltas.stat.approxQuantile("ad", Array(0.95), 0.01).headOption.getOrElse(0.0)
    val deltaBits = math.max(1.0, math.ceil(math.log(p95.max(2.0) * 2) / math.log(2.0)) + 1)

    s.unpersist()
    Seq(
      ("uncompressed", 1.0),
      ("dict", dictBits / 64.0),
      ("delta_bitpack", deltaBits / 64.0),
      (s"paa_$paaW", 1.0 / paaW),
      (s"rrd_$rrdK", 1.0 / rrdK)
    ).toDF("codec", "est_cr")
  }

  /** Recoding decision built on the estimate: codecs whose projected ratio
    * beats the target (the MAB daemons' reward signal shape,
    * MABrecoding_daemon.rs — here a deterministic policy).
    */
  def recommend(readings: DataFrame, targetCr: Double, scale: Int): DataFrame =
    estimate(readings, sampleFraction = 0.1, scale = scale)
      .withColumn("recommended", col("est_cr") <= targetCr)
}
