package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M4 — deterministic outlier / selectivity fixture generators, the Spark
  * shape of the reference's synthetic benchmark inputs
  * (database/src/outlier/mod.rs:13-88: gen_u8_with_outlier produces a
  * majority-band column with an outlier fraction; gen_vector_indices
  * produces random sorted candidate row-id sets of a given selectivity).
  * All derivations are hash-of-row-id based, so the output is identical
  * on every run and on every cluster size (no RNG state per partition).
  */
object Fixtures {

  /** n values in a majority band, with `outlierRatio` of rows pushed far
    * outside it. Deterministic per row id.
    */
  def outlierColumn(spark: SparkSession, n: Long, outlierRatio: Double,
                    majorityLo: Double = 0.0, majorityHi: Double = 1.0,
                    outlierScale: Double = 1000.0): DataFrame = {
    val ids = spark.range(n)
    val u = (abs(xxhash64(col("id"), lit("u"))) % 1000000L).cast("double") / 1000000.0
    val isOut = (abs(xxhash64(col("id"), lit("o"))) % 1000000L).cast("double") / 1000000.0 < outlierRatio
    ids.select(col("id").as("row_id"),
      when(isOut, lit(majorityHi) + u * outlierScale)
        .otherwise(lit(majorityLo) + u * (majorityHi - majorityLo)).as("value"),
      isOut.as("is_outlier"))
  }

  /** Sorted candidate row-id set with the given selectivity over [0, n) —
    * the reference's projection-benchmark input (query/main.rs:30-127).
    */
  def candidateIds(spark: SparkSession, n: Long, selectivity: Double): DataFrame =
    spark.range(n)
      .where((abs(xxhash64(col("id"), lit("sel"))) % 1000000L).cast("double") / 1000000.0
        < selectivity)
      .select(col("id").as("row_id"))
}
