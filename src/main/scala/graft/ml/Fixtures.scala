package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  private val M32 = 4294967296L // 2^32

  /** 32-bit xorshift-multiply mixer (murmur-finalizer style) over a
    * non-negative salted row id. Every intermediate stays inside the
    * non-negative 63-bit range, so the SAME arithmetic runs under ANSI
    * Spark and in DuckDB BIGINT — making hash-derived fixtures
    * oracle-checkable (unlike xxhash64, which is engine-specific).
    */
  // multiplier constants must stay below 2^31 so (2^32-1) * m fits in a
  // signed 64-bit long (ANSI Spark errors on overflow; DuckDB too)
  def mix32(id: Column, salt: Long): Column = {
    val a = pmod(pmod(id, lit(M32)) * lit(1540483477L) + lit(salt), lit(M32))
    val b = pmod(a.bitwiseXOR(shiftright(a, 16)) * lit(668265261L), lit(M32))
    val c = pmod(b.bitwiseXOR(shiftright(b, 13)) * lit(1540483477L), lit(M32))
    c.bitwiseXOR(shiftright(c, 16))
  }

  /** The DuckDB expression computing [[mix32]] of BIGINT expression `t`. */
  def mix32Sql(t: String, salt: Long): String = {
    val a = s"((($t) % $M32) * 1540483477 + $salt) % $M32"
    val b = s"(xor($a, ($a) >> 16) * 668265261) % $M32"
    val c = s"(xor($b, ($b) >> 13) * 1540483477) % $M32"
    s"xor($c, ($c) >> 16)"
  }

  /** n values in a majority band, with `outlierRatio` of rows pushed far
    * outside it. Deterministic per row id.
    */
  def outlierColumn(spark: SparkSession, n: Long, outlierRatio: Double,
                    majorityLo: Double = 0.0, majorityHi: Double = 1.0,
                    outlierScale: Double = 1000.0): DataFrame = {
    val ids = spark.range(n)
    val u = (mix32(col("id"), 1L) % 1000000L).cast("double") / 1000000.0
    val isOut = (mix32(col("id"), 2L) % 1000000L).cast("double") / 1000000.0 < outlierRatio
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
      .where((mix32(col("id"), 3L) % 1000000L).cast("double") / 1000000.0
        < selectivity)
      .select(col("id").as("row_id"))
}
