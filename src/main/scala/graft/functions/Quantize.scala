package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point ("bounded precision") view of doubles — the capability the
  * reference centers on (`PrecisionBound`, reference
  * database/src/methods/prec_double.rs:18-121; PRECISION_MAP
  * database/src/compress/mod.rs:40-56). In Spark this is a plain column
  * expression: quantized values live in a `long` column that Parquet
  * dictionary/bit-pack encodings compress natively, and integer-domain
  * predicates/aggregates over it are exact (no FP-association drift),
  * which is what BUFF's plane-wise sum exactness amounts to
  * (database/src/compress/buff_simd.rs:2294).
  *
  * `floor` (not cast) is used so semantics are identical across engines:
  * SQL engines differ on double->int cast rounding, but floor is floor.
  */
object Quantize {

  /** value -> floor(value * 10^scale) as long. */
  def quantize(value: Column, scale: Int): Column =
    floor(value * lit(math.pow(10.0, scale))).cast("long")

  /** long fixed-point -> approximate double. */
  def dequantize(q: Column, scale: Int): Column =
    q.cast("double") / lit(math.pow(10.0, scale))

  /** Precision-progressive read: drop the low `bits` bits of the fixed-point
    * value (reference split_double.rs:3844 `buff_simd256_decode_with_precision`
    * semantics — approximate answers from a value prefix). Exact integer math.
    */
  def approxTruncate(q: Column, bits: Int): Column = {
    val m = 1L << bits
    (floor(q / lit(m.toDouble)) * lit(m)).cast("long")
  }
}
