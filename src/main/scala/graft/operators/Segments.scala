package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Segment-array view of the readings table — the reference's
  * `Segment<f64>` (database/src/segment.rs:78) as a Spark row per
  * (signal, segment) with an ordered `array<double>` of values.
  * collect_list order is made deterministic by collecting (seq_no, value)
  * structs and array_sort-ing before projecting values out.
  */
object Segments {

  /** (signal_id, seg, cnt, values sorted by position). */
  def of(r: DataFrame): DataFrame =
    r.groupBy(col("signal_id"), Readings.segmentId(col("seq_no")).as("seg"))
      .agg(collect_list(struct(col("seq_no"), col("value"))).as("pts"))
      .select(col("signal_id"), col("seg"),
        transform(array_sort(col("pts")), p => p.getField("value")).as("values"))
      .withColumn("cnt", size(col("values")).cast("long"))

  /** Only complete segments (the reference operates on fixed-size chunks;
    * the trailing partial segment of each signal is excluded for
    * fixed-length ops like FFT/kernels).
    */
  def complete(r: DataFrame): DataFrame =
    of(r).filter(col("cnt") === Readings.SegmentRows)

  /** Fixed-point segment view: `qvals` is the ordered array<long> of
    * `value_q` — the PrecisionBound integer domain the codecs and the DTW
    * distance operate in (exact arithmetic, so oracles compare bit-for-bit).
    */
  def ofQuantized(r: DataFrame): DataFrame =
    r.groupBy(col("signal_id"), Readings.segmentId(col("seq_no")).as("seg"))
      .agg(collect_list(struct(col("seq_no"), col("value_q"))).as("pts"))
      .select(col("signal_id"), col("seg"),
        transform(array_sort(col("pts")), p => p.getField("value_q")).as("qvals"))
      .withColumn("cnt", size(col("qvals")).cast("long"))

  def completeQuantized(r: DataFrame): DataFrame =
    ofQuantized(r).filter(col("cnt") === Readings.SegmentRows)
}
