package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Readings

/** O8 — hierarchical pre-aggregated stats ("zone map" / segment-stats tree).
  *
  * The reference materializes per-segment `AggStats{min,max,sum,count}` and a
  * K-ary fold of them (reference database/src/buffer_pool.rs:757-790,
  * avl/btrarr.rs:11-92, stats.rs:77) so max/sum queries never touch data.
  * Parquet row-group stats already give Spark scan-time skipping for free;
  * this module is the SQL-visible flavor: a small stats table per
  * (signal, segment) that aggregate queries can be answered from. At 100 TB
  * the stats table is ~1/SegmentRows the size of the data and is itself a
  * partitioned Parquet table; folding stats is associative so Spark's
  * partial aggregation is the K-ary tree.
  */
object ZoneMap {

  /** Build the per-(signal, segment) stats table from the readings view. */
  def segmentStats(r: DataFrame): DataFrame =
    r.groupBy(col("signal_id"), Readings.segmentId(col("seq_no")).as("seg"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"),
        sum(col("value_q")).cast("long").as("sum_q"))

  /** Event-time flavor of [[segmentStats]]: stats per (signal, day) — the
    * key STREAMING ingest can maintain (positional seq_no needs the full
    * per-signal history; event time does not). Because every stat column
    * is associative, a stats table built from per-micro-batch PARTIAL rows
    * (appended by Ingest.tier0Writer) answers the same queries after a
    * fold — the incremental update_stats path of the reference's stats
    * tree (avl/btrarr.rs:92).
    */
  def timeStats(r: DataFrame): DataFrame =
    r.groupBy(col("signal_id"), date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"),
        sum(col("value_q")).cast("long").as("sum_q"))

  /** Re-fold a stats table containing partial (per-batch) rows into one
    * row per key — exact, because all four stats are associative.
    */
  def foldTimeStats(stats: DataFrame): DataFrame =
    stats.groupBy(col("signal_id"), col("day"))
      .agg(sum(col("cnt")).cast("long").as("cnt"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"),
        sum(col("sum_q")).cast("long").as("sum_q"))

  /** Answer a global max from the stats table alone (no data scan) —
    * the reference's buffer_pool.rs:940-1101 stats-only query path.
    */
  def maxFromStats(stats: DataFrame): DataFrame =
    stats.agg(max(col("vmax")).as("vmax"))

  /** Global sum/count from stats (exact, fixed-point domain). */
  def sumFromStats(stats: DataFrame): DataFrame =
    stats.agg(sum(col("sum_q")).cast("long").as("sum_q"),
              sum(col("cnt")).cast("long").as("cnt"))

  /** Global min from stats — with max/sum/count/avg this completes the
    * reference's five buffer-level stats queries (Count/Min/Max/Sum/
    * Average, query.rs:41-173), all served without touching data.
    */
  def minFromStats(stats: DataFrame): DataFrame =
    stats.agg(min(col("vmin")).as("vmin"))

  /** Global average from stats: exact fixed-point sum over exact count,
    * dequantized (query.rs:168 Average). Exact because sum_q is the
    * integer-domain sum — no FP fold-order drift enters the stats table.
    */
  def avgFromStats(stats: DataFrame, scale: Double): DataFrame =
    stats.agg(sum(col("sum_q")).cast("long").as("sq"),
              sum(col("cnt")).cast("long").as("cnt"))
      .select(round(col("sq").cast("double") /
        (lit(scale) * col("cnt").cast("double")), 6).as("avg_v"),
        col("cnt"))
}
