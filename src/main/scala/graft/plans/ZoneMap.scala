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

  /** Per-(signal, segment) fixed-point value histogram — the percentile
    * "sketch" tier. In the quantized domain a value_q count table IS an
    * exact mergeable quantile sketch (the t-digest analogue of the
    * reference's sketch-serving path, buffer_pool.rs:940-1101, with zero
    * error in the engine's own fixed-point domain): cells merge by
    * summing counts (associative — streamable and partially aggregable),
    * and table size is bounded by value_q cardinality × segments, not by
    * row count.
    */
  def segmentHistogram(r: DataFrame): DataFrame =
    r.groupBy(col("signal_id"), Readings.segmentId(col("seq_no")).as("seg"),
        col("value_q"))
      .agg(count(lit(1)).as("cnt"))

  /** Event-time flavor of [[segmentHistogram]]: cells keyed by
    * (signal, day, value_q) — the key STREAMING ingest can maintain
    * per micro-batch (like [[timeStats]]); partial cells from different
    * batches fold exactly because counts are associative.
    */
  def timeHistogram(r: DataFrame): DataFrame =
    r.groupBy(col("signal_id"), date_trunc("day", col("ts")).as("day"),
        col("value_q"))
      .agg(count(lit(1)).as("cnt"))

  /** Fold histogram cells (per-segment, per-day or per-batch partials) to
    * per-signal cells (exact merge — the stats-tree fold,
    * avl/btrarr.rs:11-92 analogue).
    */
  def foldHistogram(hist: DataFrame): DataFrame =
    hist.groupBy(col("signal_id"), col("value_q"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Interpolated per-signal percentiles served from the histogram alone —
    * no data scan. Equals percentile_cont over the dequantized values:
    * rank index i = (n-1)p; the bracketing cells come from one cumulative
    * window over the (tiny) per-signal histogram plus two equi-joins on
    * signal_id with range post-filters — no sort of the raw data anywhere.
    */
  def percentileFromHistogram(hist: DataFrame, ps: Seq[Double],
                              scale: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialized once: the folded histogram feeds the cumulative window
    // (referenced by BOTH bracket sides) and the per-signal rank-index
    // table — unmaterialized, the upstream histogram build (and for
    // o8_percentile_sketch the whole readings seq_no window beneath it)
    // executed 3x; the sketch is per-signal-cell-sized, the exact thing
    // the stats tier persists anyway (cluster-scale caveat of
    // localCheckpoint: see Materialize's object doc)
    val h = foldHistogram(hist).localCheckpoint()
    val w = Window.partitionBy(col("signal_id")).orderBy(col("value_q"))
    val cum = h.select(col("signal_id").as("c_sig"), col("value_q"),
        sum(col("cnt")).over(w).as("cume"),
        (sum(col("cnt")).over(w) - col("cnt")).as("strt"))
    val idx = h.groupBy(col("signal_id")).agg(sum(col("cnt")).cast("long").as("n"))
      .select(col("signal_id"), col("n"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("i", (col("n") - lit(1L)).cast("double") * col("p"))
      .withColumn("lo", floor(col("i")).cast("long"))
      .withColumn("hi", ceil(col("i")).cast("long"))
    val vlo = cum.select(col("c_sig"), col("value_q").as("vlo"),
      col("strt").as("lo_s"), col("cume").as("lo_c"))
    val vhi = cum.select(col("c_sig").as("c_sig2"), col("value_q").as("vhi"),
      col("strt").as("hi_s"), col("cume").as("hi_c"))
    idx
      .join(vlo, idx("signal_id") === vlo("c_sig") &&
        vlo("lo_s") <= idx("lo") && idx("lo") < vlo("lo_c"))
      .join(vhi, idx("signal_id") === vhi("c_sig2") &&
        vhi("hi_s") <= idx("hi") && idx("hi") < vhi("hi_c"))
      .select(col("signal_id"), col("p"),
        round((col("vlo").cast("double") +
          (col("vhi") - col("vlo")).cast("double") *
            (col("i") - col("lo").cast("double"))) / lit(scale), 6).as("v"))
  }
}
