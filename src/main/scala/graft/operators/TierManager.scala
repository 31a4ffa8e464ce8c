package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.{ZoneMap, ZoneMapRegistry}

/** S6 — tier lifecycle: the storage ladder the reference runs with
  * buffer-pool eviction + recoding daemons (database/src/buffer_pool.rs
  * clock/LRU tiers, recoding_daemon.rs aging ladder), expressed as Spark
  * batch jobs over partitioned Parquet:
  *
  *   tier0 (exact, hot)  --age-->  tier1 (quantized)  --age-->  tier2 (PAA)
  *
  * `compactTo*` moves data older than a cutoff down one tier, guarded
  * per segment by the projected compression ratio (Tiers.recodePlan —
  * don't rewrite what won't shrink), writes Parquet partitioned by signal
  * bucket, and registers the per-tier zone-map stats table; queries read
  * whichever tier covers their range (e.g. maxFromColdTier). Each step is a
  * partition rewrite — at 100 TB this is the standard compaction shape
  * (bounded per-job IO, no cross-partition shuffle beyond the PAA
  * aggregation key).
  */
class TierManager(spark: SparkSession, root: String) {

  val tier0 = s"$root/tier0" // exact readings
  val tier1 = s"$root/tier1" // quantized (value dropped, value_q kept)
  val tier2 = s"$root/tier2" // PAA chunk means
  private def stats(t: String) = s"$t.stats"

  /** Land exact readings into tier0 (ingest output). */
  def landTier0(readings: DataFrame): Unit = {
    Tiers.writeTier(readings, tier0)
    ZoneMap.segmentStats(readings)
      .write.mode("overwrite").parquet(stats(tier0))
    ZoneMapRegistry.register(tier0, stats(tier0))
  }

  /** Age tier0 rows with ts < cutoff into the quantized tier (drop the
    * raw double; keep the fixed-point long that Parquet dictionary/bitpack
    * encodes natively — the BUFF-domain representation).
    */
  def compactToQuantized(cutoff: java.sql.Timestamp): Long = {
    val aged = spark.read.parquet(tier0).filter(col("ts") < lit(cutoff))
    val out = aged.select(col("signal_id"), col("ts"), col("seq_no"), col("value_q"))
    Tiers.writeTier(out, tier1)
    out.count()
  }

  /** Age tier1 rows into PAA chunk means, guarded by projected CR:
    * segments whose PAA rewrite wouldn't beat `targetCr` stay quantized.
    */
  def compactToPaa(w: Int, targetCr: Double): Long = {
    val t1 = spark.read.parquet(tier1)
      .withColumn("value", col("value_q").cast("double") / 100.0)
    val plan = Tiers.recodePlan(t1, w, targetCr)
      .filter(col("recode"))
      .select(col("signal_id"), col("seg"))
    // per-SEGMENT guard (reference recoding_daemon.rs:283-348): only the
    // exact segments the plan approved are rewritten; a signal's other
    // segments stay quantized
    val eligible = t1.withColumn("seg", Readings.segmentId(col("seq_no")))
      .join(plan, Seq("signal_id", "seg"), "left_semi")
      .drop("seg")
    val paa = Tiers.paaChunks(eligible, w)
      .select(col("signal_id"), col("chunk"), col("chunk_mean"), col("cnt"))
    Tiers.writeTier(paa, tier2)
    paa.count()
  }

  /** Max over the coldest tier that still answers exactly for the range —
    * here: stats-only for grand totals (zone map), PAA for aged data.
    */
  def maxFromColdTier(): DataFrame =
    spark.read.parquet(tier2)
      .groupBy(col("signal_id")).agg(max(col("chunk_mean")).as("paa_max"))
}
