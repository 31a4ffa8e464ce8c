package graft

import org.apache.spark.sql.SparkSession

/** Marginal-batch-cost curve of the streaming matrix profile vs history
  * size: replays a staged seg-ordered input (tools/make_ramp_history.py
  * for the exact route, tools/make_adversarial.py restaged for the dense
  * route) through Ingest.profileStream with maxFilesPerTrigger=1 and
  * prints ONE JSON line mapping each micro-batch to the history size it
  * folded against (m_before, in segments) and its addBatch seconds —
  * the committed evidence for whether per-batch cost grows with m.
  *
  * Usage: graft.ProfileGrowthBench <stagedInputDir> <workDir>
  */
object ProfileGrowthBench {
  def main(args: Array[String]): Unit = {
    val Array(inDir, workDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // recentProgress is a bounded ring (default 100): a replay with
      // more slices than that would silently drop the EARLIEST batches
      // and mislabel m_before from the truncated head — raise the cap
      // far past any growth-curve replay this harness stages
      .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_REBUILD_EVERY overrides profileStream's periodic
    // route-state rebuild interval, so the harness can also measure the
    // rebuild batch's cost against a large folded history (a small
    // interval forces rebuilds INSIDE the replay window; the default 64
    // keeps the growth curve rebuild-free, matching production cadence)
    val rebuildEvery =
      sys.env.getOrElse("SPARK_GRAFT_REBUILD_EVERY", "64").toInt
    val t0 = System.nanoTime()
    val q = graft.streaming.Ingest.profileStream(spark, inDir,
      s"$workDir/w${System.nanoTime()}",
      segRows = graft.operators.Readings.SegmentRows.toInt,
      maxFilesPerTrigger = 1, rebuildEvery = rebuildEvery)
    q.awaitTermination()
    val total = (System.nanoTime() - t0) / 1e9
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    var mBefore = 0L
    val batches = q.recentProgress.toSeq.map { p =>
      val add = Option(p.durationMs.get("addBatch")).map(_.longValue)
        .getOrElse(0L) / 1e3
      val rowsIn = p.numInputRows
      val row = s"""{"m_before":$mBefore,"rows_in":$rowsIn,""" +
        s""""addBatch_sec":${f3(add)}}"""
      mBefore += rowsIn / graft.operators.Readings.SegmentRows
      row
    }
    println(s"""{"metric":"profile_growth","unit":"sec","input":"$inDir",""" +
      s""""total_sec":${f3(total)},"batches":[${batches.mkString(",")}]}""")
    spark.stop()
  }
}
