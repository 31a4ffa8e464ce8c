package graft

import org.apache.spark.sql.SparkSession

/** Marginal-batch-cost curve of the streaming near-dedup vs landed-store
  * size: replays a staged multi-file document corpus through
  * Ingest.dedupGrowStream with maxFilesPerTrigger=1 — each micro-batch
  * signs its documents per-row, probes the PERSISTED band store for
  * near-dup candidates against everything landed before it, and appends
  * its own bands — and prints ONE JSON line mapping each micro-batch to
  * the store size it probed (docs_before) and its addBatch seconds. The
  * committed evidence for whether the live-curation dedup path's
  * per-batch cost stays flat as the landed corpus grows
  * (tools/run_dedup_growth.sh stages the input; profile_growth's sibling).
  *
  * Usage: graft.DedupGrowthBench <stagedInputDir> <workDir>
  */
object DedupGrowthBench {
  def main(args: Array[String]): Unit = {
    val Array(inDir, workDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val q = graft.streaming.Ingest.dedupGrowStream(spark, inDir,
      s"$workDir/store${System.nanoTime()}", maxFilesPerTrigger = 1)
    q.awaitTermination()
    val total = (System.nanoTime() - t0) / 1e9
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    var docsBefore = 0L
    val batches = q.recentProgress.toSeq.map { p =>
      val add = Option(p.durationMs.get("addBatch")).map(_.longValue)
        .getOrElse(0L) / 1e3
      val rowsIn = p.numInputRows
      val row = s"""{"docs_before":$docsBefore,"rows_in":$rowsIn,""" +
        s""""addBatch_sec":${f3(add)}}"""
      docsBefore += rowsIn
      row
    }
    println(s"""{"metric":"dedup_growth","unit":"sec","input":"$inDir",""" +
      s""""total_sec":${f3(total)},"batches":[${batches.mkString(",")}]}""")
    spark.stop()
  }
}
