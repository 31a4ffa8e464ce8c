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
    val store = s"$workDir/store${System.nanoTime()}"
    val q = graft.streaming.Ingest.dedupGrowStream(spark, inDir, store,
      maxFilesPerTrigger = 1)
    q.awaitTermination()
    val total = (System.nanoTime() - t0) / 1e9
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // staged copies near-dup every earlier copy, so confirmed output
    // grows linearly with the landed store BY CONSTRUCTION — report the
    // per-batch confirmed count so cost growth attributes to output (the
    // scale table's dedup_minhash discipline), not to the probe
    import org.apache.spark.sql.functions.{col, count}
    val confirmedByBatch: Map[Long, Long] =
      if (!new java.io.File(s"$store/pairs").isDirectory) Map.empty
      else spark.read.parquet(s"$store/pairs")
        .groupBy(col("batch_id")).agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var docsBefore = 0L
    val batches = q.recentProgress.toSeq.map { p =>
      val add = Option(p.durationMs.get("addBatch")).map(_.longValue)
        .getOrElse(0L) / 1e3
      val rowsIn = p.numInputRows
      val confirmed = confirmedByBatch.getOrElse(p.batchId, 0L)
      val row = s"""{"docs_before":$docsBefore,"rows_in":$rowsIn,""" +
        s""""confirmed_pairs":$confirmed,"addBatch_sec":${f3(add)}}"""
      docsBefore += rowsIn
      row
    }
    println(s"""{"metric":"dedup_growth","unit":"sec","input":"$inDir",""" +
      s""""total_sec":${f3(total)},"batches":[${batches.mkString(",")}]}""")
    spark.stop()
  }
}
