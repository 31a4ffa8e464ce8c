package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialize a REUSED intermediate exactly once — the shared form of the
  * `localCheckpoint()`-at-the-reuse-point pattern the optimization rounds
  * apply wherever one derived frame feeds several subtrees (Spark
  * re-executes the full upstream pipeline per reference otherwise; the
  * differently-pruned copies never produce a ReusedExchange).
  *
  * THE CLUSTER-SCALE CAVEAT (applies to EVERY localCheckpoint in this
  * repo, including the small-frame call sites that use it directly —
  * Similarity.nearDupLsh/semanticDedup, ZoneMap.percentileFromHistogram,
  * Relevance, Dedup's CC loops): `localCheckpoint` stores the
  * lineage-truncated blocks in NON-REPLICATED executor storage. In
  * local-mode and single-executor deployments that is free insurance; on
  * a multi-executor cluster an executor loss makes the job FAIL instead
  * of recompute, and a corpus-sized checkpoint additionally pins
  * data-sized blocks in executor memory/disk. At cluster scale swap for
  * reliable checkpointing (`spark.sparkContext.setCheckpointDir` +
  * `.checkpoint()`) or a staged write to durable storage — which is
  * exactly what [[shared]] does automatically past a size threshold.
  *
  * [[shared]] gates on the optimizer's size ESTIMATE for the frame:
  *  - at or below `spark.graft.materialize.maxLocalBytes` (default 1 GiB)
  *    it local-checkpoints — the small-frame fast path every bench-scale
  *    call hits;
  *  - above it, the frame is STAGED TO PARQUET scratch and read back:
  *    durable, spillable, partition-parallel on re-read, and holding no
  *    executor storage — the 100 TB-safe shape for corpus-sized reuse
  *    (readings in the codec matrix, landed upsert batches, segment
  *    arrays). Row VALUES are identical either way; the staged frame's
  *    fields read back NULLABLE (Spark file sources force nullability
  *    regardless of the supplied schema — value-neutral), and
  *    PARTITIONING AND PER-PARTITION ORDER ARE NOT guaranteed to survive
  *    the parquet round-trip, so callers whose downstream depends on
  *    physical order
  *    (e.g. byte-accounting writers) must impose it explicitly or accept
  *    the estimate-gated behavior (all current callers sort or aggregate
  *    downstream, or only engage the staged path far above bench scale).
  *
  * The threshold is a conf knob, not a constant tuned to local mode: a
  * production deployment sizes it to per-executor storage headroom.
  */
object Materialize {
  private val scratch = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def cleanupOnExit(p: java.nio.file.Path): Unit = {
    scratch.add(p)
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import scala.jdk.CollectionConverters._
        scratch.iterator().asScala.foreach { d =>
          try java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
          catch { case _: Throwable => () }
        }
      }))
  }

  /** [[shared]] that only engages past a LOWER size bound — for reuse
    * points where the duplicated upstream is so cheap at small scale
    * that materializing it is a measured REGRESSION (dedup_ngram r15:
    * checkpointing the band table cost ~20-25% — the scan->sets->
    * signature pipeline fuses into one codegen pass per join side, and
    * an eager checkpoint trades a cheap recompute for a serial job plus
    * two block-manager crossings), while at 10-100x the duplicated scan
    * is real work. Below `spark.graft.materialize.minSharedBytes`
    * (default 256 MiB, the "no longer one fused input split" scale) the
    * frame passes through untouched; above it, [[shared]]'s local-vs-
    * staged discipline applies.
    */
  def sharedIfLarge(df: DataFrame): DataFrame = {
    val minShared = df.sparkSession.conf
      .getOption("spark.graft.materialize.minSharedBytes")
      .map(_.toLong).getOrElse(256L << 20)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < minShared) df else shared(df)
  }

  /** Size-gated one-time materialization of a multiply-consumed frame
    * (see the object doc). Returns a frame whose plan is a leaf — the
    * upstream pipeline has executed exactly once when this returns.
    */
  def shared(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxLocal = spark.conf
      .getOption("spark.graft.materialize.maxLocalBytes")
      .map(_.toLong).getOrElse(1L << 30)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= maxLocal) df.localCheckpoint()
    else {
      val dir = java.nio.file.Files.createTempDirectory("graft-mat")
      cleanupOnExit(dir)
      val out = dir.resolve("staged").toString
      df.write.mode("overwrite").parquet(out)
      spark.read.schema(df.schema).parquet(out)
    }
  }
}
