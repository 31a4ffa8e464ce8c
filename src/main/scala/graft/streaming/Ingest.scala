package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.functions.Quantize

/** Structured Streaming ingestion — the Spark shape of the reference's
  * client -> BufferedSignal -> CompressionDaemon pipeline
  * (database/src/client.rs:27-344, future_signal.rs:121-217,
  * compression_daemon.rs:117-161):
  *
  *  - S1 source: file stream replay (rate-limited via maxFilesPerTrigger,
  *    the analogue of the reference's Frequency/Amount client knobs);
  *  - S2 segmentation: fixed-size per-signal chunks via
  *    flatMapGroupsWithState (the reference's split_decider `i >= j`);
  *  - S3 sink: foreachBatch append to tier-0 Parquet partitioned by signal
  *    bucket — micro-batches replace the daemon's buffer-threshold
  *    hand-off; event-time watermarking covers the late-data semantics the
  *    reference never had (SURVEY §2.3).
  */
object Ingest {

  import org.apache.spark.sql.types._

  /** Static schemas of profileStream's persisted snapshots — supplied to
    * every per-batch read so no micro-batch pays a footer/schema-
    * inference pass per directory.
    */
  private val SegSnapshotSchema = StructType(Seq(
    StructField("signal_id", LongType), StructField("seg", LongType),
    StructField("qvals", ArrayType(LongType))))
  private val ProfSnapshotSchema = StructType(Seq(
    StructField("signal_id", LongType), StructField("seg", LongType),
    StructField("nnd_q", LongType), StructField("exact", BooleanType)))
  private val RouteStateSchema = StructType(Seq(
    StructField("kind", StringType), StructField("signal_id", LongType),
    StructField("m", LongType), StructField("t", LongType),
    StructField("last_seg", LongType),
    StructField("last_qvals", ArrayType(LongType)),
    StructField("exact", BooleanType), StructField("ordered", BooleanType),
    StructField("touched", BooleanType), StructField("dense", BooleanType),
    StructField("grid_pairs", LongType), StructField("h", LongType),
    StructField("cnt", LongType), StructField("s0", LongType),
    // group-hash salt (MotifDiscord.groupHash): pre-salt snapshots read
    // it as null -> recovered as 0, the historical unsalted hash
    StructField("salt", LongType)))

  /** Normalized streaming readings from raw event files (schema must be
    * supplied for a file stream; ns timestamps arrive as longs).
    */
  def readingsStream(spark: SparkSession, srcDir: String,
                     maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    // ts arrives as nanos-long or TIMESTAMP_NTZ/TIMESTAMP depending on the
    // testdata generation — same branch as Tables.normalizeTs
    graft.Tables.normalizeTs(stream)
      .select(
        col("user_id").as("signal_id"),
        col("ts"),
        col("event_id"),
        col("value"),
        Quantize.quantize(col("value"), 2).as("value_q"))
  }

  /** S1b — generator clients: synthetic signal streams from the
    * rate-micro-batch source (the reference's normal/uniform generator
    * clients, client.rs:231-344). Values are hash-derived from the row
    * index — deterministic per index at any parallelism, like the
    * reference's seeded generators.
    */
  def generatedSignals(spark: SparkSession, rowsPerBatch: Int, nSignals: Int): DataFrame =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("startTimestamp", "0")
      .load()
      .select(
        pmod(col("value"), lit(nSignals.toLong)).as("signal_id"),
        col("timestamp").as("ts"),
        col("value").as("event_id"),
        ((abs(xxhash64(col("value"), lit("gen"))) % 100000L).cast("double") / 1000.0)
          .as("value"))
      .withColumn("value_q", Quantize.quantize(col("value"), 2))

  /** S3 — tier-0 writer: land micro-batches as Parquet partitioned by
    * (batch_id, signal bucket). When `statsDir` is set, each batch ALSO
    * lands its partial per-(signal, day) zone-map stats — the incremental
    * stats-tree maintenance of the reference's ingest (avl/btrarr.rs:92
    * update_stats); partial rows fold exactly at read time because every
    * stat is associative (ZoneMap.foldTimeStats). Stats cost one extra
    * keyed aggregation per micro-batch over that batch only.
    *
    * Both writes are IDEMPOTENT under foreachBatch's at-least-once
    * replay: the write is a dynamic-partition OVERWRITE keyed by the
    * micro-batch id, so a batch replayed after a crash between the data
    * write and the checkpoint commit replaces its own partitions instead
    * of appending duplicates (which would double-count cnt/sum in the
    * folded stats and duplicate tier-0 rows).
    */
  def tier0Writer(readings: DataFrame, tier0Dir: String, checkpointDir: String,
                  buckets: Int = 32, statsDir: Option[String] = None,
                  histDir: Option[String] = None): StreamingQuery =
    readings
      .withColumn("sig_bucket", pmod(col("signal_id"), lit(buckets)))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id", "sig_bucket")
          .parquet(tier0Dir)
        statsDir.foreach { sd =>
          graft.plans.ZoneMap.timeStats(batch.drop("sig_bucket"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sd)
        }
        // percentile-sketch maintenance: per-batch partial value_q cells
        // (signal, day, value_q) — same idempotent overwrite discipline;
        // ZoneMap.foldHistogram merges partials exactly at read time, so
        // the persisted sketch serves percentiles with no raw-data scan
        histDir.foreach { hd =>
          graft.plans.ZoneMap.timeHistogram(batch.drop("sig_bucket"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(hd)
        }
      }
      .start()

  /** Event-time windowed aggregation with watermark over the stream —
    * the streaming flavor of O6 (idiomatic Spark; positional windows are a
    * batch concept).
    */
  def windowedMax(readings: DataFrame, width: String, watermark: String): DataFrame =
    readings
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width))
      .agg(max(col("value")).as("wmax"), count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("wmax"), col("cnt"))

  /** Event-time SESSION windows with watermark over the stream — the
    * streaming flavor of ts_session (same `session_window` semantics as
    * the batch query, so the parity spec compares them directly). State
    * per open session is bounded by the watermark: a session closes —
    * and its state drops — once the watermark passes its gap.
    */
  def sessionStream(readings: DataFrame, gap: String, watermark: String): DataFrame =
    readings
      .withWatermark("ts", watermark)
      .groupBy(col("signal_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("cnt"), max(col("value")).as("vmax"))
      .select(col("signal_id"),
        unix_timestamp(col("session_window.start")).as("s_start"),
        col("cnt"), col("vmax"))

  /** Streaming exact deduplication of a document stream — the streaming
    * flavor of Dedup.exact (first occurrence of each content hash wins).
    * `dropDuplicatesWithinWatermark` bounds the dedup state by event
    * time: a hash's state is dropped once the watermark passes it, the
    * only state shape that survives an unbounded 100 TB/day stream
    * (global dropDuplicates state would grow forever). Exactness is
    * therefore scoped to the watermark horizon — duplicates farther
    * apart than `watermark` need the batch operator (a nightly
    * Dedup.exact pass over the landed tier).
    */
  def dedupStream(docs: DataFrame, watermark: String): DataFrame =
    docs.withColumn("content_hash", xxhash64(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Incremental streaming near-dedup against a GROWING landed signature
    * store — the live-curation pipeline shape (a continuously-arriving
    * corpus dedups each batch against EVERYTHING landed before it, then
    * lands itself). [[nearDupStream]] serves a FIXED corpus; this is the
    * growth regime, and the shape whose per-batch cost curve the scale
    * harness commits (r14 verdict #5, `DedupGrowthBench`). Per
    * micro-batch:
    *
    *  1. per-row native shingle hashes -> per-row MinHash signature (the
    *     shared splitmix64 fold — no stream-side aggregation, no
    *     unbounded state, identical hashes to the batch path);
    *  2. the batch's band rows probe the PERSISTED band store for
    *     near-dup candidates landed by any earlier batch — the batch
    *     side is the small side (broadcast), the store side is a keyed
    *     scan (at 100 TB: bucket the store by band hash so the probe
    *     reads only matching buckets);
    *  3. candidates CONFIRM by exact Jaccard against the persisted
    *     element-set store — candidate-bounded work: only the store rows
    *     of flagged `dup_of` ids are read (join pruning), the batch's
    *     sets broadcast, and confirmed pairs land in `<store>/pairs` —
    *     the operator's output, same semantics as the batch path's
    *     nearDupBySets confirm (StreamingSpec pins cross-batch pair
    *     equality);
    *  4. the batch's bands and element sets APPEND to their stores — the
    *     stores grow by O(batch), never rewritten.
    *
    * Per-batch counts are logged (`[dedup-grow]` stderr lines). Returns
    * the started query; per-batch cost lives in `recentProgress`
    * (addBatch).
    */
  def dedupGrowStream(spark: SparkSession, inDir: String, storeDir: String,
                      threshold: Double = 0.5,
                      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
    val bandDir = s"$storeDir/bands"
    val setsDir = s"$storeDir/sets"
    val pairsDir = s"$storeDir/pairs"
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", s"$storeDir/_chk")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val batchSets = batch
          .select(col("doc_id"),
            graft.functions.TextOps.shingleHashes3(col("text")).as("sh"))
          .filter(size(col("sh")) > 0)
          .persist()
        val sigs = batchSets
          .as[(Long, Seq[Long])]
          .map { case (id, sh) =>
            (id, graft.operators.Dedup.signatureOfHashes(sh))
          }
          .toDF("doc_id", "sig")
        // probe + append both consume the band rows; compute them once
        val bands = graft.operators.Dedup.bandsOfSignatures(sigs).persist()
        try {
          val hasStore = new java.io.File(bandDir).isDirectory
          if (hasStore) {
            val cand = sp.read.parquet(bandDir)
              .select(col("doc_id").as("dup_of"), col("band"), col("bh"))
              .join(broadcast(bands.withColumnRenamed("doc_id", "new_id")),
                Seq("band", "bh"))
              .select(col("new_id"), col("dup_of")).distinct()
            // exact confirm, candidate-bounded: the set store is read
            // only at the flagged dup_of ids (join pruning), the batch's
            // own sets broadcast, same size-ratio prune + one-pass
            // Jaccard as the batch confirm
            val confirmed = cand
              .join(sp.read.parquet(setsDir)
                  .select(col("doc_id").as("dup_of"), col("sh").as("shb")),
                Seq("dup_of"))
              .join(broadcast(batchSets.withColumnRenamed("doc_id", "new_id")),
                Seq("new_id"))
              .where(least(size(col("sh")), size(col("shb"))).cast("double") >=
                lit(threshold) *
                  greatest(size(col("sh")), size(col("shb"))).cast("double"))
              .withColumn("jac",
                graft.functions.TextOps.jaccardLongSets(col("sh"), col("shb")))
              .filter(col("jac") >= threshold)
              .select(col("new_id").as("doc_id"), col("dup_of"), col("jac"),
                lit(batchId).as("batch_id"))
              .persist()
            try {
              val nConfirmed = confirmed.count()
              confirmed.write.mode("append").parquet(pairsDir)
              System.err.println(s"[dedup-grow] batch=$batchId " +
                s"confirmed_pairs=$nConfirmed")
            } finally { confirmed.unpersist(false); () }
          } else {
            System.err.println(s"[dedup-grow] batch=$batchId store empty")
          }
          bands.select(col("doc_id"), col("band"), col("bh"))
            .write.mode("append").parquet(bandDir)
          batchSets.write.mode("append").parquet(setsDir)
        } finally {
          bands.unpersist(false)
          batchSets.unpersist(false)
          ()
        }
      }
      .start()
  }

  /** Streaming NEAR-dedup against the landed corpus — the MinHash-LSH
    * serving shape (stream-static, like [[anomalyStream]]): an arriving
    * document is flagged the moment it lands if it is a near-duplicate of
    * anything already in the corpus. Everything stateful about batch LSH
    * is avoided by construction:
    *
    *  - the stream side computes its signature PER ROW
    *    (Dedup.signatureOfHashes — the same splitmix64 fold as the batch
    *    aggregator, proven equal in StreamingSpec), so there is no
    *    stream-side groupBy and no unbounded aggregation state;
    *  - candidates come from an equi-join of the stream's band rows onto
    *    the corpus band table (static side — persist it as parquet in
    *    production, exactly the IvfStore discipline); the exact-Jaccard
    *    confirm joins the corpus shingle sets by candidate id. Both joins
    *    are stream-static, stateless;
    *  - a doc matching a corpus doc in several bands emits one row per
    *    band; the final dropDuplicatesWithinWatermark bounds that dedup
    *    state by event time, as dedupStream does.
    *
    * New-vs-new pairs inside the stream are NOT detected here — the
    * nightly batch Dedup.minhashNearDup pass owns those, the same
    * division of labor as dedupStream's watermark horizon.
    * Output: (doc_id, ts, dup_of, jac).
    */
  def nearDupStream(docs: DataFrame, corpus: DataFrame, threshold: Double,
                    watermark: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.operators.Dedup

    // stream-static joins re-execute the static side's plan EVERY
    // micro-batch; persist both static frames so the corpus is shingled
    // and minhashed once per query start, not once per trigger (in
    // production these live as parquet, the IvfStore discipline — the
    // persist here is the in-session equivalent; storage is released
    // when the streaming query's session ends or the bench's untimed
    // between-query cleanup runs)
    val corpusSets = Dedup.shingleSets(corpus)
    val corpusBands = Dedup.bandTable(corpusSets)
      .select(col("doc_id").as("dup_of"), col("band"), col("bh"))
      .persist()
    val corpusSh = corpusSets.select(col("doc_id").as("dup_of"),
      col("sh").as("shb"))
      .persist()

    // per-row signature: the native shingle-hash expression (same
    // xxhash64 values as the batch path's shingleSets), then the shared
    // splitmix64 minima fold — no interpreted transform() hop
    val sigs = docs
      .select(col("doc_id"), col("ts"),
        graft.functions.TextOps.shingleHashes3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .as[(Long, java.sql.Timestamp, Seq[Long])]
      .map { case (id, ts, sh) => (id, ts, sh, Dedup.signatureOfHashes(sh)) }
      .toDF("doc_id", "ts", "sh", "sig")

    // one-pass native confirm (same expression as the batch path's
    // nearDupBySets — see TextHash.jaccardDistinct)
    val jac = graft.functions.TextOps.jaccardLongSets(col("sh"), col("shb"))
    // candidate pairs dedup BEFORE the confirm join (the streaming twin of
    // the batch path's cand.distinct()): a pair colliding in all 16 bands
    // would otherwise evaluate the O(|sh|) exact Jaccard 16 times
    Dedup.bandsOfSignatures(sigs, carry = Seq("ts", "sh"))
      .join(corpusBands, Seq("band", "bh"))
      .select(col("doc_id"), col("ts"), col("sh"), col("dup_of"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("doc_id", "dup_of")
      .join(corpusSh, Seq("dup_of"))
      // same size-ratio prune as the batch confirm
      .where(least(size(col("sh")), size(col("shb"))).cast("double") >=
        lit(threshold) * greatest(size(col("sh")), size(col("shb"))).cast("double"))
      .withColumn("jac", jac)
      .filter(col("jac") >= threshold)
      .select(col("doc_id"), col("ts"), col("dup_of"), col("jac"))
  }

  /** Streaming curation — the incremental flavor of PipelineOps.curate:
    * normalize + token-gate are stateless per-row maps; exact dedup is the
    * watermark-bounded first-occurrence state (dedupStream). Dedup keeps
    * the FIRST-ARRIVING row per content hash: this matches the batch
    * operator's min-doc_id keepers only when duplicates arrive in separate,
    * doc_id-ordered micro-batches (the case PipelineSpec asserts) —
    * duplicates landing in the SAME micro-batch race across shuffle
    * partitions and `dropDuplicatesWithinWatermark` keeps whichever is
    * processed first, not necessarily the min doc_id. Duplicates farther
    * apart than the watermark need the nightly batch pass, as with
    * dedupStream.
    */
  def curateStream(docs: DataFrame, watermark: String,
                   minToks: Long, maxToks: Long): DataFrame =
    dedupStream(
      docs.withColumn("cleaned", graft.functions.TextOps.cleanText(col("text")))
        .withColumn("toks", graft.functions.TextOps.wsTokenCount(col("text")))
        .filter(col("toks").between(minToks, maxToks)),
      watermark)
      .select(col("doc_id"), col("toks"), col("cleaned"))

  case class PackState(usedToks: Long)
  case class PackDocIn(doc_id: Long, lang: String, shard: Long, toks: Long)
  case class PackAssign(doc_id: Long, lang: String, shard: Long, toks: Long,
                        start_tok: Long, pack_id: Long)

  /** Streaming sequence packer — the incremental flavor of
    * PipelineOps.packAssignments: keyed state per (lang, shard) stream is
    * ONE long (tokens consumed), so state is O(#streams) regardless of
    * corpus size. Docs are assigned to the pack where their first token
    * lands; within a micro-batch rows are ordered by doc_id, so a stream
    * arriving in doc_id order reproduces the batch assignment exactly
    * (asserted in PipelineSpec).
    */
  def packStream(docs: DataFrame, budgetTokens: Long, shards: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val in = docs.select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        graft.functions.TextOps.wsTokenCount(col("text")).as("toks"))
      .as[PackDocIn]
    in.groupByKey(r => (r.lang, r.shard))
      .flatMapGroupsWithState[PackState, PackAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[PackDocIn], state: GroupState[PackState]) =>
          var used = state.getOption.map(_.usedToks).getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            val a = PackAssign(r.doc_id, key._1, key._2, r.toks,
              used, used / budgetTokens)
            used += r.toks
            a
          }
          state.update(PackState(used))
          out.iterator
      }.toDF()
  }

  case class SegState(nextSeg: Long, buf: List[Double])
  case class SegOut(signal_id: Long, seg: Long, values: Seq[Double])
  case class InRow(signal_id: Long, tsMicros: Long, event_id: Long, value: Double)

  /** S2 — fixed-size segmentation with keyed state: buffer per signal,
    * emit a segment every `segRows` values (reference
    * future_signal.rs:186-203). Within a batch, rows are ordered by
    * (ts, event_id) before appending, matching the batch seq_no order.
    */
  def segmentStream(spark: SparkSession, srcDir: String, segRows: Int,
                    maxFilesPerTrigger: Int = 1): DataFrame = {
    import spark.implicits._
    val rs = readingsStream(spark, srcDir, maxFilesPerTrigger)
      .select(col("signal_id"), unix_micros(col("ts")).as("tsMicros"),
        col("event_id"), col("value"))
      .as[InRow]

    rs.groupByKey(_.signal_id)
      .flatMapGroupsWithState[SegState, SegOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[InRow], state: GroupState[SegState]) =>
          val prev = state.getOption.getOrElse(SegState(0L, Nil))
          val incoming = rows.toSeq.sortBy(r => (r.tsMicros, r.event_id)).map(_.value)
          val all = prev.buf ++ incoming
          val full = all.grouped(segRows).toSeq
          val (complete, rest) =
            if (full.nonEmpty && full.last.size < segRows) (full.init, full.last)
            else (full, Nil)
          val out = complete.zipWithIndex.map { case (vs, i) =>
            SegOut(key, prev.nextSeg + i, vs)
          }
          state.update(SegState(prev.nextSeg + complete.size, rest.toList))
          out.iterator
      }.toDF()
  }

  /** Streaming seasonal-anomaly flagging — a STREAM-STATIC broadcast
    * join: arriving readings join the batch-computed per-(signal,
    * hour-of-day) baseline (bounded at signals x 24 rows, so Spark
    * broadcasts it to every executor; no stream-side shuffle, no state)
    * and rows deviating more than 2 sigma from their hour's baseline are
    * emitted immediately. This is the serving shape of
    * ts_seasonal_anomaly: the baseline refreshes on the batch cadence,
    * the flagging happens at ingest latency.
    */
  def anomalyStream(spark: SparkSession, srcDir: String,
                    baselines: DataFrame,
                    maxFilesPerTrigger: Int = 1): DataFrame =
    readingsStream(spark, srcDir, maxFilesPerTrigger)
      .withColumn("hod", hour(col("ts")))
      .join(org.apache.spark.sql.functions.broadcast(baselines),
        Seq("signal_id", "hod"))
      .filter(col("sd_q") > 0.0 &&
        abs(col("value_q").cast("double") - col("mean_q")) >
          lit(2.0) * col("sd_q"))
      .select(col("signal_id"), col("hod"), col("value"),
        round((col("value_q").cast("double") - col("mean_q")) / col("sd_q"), 6)
          .as("z"))

  /** Streaming corpus-quality monitor — per-event-time-window
    * cross-entropy of ARRIVING tokens under the LANDED corpus's add-alpha
    * unigram LM (the CCNet quality signal, served at ingest latency like
    * anomalyStream serves ts_seasonal_anomaly): a rising window xent
    * means the stream is drifting away from the corpus distribution —
    * junk, wrong language, or genuinely new material. Shape: the LM is a
    * static keyed aggregation (stream-static LEFT join, so
    * out-of-vocabulary tokens fall to the smoothing floor instead of
    * dropping); two bounded scalars (total mass, vocab size); one
    * windowed aggregation with watermark-bounded state. Batch parity is
    * exact (StreamingSpec): same fold, same 4-dp contract as text_xent.
    */
  def xentStream(docs: DataFrame, corpus: DataFrame, width: String,
                 watermark: String, alpha: Double = 0.5): DataFrame = {
    // persisted for the same reason as nearDupStream's static frames:
    // the stream-static join would otherwise rebuild the corpus-wide LM
    // aggregation every micro-batch
    val lm = corpus
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("cnt"))
      .persist()
    val st = lm.agg(sum(col("cnt")).as("t"),
      count(lit(1)).cast("double").as("v")).head()
    val (total, vocab) =
      if (st.isNullAt(0)) (0.0, 0.0) else (st.getDouble(0), st.getDouble(1))
    // an empty corpus would make every lp = log(x/0) = ±Infinity and the
    // monitor would emit -Infinity xent silently; fail loudly instead
    require(total > 0.0,
      "xentStream: reference corpus is empty — the n-gram LM needs at " +
        "least one token to define the smoothed denominator")
    docs
      .select(col("ts"),
        explode(graft.functions.TextOps.tokens(col("text"))).as("term"))
      .join(lm, Seq("term"), "left")
      .withColumn("lp", log((coalesce(col("cnt"), lit(0.0)) + lit(alpha)) /
        lit(total + alpha * vocab)))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width))
      .agg(count(lit(1)).as("n_toks"),
        round(-sum(col("lp")) / count(lit(1)), 4).as("xent"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("n_toks"), col("xent"))
  }

  /** Streaming isolation-forest scoring against a FROZEN model — the
    * reference's predict_iforest serving loop (lossyML/src/file_io.rs:419)
    * at ingest latency: segments score the moment they seal. The model
    * (IsolationForest.fit) is driver-local and bounded (≤ trees·2^depth
    * nodes), rides the task closure like a broadcast, and the per-segment
    * walk is pure CPU — no state, no stream-side shuffle beyond
    * segmentStream's own keyed segmentation. PAA-4 features derive from
    * the sealed segment's values with the same fixed-point arithmetic as
    * the batch paaFeatures, so for complete segments the streamed scores
    * equal the batch scores exactly (StreamingSpec).
    */
  def iforestStream(spark: SparkSession, srcDir: String,
                    model: graft.ml.IsolationForest.ForestModel,
                    maxFilesPerTrigger: Int = 1): DataFrame = {
    import spark.implicits._
    segmentStream(spark, srcDir, segRows = 16, maxFilesPerTrigger)
      .as[SegOut]
      .map { s =>
        val feats = s.values.grouped(4).map { ch =>
          val sq = ch.map(v => math.floor(v * 100.0).toLong).sum
          sq.toDouble / (100.0 * ch.size.toDouble)
        }.toArray
        val (ad, ap, sc) = model.score(feats)
        (s.signal_id, s.seg, ad, ap, sc)
      }
      .toDF("signal_id", "seg", "avg_depth", "avg_path", "score")
  }

  /** Streaming MATRIX-PROFILE maintenance — STAMPI at segment granularity
    * folded into the ingest path: every micro-batch of newly sealed
    * segments updates a PERSISTED per-signal profile via
    * MotifDiscord.profileIncrementAuto (cost-routed per signal: exact
    * incremental fold — O(m·δ) cross distances + O(δ²) within-batch for
    * short histories, duplicate-collapsed rep pairs past the size
    * threshold — wherever the routePlan pair budget allows; the
    * incremental SAMPLED upper bound, O(m·δ/mod) per batch, for signals
    * whose histories are inherently dense, with the per-signal `exact`
    * flag carried into the snapshot), so discord/motif serving reads a
    * profile that is exact as of the last sealed segment wherever
    * exactness is affordable, and a flagged anytime bound where it is
    * not. This is the
    * reference's ingest-time outlier concern (future_signal.rs +
    * outlier/mod.rs) served continuously, the way iforestStream serves
    * the frozen forest.
    *
    * Persistence layout under `workDir`:
    *  - `segs/batch=<id>/`    — sealed segments (qvals), partitioned by
    *    micro-batch; dynamic-partition overwrite keyed by batch id, so a
    *    replayed batch replaces its own rows (tier0Writer's idempotence
    *    discipline);
    *  - `profile/batch=<id>/` — the FULL updated profile after batch
    *    <id> (signal_id, seg, nnd_q, exact); each batch writes its own
    *    versioned snapshot, so readers
    *    ([[readProfile]]) always see a consistent profile and a replayed
    *    batch rewrites an identical snapshot. Prior state is the newest
    *    snapshot with id < current, so a crash between the two writes
    *    replays cleanly;
    *  - `state/batch=<id>/` — the folded ROUTE-PLAN state (one
    *    kind-tagged table: per-signal m/t/last-segment/exact/ordered +
    *    this batch's route flags; per-distinct-vector hash group counts
    *    + first-chunk sums), same versioning discipline. This is what
    *    makes the per-batch plan O(δ + |state|): the route decision
    *    folds from it instead of re-deriving rank windows / adjacency
    *    joins / chunk sums over the full history every micro-batch (the
    *    r11 scale defect). A work dir from before this layout falls back
    *    to a one-time batch derivation from the landed segments.
    *
    * Profile and state snapshots older than `retainSnapshots` batches
    * are deleted after each batch's writes commit (retention >= 1 keeps
    * the replay invariant: prior = newest snapshot < batchId) — a
    * long-lived stream would otherwise leak one O(m)-sized snapshot
    * directory per micro-batch forever. The segment store is never
    * pruned; it is the data, not a derived view. retainSnapshots <= 0
    * disables pruning.
    *
    * Exactness: profileIncrement over disjoint batches equals the batch
    * profile over the union (MotifDiscordSpec); segment ids from
    * segmentStream are per-signal monotone, so batches never overlap.
    * StreamingSpec proves the final streamed profile equals
    * MotifDiscord.profile over all complete segments on budget-clean
    * data, and equals MotifDiscord.profileAuto (the sampled bound,
    * exact=false) on a dense signal streamed under a tight budget.
    *
    * 100 TB shape: the per-batch work is one keyed join of the landed
    * segment store against the δ new segments plus a δ² self-join —
    * both partition-parallel; profile snapshots are one row per segment
    * (compact); nothing collects on the driver.
    *
    * Per-batch job ladder (r16): δ materializes once (JOB 1, the only
    * action on the stream-side lineage) + one tiny δ sizing agg; the
    * route-state fold writes its snapshot DIRECTLY to parquet with the
    * probe aggregates riding the write via observe() — no state
    * localCheckpoint (nothing data-sized pinned in executor storage) and
    * no separate probe job; and when the carried driver scalars certify
    * the fast lane (skipGrid + all sig rows exact), the profile fold
    * provably needs neither the folded state nor the probe and runs
    * CONCURRENTLY with the state write. Snapshot ids and the certificate
    * scalars are carried in-memory across contiguous batches (listed /
    * recovered once per JVM; every carried value advances only after the
    * batch's writes commit, so same-JVM replays and fresh-JVM restarts
    * both re-derive from the persisted truth).
    *
    * Every `rebuildEvery` micro-batches the route state is NOT folded
    * but rebuilt from the landed segment store under a fresh group-hash
    * salt (MotifDiscord.routeStateOf; r13 verdict #3): the landed
    * segments retain full vector fidelity, so the rebuild discards any
    * drift the folded state accumulated — a sticky 64-bit hash collision
    * (re-keyed by the new salt), a latched `ordered` flag after an
    * out-of-order append, or a min-merged s0 — restoring exact
    * fold-vs-batch route equality. The rebuild batch pays one O(m) pass
    * (the same cost as the first batch of a restarted stream); amortized
    * over the period it adds O(m / rebuildEvery) per batch, which for
    * the default 64 is far below the fold's own O(δ + |state|).
    * rebuildEvery <= 0 disables it.
    */
  def profileStream(spark: SparkSession, srcDir: String, workDir: String,
                    segRows: Int = 16,
                    maxFilesPerTrigger: Int = 1,
                    budget: Long = graft.operators.MotifDiscord.RouteBudget,
                    mod: Int = 4,
                    retainSnapshots: Int = 8,
                    rebuildEvery: Int = 64): StreamingQuery = {
    val segsDir = s"$workDir/segs"
    val profDir = s"$workDir/profile"
    val stateDir = s"$workDir/state"
    // query-lifetime upper bound on the per-signal segment count (m),
    // carried across micro-batches so each batch can certify the
    // foldRouteState skipGrid hint (prior max m + δ rows <= PruneAbove
    // => no signal can cross the grid threshold this batch) without an
    // extra aggregation over the state. -1 = derive once from the prior
    // state at (re)start; batch replays only ever see a LARGER bound,
    // which is conservative (the grid runs when it might not need to).
    var maxMAll = -1L
    // group-hash salt of the persisted route state (MotifDiscord
    // .groupHash): -1 = recover from the prior snapshot at (re)start
    // (null column on a pre-salt snapshot -> 0, the unsalted hash).
    // Advanced to the batch id whenever the state is rebuilt from the
    // landed segments, so rebuilt group identities are freshly keyed.
    var stateSalt = -1L
    // min(exact) over ALL sig rows of the newest persisted state — the
    // second half of the fast-lane certificate (see the batch body).
    // Meaningful only once maxMAll >= 0; maintained from the state
    // write's observed metrics, recovered alongside maxMAll at (re)start.
    var allExactAll = true
    // landed/persisted snapshot ids, listed ONCE per JVM and maintained
    // incrementally — a long-lived stream otherwise pays 3 directory
    // listings per micro-batch (pure driver latency locally, multi-RPC
    // latency on an object store). Updated only AFTER a batch's writes
    // commit, so a same-JVM replay of batch N still selects batch N-1's
    // snapshots; a fresh JVM re-lists.
    var knownSegs: Option[scala.collection.mutable.TreeSet[Long]] = None
    var knownProf: Option[scala.collection.mutable.TreeSet[Long]] = None
    var knownState: Option[scala.collection.mutable.TreeSet[Long]] = None
    segmentStream(spark, srcDir, segRows, maxFilesPerTrigger)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // everything below runs as BATCH jobs on the OUTER session, not
        // the micro-batch session clone: MicroBatchExecution force-
        // disables AQE on its clone (stateful-op limitation), which
        // would pin every one of this fold's shuffles to the static
        // partition count regardless of δ — dozens of near-empty-task
        // stages per batch on a small δ, and no skew/coalesce handling
        // at scale. The stream-side plan (segmentStream) still executes
        // on the clone when JOB 1 below lands δ; everything downstream
        // re-reads that landed parquet through the outer session.
        val s = spark
        import s.implicits._
        import graft.operators.MotifDiscord
        // per-phase wall-clock attribution, stderr-only and off by
        // default: the per-batch cost at tiny δ is stage-count-bound,
        // and optimizing it blind is guesswork
        val dbg = sys.env.contains("SPARK_GRAFT_PROFILE_DEBUG")
        var t0 = System.nanoTime()
        def lap(phase: String): Unit = if (dbg) {
          val t1 = System.nanoTime()
          System.err.println(
            f"[profileStream] batch $batchId $phase ${(t1 - t0) / 1e9}%.3fs")
          t0 = t1
        }
        // JOB 1 — materialize δ (same fixed-point mapping as the batch
        // Segments.completeQuantized). The localCheckpoint is the ONLY
        // action on the stream-side lineage, so the stateful
        // segmentation executes exactly once per trigger; the
        // checkpointed rows are re-bound to the outer session, and the
        // segment-store append runs CONCURRENTLY with the route-state
        // fold below (both consume the materialized δ, neither depends
        // on the other)
        val newSegsClone = batch
          .withColumn("qvals",
            transform(col("values"), v => floor(v * lit(100)).cast("long")))
          .select(col("signal_id"), col("seg"), col("qvals"))
          .localCheckpoint()
        val newSegs =
          s.createDataFrame(newSegsClone.rdd, newSegsClone.schema)
        lap("delta-ckpt")
        // one tiny agg over the checkpointed δ blocks feeds two driver
        // decisions: the per-SIGNAL max count certifies the skipGrid
        // hint below, and the total row count sizes the landing write —
        // a tiny δ written at the stream's full shuffle width lands 32
        // near-empty files per batch dir and every later batch re-pays
        // their listing+footer cost when it re-reads history, while a
        // bulk δ keeps its width (≈64k segment rows ≈ 10 MB per file)
        val dRow = newSegs.groupBy(col("signal_id"))
          .agg(count(lit(1)).as("c"))
          .agg(max(col("c")), sum(col("c"))).first()
        val maxDeltaPerSig = if (dRow.isNullAt(0)) 0L else dRow.getLong(0)
        val deltaRows = if (dRow.isNullAt(1)) 0L else dRow.getLong(1)
        val segFiles = math.max(1L, math.min(
          newSegsClone.rdd.getNumPartitions.toLong,
          (deltaRows + 65535L) / 65536L)).toInt
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val segsWrite = Future {
          newSegs.coalesce(segFiles).withColumn("batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(segsDir)
        }
        // every background write below is tracked here and awaited before
        // the batch function returns OR rethrows: if the profile fold or
        // write throws while a future is still writing, foreachBatch
        // would otherwise propagate immediately and an in-JVM restart's
        // replay could overwrite segs/state/batch=<id> WHILE the zombie
        // write is still appending to the same directory — a mixed
        // snapshot. On a failure path the futures' own errors are
        // swallowed (the primary failure propagates); on the success path
        // a failed future fails the batch.
        val inFlight = scala.collection.mutable.ListBuffer[Future[Unit]](
          segsWrite.map(_ => ()))
        // resolve the FS from the workDir path itself — FileSystem.get
        // returns the DEFAULT fs, which is the wrong one whenever the
        // workDir's scheme differs (e.g. local workDir under an HDFS
        // default), silently treating prior snapshots as absent
        val fs = new org.apache.hadoop.fs.Path(workDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        def snapshots(dir: String): Seq[Long] = {
          val p = new org.apache.hadoop.fs.Path(dir)
          if (!fs.exists(p)) Seq.empty
          else fs.listStatus(p).toSeq.map(_.getPath.getName)
            .filter(_.startsWith("batch="))
            .map(_.stripPrefix("batch=").toLong)
        }
        import scala.collection.mutable.TreeSet
        if (knownSegs.isEmpty) knownSegs = Some(TreeSet(snapshots(segsDir): _*))
        if (knownProf.isEmpty) knownProf = Some(TreeSet(snapshots(profDir): _*))
        if (knownState.isEmpty)
          knownState = Some(TreeSet(snapshots(stateDir): _*))
        // all snapshot reads use the KNOWN static schemas — a per-batch
        // footer/schema-inference pass per directory is pure driver
        // latency the fold doesn't need
        val prior = knownProf.get.filter(_ < batchId).toSeq
        // a work dir written before the routed increment carries
        // 3-column snapshots (no exact flag): the static schema reads the
        // missing column as null, and those folds were all exact
        val existingProfile = prior.sorted.lastOption match {
          case Some(pb) => s.read.schema(ProfSnapshotSchema)
            .parquet(s"$profDir/batch=$pb")
            .withColumn("exact", coalesce(col("exact"), lit(true)))
          case None => Seq.empty[(Long, Long, Long, Boolean)]
            .toDF("signal_id", "seg", "nnd_q", "exact")
        }
        // read history from the PRIOR batch dirs listed explicitly: the
        // whole-directory read would list segsDir while the concurrent
        // δ append is mid-write
        val priorSegDirs = knownSegs.get.filter(_ < batchId).toSeq.sorted
          .map(b => s"$segsDir/batch=$b")
        val existingSegs =
          if (priorSegDirs.nonEmpty)
            s.read.schema(SegSnapshotSchema).parquet(priorSegDirs: _*)
          else Seq.empty[(Long, Long, Seq[Long])]
            .toDF("signal_id", "seg", "qvals")
        // prior route state (newest snapshot before this batch); absent —
        // first batch, or a pre-routed-state work dir — derive it from
        // the landed history once. Every rebuildEvery batches the fold
        // is bypassed deliberately: rebuild from the landed segments
        // under a FRESH salt (see the class doc's healing paragraph).
        // Replay-safe: a replayed rebuild batch re-derives the same
        // salt (= batchId), so the rewritten snapshot is identical.
        val statePrior = knownState.get.filter(_ < batchId).toSeq
        val doRebuild = rebuildEvery > 0 && batchId > 0 &&
          batchId % rebuildEvery == 0
        // one recovery aggregation per (re)start when a prior state
        // exists: salt, the global max per-signal count, and the
        // all-sig-rows-exact flag — all three carried in-memory across
        // contiguous batches thereafter (the state write's observed
        // metrics refresh the latter two each batch)
        def recoverScalars(st: DataFrame): Unit =
          if (stateSalt < 0L || maxMAll < 0L) {
            val r = st.agg(max(col("salt")),
              max(when(col("kind") === "sig", col("m"))),
              min(when(col("kind") === "sig", col("exact").cast("long"))))
              .first()
            if (stateSalt < 0L)
              stateSalt = if (r.isNullAt(0)) 0L else r.getLong(0)
            maxMAll = if (r.isNullAt(1)) 0L else r.getLong(1)
            allExactAll = r.isNullAt(2) || r.getLong(2) == 1L
          }
        val priorState = statePrior.sorted.lastOption match {
          case Some(pb) if !doRebuild =>
            val st = s.read.schema(RouteStateSchema)
              .parquet(s"$stateDir/batch=$pb")
            recoverScalars(st)
            st
          case _ =>
            stateSalt = batchId
            if (dbg && doRebuild) System.err.println(
              s"[profileStream] batch $batchId: periodic route-state " +
                s"rebuild from landed segments (salt=$stateSalt)")
            val derived = MotifDiscord.routeStateOf(existingSegs,
              existingProfile, stateSalt)
            if (maxMAll < 0L) {
              // fresh JVM straight onto a rebuild boundary (or the very
              // first batch): with no landed history the scalars are the
              // empty-state literals; otherwise pay the recovery agg on
              // the derived frame (rare — once per JVM at most)
              if (priorSegDirs.isEmpty) { maxMAll = 0L; allExactAll = true }
              else recoverScalars(derived)
            }
            derived
        }
        lap("snapshot-setup")
        val stateOut = s"$stateDir/batch=$batchId"
        val obs = org.apache.spark.sql.Observation(
          s"profile-probe-$batchId-${System.nanoTime()}")
        try {
          // per-SIGNAL δ bound (the grid threshold is per signal, so the
          // total δ row count would never certify the skip on a wide
          // fleet); computed by the landing-write sizing agg above
          val skipGrid =
            maxMAll + maxDeltaPerSig <= MotifDiscord.PruneAbove.toLong
          // FAST-LANE certificate, decided entirely on the driver from
          // carried scalars: skipGrid proves every touched signal's
          // folded m stays on the member route (<= PruneAbove => the fold
          // sets dense=false, no rep threshold applies), and allExactAll
          // (min exact over ALL sig rows, observed off the previous state
          // write) makes the output's exact column the literal true —
          // exactly the conditions routedProfileFrom's probe-fast path
          // would derive AFTER the fold. Under the certificate the
          // profile fold provably reads neither the folded state nor its
          // probe, so it runs CONCURRENTLY with the state write instead
          // of behind it; any batch that can't certify (first contact
          // with a dense signal, a sampled-history signal, a restart
          // before recovery) takes the general probe-gated path below.
          val fastLane = skipGrid && allExactAll
          if (dbg) System.err.println(s"[profileStream] batch $batchId " +
            s"skipGrid=$skipGrid fastLane=$fastLane maxMAll=$maxMAll " +
            s"maxDeltaPerSig=$maxDeltaPerSig")
          // JOB 2 — fold δ into the route state and write the snapshot
          // DIRECTLY to parquet: one job instead of the former eager
          // localCheckpoint + async copy-out pair, and no data-sized
          // blocks pinned in non-replicated executor storage (the
          // 100 TB-safe shape — same discipline as Materialize.shared's
          // staged path). The probe aggregates ride the write via
          // observe(), so the probe costs zero extra jobs; consumers
          // that need the materialized state re-read the just-written
          // snapshot (one small file at steady state).
          val statePlan = MotifDiscord.foldRouteState(priorState, newSegs,
            budget, MotifDiscord.PruneAbove, skipGrid, stateSalt)
          val probeCols = MotifDiscord.probeMetricCols
          val stateWrite = Future {
            statePlan.observe(obs, probeCols.head, probeCols.tail: _*)
              .write.mode("overwrite").parquet(stateOut)
          }
          inFlight += stateWrite
          val profilePlan =
            if (fastLane)
              MotifDiscord.memberProfileIncrement(existingSegs,
                existingProfile.select(col("signal_id"), col("seg"),
                  col("nnd_q")),
                newSegs).withColumn("exact", lit(true))
            else {
              // general path: the fold must land first — the probe and
              // the per-signal flag joins read the materialized state
              Await.result(stateWrite, Duration.Inf)
              lap("state-fold")
              val (probe, _) = MotifDiscord.probeFromMetrics(obs.get)
              val stateM = s.read.schema(RouteStateSchema).parquet(stateOut)
              MotifDiscord.routedProfileFrom(existingSegs, existingProfile,
                newSegs, stateM, probe, mod)
            }
          profilePlan.write.mode("overwrite")
            .parquet(s"$profDir/batch=$batchId")
          lap("profile-fold-write")
        } catch { case t: Throwable =>
          inFlight.toList.foreach(f =>
            scala.util.Try(Await.result(f, Duration.Inf)))
          throw t
        }
        inFlight.toList.foreach(f => Await.result(f, Duration.Inf))
        // the observed probe is final once the state write landed:
        // refresh the carried certificate scalars and surface order
        // violations (the general path already read the same metrics)
        val (probeFinal, exactAllNext) =
          MotifDiscord.probeFromMetrics(obs.get)
        maxMAll = math.max(maxMAll, probeFinal.maxMTouched)
        allExactAll = exactAllNext
        if (probeFinal.unordered > 0)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"profileStream batch $batchId: out-of-order append detected; " +
              "routed profile equality degrades to an upper bound " +
              "for the affected signals")
        knownSegs.foreach(_ += batchId)
        knownProf.foreach(_ += batchId)
        knownState.foreach(_ += batchId)
        // bounded snapshot RETENTION: profile/state are full snapshots
        // per batch, so without pruning a long-lived stream leaks one
        // O(m)-sized directory per micro-batch forever. Only snapshots
        // older than (current - retainSnapshots) go — replay needs the
        // newest snapshot < batchId, which retention >= 1 preserves, and
        // the prune runs strictly AFTER this batch's writes committed,
        // so a crash mid-prune replays against intact newer snapshots.
        // The segment store is NOT pruned: it is the data, not a view.
        if (retainSnapshots > 0) {
          val cutoff = batchId - retainSnapshots.toLong
          for ((dir, known) <- Seq(profDir -> knownProf,
                 stateDir -> knownState);
               set <- known; b <- set.toSeq if b < cutoff)
            try {
              fs.delete(new org.apache.hadoop.fs.Path(s"$dir/batch=$b"), true)
              set -= b
            } catch { case _: Throwable => () } // retry next batch
        }
        lap("await-bg-writes")
      }
      .start()
  }

  /** The newest COMMITTED profile snapshot written by [[profileStream]].
    * Only batch dirs whose job commit marker (_SUCCESS) exists qualify:
    * a continuous deployment may call this while the stream is mid-write
    * of batch=N, and selecting that dir would read a partial (or
    * unreadable) snapshot. The FS is resolved from the workDir path, not
    * the default filesystem, so mixed-scheme deployments list correctly.
    */
  def readProfile(spark: SparkSession, workDir: String): DataFrame = {
    val profDir = s"$workDir/profile"
    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = fs.listStatus(new org.apache.hadoop.fs.Path(profDir)).toSeq
      .map(_.getPath)
      .filter(d => d.getName.startsWith("batch=") &&
        fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
      .map(_.getName.stripPrefix("batch=").toLong)
    require(ids.nonEmpty, s"no committed profile snapshots under $profDir")
    spark.read.parquet(s"$profDir/batch=${ids.max}")
  }

  /** Streaming twin of the recoding bandit's reward job
    * (ml.Bandit.recodeRewardInputs): every COMPLETED segment emits its
    * per-arm reward row as it closes — the shape in which the reference
    * daemons consume segments (a recoding decision becomes possible the
    * moment a segment is sealed, not at the next batch pass). Rides
    * segmentStream's keyed state; the error fold is the same pure
    * function as the batch job, so stream rows equal the batch rows for
    * complete segments exactly (parity in StreamingSpec).
    */
  def rewardStream(spark: SparkSession, srcDir: String, segRows: Int,
                   maxFilesPerTrigger: Int = 1): DataFrame = {
    import spark.implicits._
    val raw = segmentStream(spark, srcDir, segRows, maxFilesPerTrigger)
      .as[SegOut]
      .map { s =>
        val rows = s.values.toArray.zipWithIndex.map { case (v, i) =>
          // global seq_no and the Quantize.quantize fixed-point mapping
          (s.seg * segRows + i + 1L, v, math.floor(v * 100.0).toLong)
        }
        val (e2, e4, er, ed, ep, ef, nd) = graft.ml.Bandit.segmentErrors(rows)
        (s.signal_id, s.seg, e2, e4, er, ed, ep, ef, nd)
      }
      .toDF("signal_id", "seg", "e2", "e4", "er", "ed", "ep", "ef", "nd")
    graft.ml.Bandit.rewardSelect(raw)
  }

  /** The streaming policy daemon, wired END TO END: sealed segments ->
    * per-arm rewards (rewardStream, distributed) -> one e-greedy
    * decision per segment with the Q vector carried ACROSS micro-batches
    * -> decisions landed as parquet for TierManager.applyPaaDecisions to
    * act on. This is the reference recoding daemon's continuous loop
    * (MABrecoding_daemon.rs:110-139: consume sealed segments forever,
    * update the policy, emit recode choices).
    *
    * Semantics and bounds:
    *  - decision order is ARRIVAL order, (signal_id, seg)-sorted within
    *    each micro-batch — the daemon's own semantics (segments are
    *    decided as they seal). Parity with the batch replay
    *    (Bandit.recodeReplay) is exact when segments arrive in global
    *    (signal_id, seg) order, e.g. a single-batch replay
    *    (StreamingSpec asserts this);
    *  - the per-batch fold materializes only the MICRO-BATCH's reward
    *    rows on the driver (bounded by maxFilesPerTrigger), never the
    *    stream;
    *  - crash safety: decisions write first (dynamic-partition overwrite
    *    keyed by batch_id — replays overwrite, never duplicate), the
    *    post-batch Q state appends second, keyed by batch_id. A crash
    *    between the two replays the batch from the pre-batch Q and
    *    rewrites identical decisions; a crash after both replays the
    *    batch as a no-op (its state row already exists).
    */
  def policyStream(spark: SparkSession, srcDir: String, segRows: Int,
                   decisionsDir: String, checkpointDir: String,
                   maxFilesPerTrigger: Int = 1): StreamingQuery = {
    import spark.implicits._
    val arms = graft.ml.Bandit.RecodeArms
    val stateDir = s"$decisionsDir.qstate"
    // restore the newest persisted state (restart continues the walk)
    var (lastBatch, q, step) =
      try {
        val rows = spark.read.parquet(stateDir)
          .orderBy(col("batch_id").desc).limit(1).collect()
        if (rows.isEmpty) (-1L, Array.fill(arms.length)(graft.ml.Bandit.Q0), 0L)
        else (rows(0).getAs[Long]("batch_id"),
          rows(0).getAs[Seq[Double]]("q").toArray,
          rows(0).getAs[Long]("step"))
      } catch { case _: Throwable =>
        (-1L, Array.fill(arms.length)(graft.ml.Bandit.Q0), 0L)
      }
    rewardStream(spark, srcDir, segRows, maxFilesPerTrigger)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastBatch) {
          // bounded by the micro-batch (trigger-capped), not the stream
          val rows = batch.orderBy("signal_id", "seg").collect()
          val decided = rows.map { r =>
            step += 1
            val rewards = Array(r.getDouble(2), r.getDouble(3),
              r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
              r.getDouble(8))
            val (arm, explored, rew, qAfter) =
              graft.ml.Bandit.policyStep(q, step, rewards, arms)
            (r.getLong(0), r.getLong(1), step, arm, explored, rew, qAfter)
          }
          decided.toSeq
            .toDF("signal_id", "seg", "step", "codec", "explored",
              "reward_raw", "q_raw")
            .select(col("signal_id"), col("seg"), col("step"), col("codec"),
              col("explored"), round(col("reward_raw"), 6).as("reward"),
              round(col("q_raw"), 6).as("q_after"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(decisionsDir)
          Seq((batchId, q.toSeq, step)).toDF("batch_id", "q", "step")
            .write.mode("append").parquet(stateDir)
          lastBatch = batchId
        }
      }
      .start()
  }
}
