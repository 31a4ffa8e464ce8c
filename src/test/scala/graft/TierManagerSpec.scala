package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Readings, TierManager, Tiers}
import graft.sources.CodecStore

/** S6 — tier lifecycle: land -> age to quantized -> age to PAA, with the
  * zone-map registered per tier; plus the storage-codec CR matrix.
  */
class TierManagerSpec extends AnyFunSuite with SparkTest {

  test("tier ladder: land, compact, and answer from each tier") {
    val root = Files.createTempDirectory("graft-tiers").toString
    val tm = new TierManager(spark, root)
    val r = Readings.of(spark, "/root/testdata/sf0.001")
    tm.landTier0(r)

    val t0 = spark.read.parquet(tm.tier0)
    assert(t0.count() == r.count())
    // partition layout present for pruning
    assert(new java.io.File(tm.tier0).listFiles().exists(_.getName.startsWith("sig_bucket=")))

    val cutoff = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val movedQ = tm.compactToQuantized(cutoff)
    assert(movedQ > 0 && movedQ < r.count())
    val t1 = spark.read.parquet(tm.tier1)
    assert(t1.columns.contains("value_q") && !t1.columns.contains("value"))
    assert(t1.count() == movedQ)
    // tier1 zone map registered and consistent: stats-only max equals the
    // dequantized data max at this tier
    val t1Stats = spark.read.parquet(s"${tm.tier1}.stats")
    val statsMax = graft.plans.ZoneMap.maxFromStats(t1Stats).collect()(0).getDouble(0)
    val dataMax = t1.agg(max(col("value_q").cast("double") / 100.0))
      .collect()(0).getDouble(0)
    assert(statsMax == dataMax)

    val movedP = tm.compactToPaa(w = 4, targetCr = 0.5)
    assert(movedP > 0 && movedP < movedQ) // PAA shrinks row count ~4x
    val paaMax = tm.maxFromColdTier().agg(max(col("paa_max"))).collect()(0).getDouble(0)
    val trueMax = r.filter(col("ts") < lit(cutoff))
      .agg(max(col("value"))).collect()(0).getDouble(0)
    assert(paaMax <= trueMax + 1e-9) // chunk means never exceed the true max

    // the next ladder pass: tier2 chunks merge pairwise into tier3 (CR
    // guard 0.6 admits full segments, whose halving CR is 0.5)
    val movedP2 = tm.compactToPaa2(w = 4, targetCr = 0.6)
    assert(movedP2 > 0 && movedP2 < movedP) // each pass keeps shrinking
    val t3 = spark.read.parquet(tm.tier3)
    // re-recode from exact sums == direct PAA at the doubled width: every
    // tier3 chunk's (sq, cnt) must equal the pairwise sum of its tier2 pair
    val t2 = spark.read.parquet(tm.tier2)
    val direct = t2.groupBy(col("signal_id"),
        floor(col("chunk") / 2.0).cast("long").as("chunk"))
      .agg(sum(col("sq")).cast("long").as("sq"),
           sum(col("cnt")).cast("long").as("cnt"))
    val joined = t3.select(col("signal_id"), col("chunk"), col("sq"), col("cnt"))
      .join(direct, Seq("signal_id", "chunk", "sq", "cnt"), "left_semi")
    assert(joined.count() == t3.count(), "tier3 diverges from exact pairwise merge")
    val paa2Max = tm.maxFromTier3().agg(max(col("paa_max"))).collect()(0).getDouble(0)
    assert(paa2Max <= paaMax + 1e-9) // coarser means never exceed finer means

    // the BUFF-lossy flavor of aging: drop 8 low fixed-point bits in place
    val movedL = tm.compactQuantizedDropBits(bits = 8)
    assert(movedL == movedQ) // map-only rewrite: every tier1 row survives
    val lossy = spark.read.parquet(tm.tier1Lossy)
    assert(lossy.filter(col("value_q") % 256 =!= 0).count() == 0,
      "low bits not zeroed")
    // error bound: |q - q_dropped| < 2^8 fixed-point units per row
    val maxErr = t1.select(col("signal_id"), col("seq_no"), col("value_q"))
      .join(lossy.withColumnRenamed("value_q", "q_lossy"),
        Seq("signal_id", "seq_no"))
      .agg(max(abs(col("value_q") - col("q_lossy")))).collect()(0).getLong(0)
    assert(maxErr < 256, s"drop-bits error $maxErr out of bound")
  }

  test("correction upsert: merge wins, bounded rewrite, stats patched, idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-upsert").toString
    val tm = new TierManager(spark, root)
    val r = Readings.of(spark, "/root/testdata/sf0.001")
    tm.landTier0(r)
    val untouchedBucket = new java.io.File(s"${tm.tier0}/sig_bucket=5")
    val before = untouchedBucket.listFiles().map(f => f.getName -> f.lastModified).toMap

    // one UPDATE (signal 1, seq 1 -> value 999.99) and one late INSERT
    // (signal 33, far-future seq) — both land in sig_bucket=1
    val ts0 = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    val corr = Seq(
      (1L, ts0, 999.99, 99999L, 1L),
      (33L, ts0, 123.45, 12345L, 1000L)
    ).toDF("signal_id", "ts", "value", "value_q", "seq_no")
    val n = tm.upsertCorrections(corr)
    assert(n == 2L)

    val t0 = spark.read.parquet(tm.tier0)
    assert(t0.filter(col("signal_id") === 1L && col("seq_no") === 1L)
      .select(col("value")).collect()(0).getDouble(0) == 999.99)
    assert(t0.filter(col("signal_id") === 33L && col("seq_no") === 1000L).count() == 1L)
    assert(t0.count() == r.count() + 1) // one insert, no dup for the update

    // untouched partition not rewritten
    val after = untouchedBucket.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after == before, "untouched sig_bucket=5 was rewritten")

    // zone map patched: signal 1's segment-0 max reflects the correction
    val st = spark.read.parquet(s"${tm.tier0}.stats")
    val s1max = st.filter(col("signal_id") === 1L && col("seg") === 0L)
      .select(col("vmax")).collect()(0).getDouble(0)
    assert(s1max == 999.99, s"stats not patched: vmax $s1max")

    // idempotent: re-applying the same corrections changes nothing
    tm.upsertCorrections(corr)
    assert(spark.read.parquet(tm.tier0).count() == r.count() + 1)

    // within-batch contract: byte-identical resends collapse to one row;
    // CONFLICTING rows for one (signal_id, seq_no) have no defined winner
    // and must fail loudly, not land both
    val resend = corr.unionByName(corr)
    tm.upsertCorrections(resend) // no error, still no dup
    assert(spark.read.parquet(tm.tier0).count() == r.count() + 1)
    val conflict = Seq(
      (1L, ts0, 111.11, 11111L, 1L),
      (1L, ts0, 222.22, 22222L, 1L)
    ).toDF("signal_id", "ts", "value", "value_q", "seq_no")
    val err = intercept[IllegalArgumentException] {
      tm.upsertCorrections(conflict)
    }
    assert(err.getMessage.contains("conflicting correction rows"))
  }

  test("LRU byte-budget plan: partition of segments, budget held, apply is lossless") {
    val root = Files.createTempDirectory("graft-lru").toString
    val tm = new TierManager(spark, root)
    val r = Readings.of(spark, "/root/testdata/sf0.001")
    val budget = 3000L
    val plan = Tiers.lruPlan(r, 4, budgetBytes = budget, errBudget = 80.0)
      .localCheckpoint()

    // the decision table covers every segment exactly once
    val nSegs = r.groupBy(col("signal_id"),
      Readings.segmentId(col("seq_no"))).count().count()
    assert(plan.count() == nSegs)
    assert(plan.groupBy(col("signal_id"), col("seg")).count()
      .filter(col("count") > 1).count() == 0L)

    // kept segments fit the byte budget, and the hottest segment is kept
    val keptBytes = plan.filter(col("action") === "keep")
      .agg(sum(col("bytes_raw"))).first().getLong(0)
    assert(keptBytes <= budget, s"kept $keptBytes > budget $budget")
    val hottest = plan.orderBy(col("last_us").desc, col("signal_id"),
      col("seg")).first()
    assert(hottest.getString(hottest.fieldIndex("action")) == "keep")
    // cum_bytes is a true prefix sum: max(cum) == sum(bytes_raw)
    val agg = plan.agg(max(col("cum_bytes")), sum(col("bytes_raw"))).first()
    assert(agg.getLong(0) == agg.getLong(1))

    // plan shape of the distributed prefix sum: the per-partition cumsum
    // window is keyed by pid (never a global single-partition window over
    // the stats); the ONE unpartitioned window folds only the
    // #partitions-row offsets table; offsets come back via broadcast
    {
      import org.apache.spark.sql.execution.window.WindowExec
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
      val helper = new AdaptiveSparkPlanHelper {}
      // a fresh (un-checkpointed) instance: the outer localCheckpoint in
      // `plan` above hides the query tree behind an RDD scan
      val p = Tiers.lruPlan(r, 4, budgetBytes = budget, errBudget = 80.0)
        .queryExecution.executedPlan
      val wins = helper.collect(p) { case w: WindowExec => w }
      assert(wins.nonEmpty, "prefix-sum windows missing from the plan")
      val global = wins.filter(_.partitionSpec.isEmpty)
      assert(global.size <= 1,
        s"${global.size} unpartitioned windows — stats must never globally sort")
      assert(helper.collect(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
        "offsets lost their broadcast join")
    }

    // applying the plan is lossless: hot+cold raw sums plus the PAA
    // tier's EXACT chunk sums reconstruct the full fixed-point sum
    tm.applyLruPlan(r, plan, 4)
    val hotCold = spark.read.parquet(s"$root/hot")
      .unionByName(spark.read.parquet(s"$root/cold"))
      .agg(sum(col("value_q"))).first().getLong(0)
    val paaSum = spark.read.parquet(s"$root/paa")
      .agg(sum(col("sq"))).first().getLong(0)
    val total = r.agg(sum(col("value_q"))).first().getLong(0)
    assert(hotCold + paaSum == total)
  }

  test("cold-tier sum serving is exact: chunk sums equal raw fixed-point sums") {
    val r = Readings.of(spark, "/root/testdata/sf0.001")
    val served = TierManager.sumFromChunks(graft.operators.Tiers.paaChunks(r, 4))
      .select(col("signal_id"), col("sum_q"), col("cnt"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val raw = r.groupBy(col("signal_id"))
      .agg(sum(col("value_q")).cast("long").as("s"), count(lit(1)).as("c"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(served == raw, "cold-tier sum diverges from raw sum")
  }

  test("feedback policy: high-error segments are not demoted") {
    val root = Files.createTempDirectory("graft-tiers-fb").toString
    val tm = new TierManager(spark, root)
    val r = Readings.of(spark, "/root/testdata/sf0.001")
    tm.landTier0(r)
    tm.compactToQuantized(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))

    val t1 = spark.read.parquet(tm.tier1)
      .withColumn("value", col("value_q").cast("double") / 100.0)
    val plan = graft.operators.Tiers.recodePlanWithFeedback(t1, 4, 0.5, errBudget = 80.0)
    val vetoed = plan.filter(col("cr_ok") && !col("recode"))
      .select(col("signal_id"), col("seg"))
    val approved = plan.filter(col("recode")).select(col("signal_id"), col("seg"))
    // the budget splits this corpus: both outcomes must occur for the
    // assertions below to mean anything
    assert(vetoed.count() > 0 && approved.count() > 0)

    tm.compactToPaaWithFeedback(4, 0.5, errBudget = 80.0)
    val t2segs = spark.read.parquet(tm.tier2)
      .select(col("signal_id"),
        floor(col("chunk") * 4.0 / 16.0).cast("long").as("seg"))
      .distinct()
    // no high-error segment was rewritten, every approved one was
    assert(t2segs.join(vetoed, Seq("signal_id", "seg"), "left_semi").count() == 0,
      "a high-error segment was demoted despite the feedback veto")
    assert(approved.join(t2segs, Seq("signal_id", "seg"), "left_semi").count()
      == approved.count(), "an approved segment is missing from tier2")
  }

  test("positional windows read persisted seq_no with scan pushdown (production path)") {
    val root = Files.createTempDirectory("graft-tier-seq").toString
    val tm = new TierManager(spark, root)
    val r = Readings.of(spark, "/root/testdata/sf0.001")
    tm.landTier0(r)
    val persisted = spark.read.parquet(tm.tier0)
    // the Influx positional window query against the STORED seq_no
    val fromTier = graft.operators.TsQuery
      .windowMaxPositional(persisted.filter(col("signal_id") === 7), 8L, 48L, 8L)
    val fromDerived = graft.operators.TsQuery
      .windowMaxPositional(r.filter(col("signal_id") === 7), 8L, 48L, 8L)
    val a = fromTier.orderBy("win").collect().map(x => (x.getLong(1), x.getDouble(2)))
    val b = fromDerived.orderBy("win").collect().map(x => (x.getLong(1), x.getDouble(2)))
    assert(a.sameElements(b))
    // the seq_no range predicate must reach the parquet scan as a pushed
    // filter — impossible on the derived path, free on the persisted one
    val plan = fromTier.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(seq_no,8"), s"seq_no not pushed:\n$plan")
  }

  test("storage codec matrix: fixed-point + compression beats raw doubles") {
    val m = CodecStore.compressionMatrix(Readings.of(spark, "/root/testdata/sf0.001"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(3)).toMap
    assert(m(("uncompressed", "double")) == 1.0)
    assert(m(("zstd", "fixed_q")) < 1.0, s"zstd/fixed_q cr=${m(("zstd", "fixed_q"))}")
    assert(m(("zstd", "double")) < 1.0)
    // 4 parquet codecs x 3 representations + 2 codecs x 2 BUFF plane
    // layouts + the 3 native segment codecs (gorilla_seg / sprintz_seg /
    // fcm_seg) appended by compressionMatrix
    assert(m.size == CodecStore.Codecs.size * 3 + 4 + 3)
    // plane layouts measured: on Parquet, dictionary/RLE already captures
    // the majority-byte win, so outlier-coded planes land near (not below)
    // plain planes — both beat raw doubles
    assert(m(("zstd", "buff_planes")) < 1.0)
    assert(m(("zstd", "buff_outlier")) < 1.0)
    assert(m(("native", "gorilla_seg")) < 1.0)
    assert(m(("native", "sprintz_seg")) < 1.0)
    assert(m(("native", "fcm_seg")) < 1.0)
    // the Sprintz-delta representation still beats raw doubles, but on
    // THIS fixture it measures WORSE than plain fixed-point (~0.43 vs
    // ~0.37 under zstd): the synthetic values are near-independent draws,
    // so deltas have ~2x the entropy of the values themselves. That
    // data-dependence is the point of measuring a matrix instead of
    // assuming a codec ranking — it is exactly why the reference runs a
    // CR-predicting policy (ml_cr_predict) rather than a fixed choice.
    assert(m(("zstd", "delta_q")) < 1.0)
  }
}
