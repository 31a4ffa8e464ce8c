package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Readings

/** The multi-armed-bandit codec chooser — the Spark shape of the
  * reference's MAB compression daemon (database/src/
  * MABcompression_daemon.rs:46-58: EGreedy(arms, eps=0.1, q0=4.0,
  * Nonstationary(0.3)); :125-133 update_mab rewards the chosen arm with
  * the inverse compression ratio of the batch it just compressed).
  *
  * Re-expressed deterministically so the whole policy carries a DuckDB
  * oracle:
  *  - the per-batch (= per-segment) reward for every arm is a DISTRIBUTED
  *    keyed aggregation (distinct-count / p95-delta bit widths, the
  *    CrPredictor estimators) — the part that scales with data;
  *  - the policy walk itself is a sequential fold over the ordered,
  *    BOUNDED reward stream (one row per segment batch), exactly the
  *    reference daemon's single-threaded loop. It runs on the driver over
  *    a collected policy table — at 100 TB the stream length is the
  *    number of batch decisions per policy epoch, not the row count;
  *  - exploration is hash-gated (mix32 of the step) instead of RNG, so
  *    the chosen arm sequence is identical on every run and in DuckDB.
  *
  * Arms (codec CR estimators, bytes-per-value relative to raw f64):
  *   0 uncompressed (cr 1), 1 dict (distinct-ratio bits), 2 delta_bitpack
  *   (p95-step bits), 3 paa_4 (1/4), 4 rrd_4 (1/4). Reward = 1/cr, the
  *   reference's 80000/bytes shape.
  */
object Bandit {

  val Eps = 0.1          // MABcompression_daemon.rs:46 `let e = 0.1`
  val Step = 0.3         // :47 `let s = 0.3` (nonstationary update)
  val Q0 = 4.0           // :57 EGreedy::new(10, e, 4.0, ...)
  val SaltExplore = 21L
  val SaltArm = 22L
  val Arms = Seq("uncompressed", "dict", "delta_bitpack", "paa_4", "rrd_4")

  private def ceilLog2(m: Long): Long =
    java.lang.Long.toBinaryString(math.max(m, 2L) - 1L).length.toLong

  /** mix32 of a driver-side long (same arithmetic as Fixtures.mix32). */
  private def mix32L(id: Long, salt: Long): Long = {
    val M = 4294967296L
    val a = ((id % M) * 1540483477L + salt) % M
    val b = ((a ^ (a >> 16)) * 668265261L) % M
    val c = ((b ^ (b >> 13)) * 1540483477L) % M
    c ^ (c >> 16)
  }

  /** Per-segment reward inputs, computed distributed: one keyed
    * aggregation over (signal, segment) with an intra-segment delta
    * window — two keyed exchanges, scales like any windowed agg.
    */
  def rewardInputs(readings: DataFrame): DataFrame = {
    val seg = Readings.segmentId(col("seq_no"))
    val w = Window.partitionBy(col("signal_id"), seg).orderBy(col("seq_no"))
    readings
      .withColumn("d", col("value_q") - lag(col("value_q"), 1).over(w))
      .groupBy(col("signal_id"), seg.as("seg"))
      .agg(countDistinct(col("value_q")).as("nd"),
        coalesce(round(expr("percentile(abs(d), 0.95)"), 6), lit(0.0)).as("p95"))
  }

  /** Replay the e-greedy policy over the ordered reward stream and emit
    * one row per step: the chosen codec, whether it was an exploration
    * step, the observed reward and the chosen arm's post-update value.
    */
  def egreedyReplay(readings: DataFrame): DataFrame = {
    val spark = readings.sparkSession
    import spark.implicits._
    // bounded policy stream: one row per segment batch (reference batch =
    // compress_method.get_batch() segments; here 1 segment per decision)
    val batches = rewardInputs(readings)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy { case (sid, seg, _, _) => (sid, seg) }

    val q = Array.fill(Arms.length)(Q0)
    val out = batches.zipWithIndex.map { case ((_, _, nd, p95), i) =>
      val step = i + 1L
      val rDict = 64.0 / ceilLog2(nd)
      val p95i = math.max(2L, math.ceil(p95).toLong)
      val rDelta = 64.0 / (ceilLog2(2L * p95i) + 1L)
      val rewards = Array(1.0, rDict, rDelta, 4.0, 4.0)
      val explored = mix32L(step, SaltExplore) % 1000000L <
        math.round(Eps * 1000000L)
      // greedy argmax with lowest-index tie-break (initial all-equal Q)
      val greedy = q.zipWithIndex.maxBy { case (v, idx) => (v, -idx) }._2
      val arm =
        if (explored) (mix32L(step, SaltArm) % Arms.length).toInt else greedy
      val r = rewards(arm)
      q(arm) = q(arm) + Step * (r - q(arm))
      (step, Arms(arm), explored, r, q(arm))
    }
    out.toSeq.toDF("step", "codec", "explored", "reward_raw", "q_raw")
      .select(col("step"), col("codec"), col("explored"),
        round(col("reward_raw"), 6).as("reward"),
        round(col("q_raw"), 6).as("q_after"))
  }

  /** The DuckDB recomputation of [[egreedyReplay]]: same reward
    * aggregation in SQL, then the sequential policy walk as a recursive
    * CTE carrying the 5-arm Q vector. `oracleCte` must already start
    * `WITH RECURSIVE` (the caller rewrites the readings prefix).
    */
  def egreedyReplaySql(oracleCte: String): String = {
    val eps = math.round(Eps * 1000000L)
    // hash gates over the candidate step t.step
    val exp = graft.ml.Fixtures.mix32Sql("t.step", SaltExplore) + s" % 1000000 < $eps"
    val earm = graft.ml.Fixtures.mix32Sql("t.step", SaltArm) + s" % ${Arms.length}"
    val greedy =
      """CASE WHEN p.q0 >= p.q1 AND p.q0 >= p.q2 AND p.q0 >= p.q3 AND p.q0 >= p.q4 THEN 0
        |     WHEN p.q1 >= p.q2 AND p.q1 >= p.q3 AND p.q1 >= p.q4 THEN 1
        |     WHEN p.q2 >= p.q3 AND p.q2 >= p.q4 THEN 2
        |     WHEN p.q3 >= p.q4 THEN 3 ELSE 4 END""".stripMargin
    val arm = s"(CASE WHEN $exp THEN $earm ELSE $greedy END)"
    val rew = s"(CASE $arm WHEN 0 THEN 1.0 WHEN 1 THEN t.r_dict " +
      "WHEN 2 THEN t.r_delta ELSE 4.0 END)"
    def qNext(i: Int) =
      s"CASE WHEN $arm = $i THEN p.q$i + 0.3 * ($rew - p.q$i) ELSE p.q$i END AS q$i"
    s"""$oracleCte, segrows AS (
       |  SELECT signal_id, CAST(floor((seq_no - 1) / 16.0) AS BIGINT) AS seg, value_q,
       |         value_q - lag(value_q) OVER (
       |           PARTITION BY signal_id, CAST(floor((seq_no - 1) / 16.0) AS BIGINT)
       |           ORDER BY seq_no) AS d
       |  FROM r
       |), agg AS (
       |  SELECT signal_id, seg, CAST(count(DISTINCT value_q) AS BIGINT) AS nd,
       |         round(coalesce(quantile_cont(abs(d), 0.95), 0), 6) AS p95
       |  FROM segrows GROUP BY 1, 2
       |), steps AS (
       |  SELECT CAST(row_number() OVER (ORDER BY signal_id, seg) AS BIGINT) AS step,
       |         64.0 / length(bin(greatest(nd, 2) - 1)) AS r_dict,
       |         64.0 / (length(bin(2 * greatest(2, CAST(ceil(p95) AS BIGINT)) - 1)) + 1) AS r_delta
       |  FROM agg
       |), sim AS (
       |  -- seed types define the CTE's column types: force DOUBLE (bare
       |  -- 4.0 is DECIMAL(2,1) in DuckDB and the Q updates overflow it)
       |  SELECT CAST(0 AS BIGINT) AS step, CAST(4.0 AS DOUBLE) AS q0,
       |         CAST(4.0 AS DOUBLE) AS q1, CAST(4.0 AS DOUBLE) AS q2,
       |         CAST(4.0 AS DOUBLE) AS q3, CAST(4.0 AS DOUBLE) AS q4,
       |         -1 AS arm, false AS explored, CAST(0.0 AS DOUBLE) AS reward
       |  UNION ALL
       |  SELECT t.step,
       |         ${qNext(0)}, ${qNext(1)}, ${qNext(2)}, ${qNext(3)}, ${qNext(4)},
       |         $arm AS arm, $exp AS explored, $rew AS reward
       |  FROM sim p JOIN steps t ON t.step = p.step + 1
       |)
       |SELECT step,
       |       CASE arm WHEN 0 THEN 'uncompressed' WHEN 1 THEN 'dict'
       |            WHEN 2 THEN 'delta_bitpack' WHEN 3 THEN 'paa_4'
       |            ELSE 'rrd_4' END AS codec,
       |       explored, round(reward, 6) AS reward,
       |       round(CASE arm WHEN 0 THEN q0 WHEN 1 THEN q1 WHEN 2 THEN q2
       |             WHEN 3 THEN q3 ELSE q4 END, 6) AS q_after
       |FROM sim WHERE step >= 1""".stripMargin
  }
}
