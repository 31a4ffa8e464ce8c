package graft.operators

import graft.ml.{Bandit, Fixtures}

/** Invariant-mode scale checks for the queries whose EXACT oracles are
  * quadratic or transitive in SQL (all-pairs Jaccard, transitive-closure
  * components, recursive bandit walks). At sf0.1 those oracles blow the
  * scale-check budget; instead of SKIPping, the driver-side checker runs
  * these linear-time invariant queries over the Spark dumps + base tables.
  *
  * Contract: each SQL is run by DuckDB with views
  *   - the base tables (documents, events, ...);
  *   - `spark_out`  = the parquet dump of the query under test;
  *   - `out_<name>` = the parquet dump of ANY other registered query
  *     (cross-output consistency checks — e.g. the components labeling is
  *     checked against the separately-soundness-checked near-dup pair
  *     output as its edge set);
  * and must return rows (invariant VARCHAR, violations BIGINT). The check
  * passes iff every violations = 0.
  *
  * Scope note (kept honest): the dedup-family checks are NECESSARY
  * conditions verifiable in one pass — per-pair exact-Jaccard soundness,
  * CC fixpoint closure + min-labeling, keeper/anti-join set algebra.
  * What they do NOT prove at sf0.1 is completeness of pair ENUMERATION
  * (would need the all-pairs join) and CC over-merge (needs connectivity
  * certificates); both are covered by the exact DuckDB oracles at
  * sf0.01, where they are tractable. The bandit checks, by contrast, are
  * a COMPLETE verification: the rewards chain is non-recursive (only the
  * Q walk needed recursion), so reward values recompute linearly, the
  * Q-update recurrence + hash gates pin every transition, and the
  * ASOF-reconstructed argmax pins every greedy choice — together an
  * inductive proof of the whole walk.
  */
object ScaleInvariants {

  /** Per-pair exact-Jaccard soundness for a near-dup pair dump: every
    * emitted (doc_a, doc_b, jac) is ordered, distinct, meets `thr`, and
    * its jac equals the exact set Jaccard recomputed from `setCte`'s
    * per-doc sets (relation `f`, column `sh`). Linear in |pairs|.
    */
  private def pairSoundnessSql(setCte: String, setRel: String,
                               setCol: String, thr: Double): String =
    s"""$setCte, p AS (SELECT * FROM spark_out),
       |ex AS (
       |  SELECT p.doc_a, p.doc_b, p.jac,
       |    CAST(len(list_intersect(a.$setCol, b.$setCol)) AS DOUBLE) /
       |    CAST(len(list_distinct(list_concat(a.$setCol, b.$setCol))) AS DOUBLE)
       |      AS jac_exact
       |  FROM p
       |  LEFT JOIN $setRel a ON a.doc_id = p.doc_a
       |  LEFT JOIN $setRel b ON b.doc_id = p.doc_b
       |)
       |SELECT 'pairs_ordered' AS invariant,
       |  CAST(count(*) FILTER (WHERE doc_a >= doc_b) AS BIGINT) AS violations
       |FROM p
       |UNION ALL
       |SELECT 'pairs_distinct',
       |  CAST(count(*) - count(DISTINCT (doc_a, doc_b)) AS BIGINT)
       |FROM p
       |UNION ALL
       |SELECT 'pair_jaccard_exact_and_thresholded',
       |  CAST(count(*) FILTER (WHERE jac_exact IS NULL
       |    OR abs(jac - jac_exact) > 1e-9 OR jac_exact < $thr) AS BIGINT)
       |FROM ex""".stripMargin

  /** CC labeling fixpoint checks against an edge dump: labels closed over
    * edges, component id = min member, keeper = (id == component), ids
    * unique, labeled universe = docs incident to an edge.
    */
  private def componentsSql(edgeRel: String): String =
    s"""WITH lab AS (SELECT * FROM spark_out),
       |e AS (SELECT doc_a, doc_b FROM $edgeRel),
       |touched AS (
       |  SELECT DISTINCT d FROM
       |    (SELECT doc_a AS d FROM e UNION ALL SELECT doc_b FROM e)
       |)
       |SELECT 'edges_closed_under_labeling' AS invariant,
       |  CAST(count(*) FILTER (WHERE a.component IS NULL
       |    OR b.component IS NULL OR a.component <> b.component) AS BIGINT)
       |    AS violations
       |FROM e LEFT JOIN lab a ON a.doc_id = e.doc_a
       |       LEFT JOIN lab b ON b.doc_id = e.doc_b
       |UNION ALL
       |SELECT 'component_id_is_min_member',
       |  CAST(count(*) AS BIGINT) FROM (
       |    SELECT component, min(doc_id) AS m FROM lab GROUP BY 1
       |  ) t WHERE component <> m
       |UNION ALL
       |SELECT 'keeper_iff_min',
       |  CAST(count(*) FILTER (WHERE keeper <> (doc_id = component)) AS BIGINT)
       |FROM lab
       |UNION ALL
       |SELECT 'doc_ids_unique',
       |  CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) FROM lab
       |UNION ALL
       |SELECT 'universe_matches_edge_endpoints',
       |  CAST((SELECT count(*) FROM lab ANTI JOIN touched ON lab.doc_id = touched.d)
       |     + (SELECT count(*) FROM touched ANTI JOIN lab ON lab.doc_id = touched.d)
       |    AS BIGINT)""".stripMargin

  /** e-greedy walk state-machine checks (Bandit constants inlined): steps
    * contiguous per band, explore gate = the mix32 hash, explored arm =
    * the mix32 arm pick, q_after follows the nonstationary update from the
    * SAME codec's previous q_after (or Q0). Linear, one window pass.
    */
  private def banditSql(arms: Seq[String], banded: Boolean,
                        stepsCte: String): String = {
    val bandKey = if (banded) "band" else "CAST(0 AS BIGINT)"
    val armVals = arms.zipWithIndex
      .map { case (a, i) => s"($i, '$a')" }.mkString(", ")
    val gate = Fixtures.mix32Sql("w.step", Bandit.SaltExplore)
    val pick = Fixtures.mix32Sql("w.step", Bandit.SaltArm)
    val eps = math.round(Bandit.Eps * 1000000L)
    val rewardCase = "CASE w.codec " + arms.zipWithIndex
      .map { case (a, i) => s"WHEN '$a' THEN s.r$i" }.mkString(" ") +
      " END"
    val stepJoin =
      if (banded) "s.step = w.step AND s.band = w.bkey"
      else "s.step = w.step"
    s"""$stepsCte,
       |w AS (SELECT *, $bandKey AS bkey FROM spark_out),
       |arms(idx, name) AS (VALUES $armVals)
       |SELECT 'steps_contiguous_per_band' AS invariant,
       |  CAST(count(*) AS BIGINT) AS violations FROM (
       |    SELECT bkey, count(*) AS n, max(step) AS mx,
       |           count(DISTINCT step) AS nd
       |    FROM w GROUP BY 1
       |  ) t WHERE n <> mx OR nd <> n
       |UNION ALL
       |SELECT 'codec_is_an_arm',
       |  CAST(count(*) AS BIGINT)
       |FROM w ANTI JOIN arms ON arms.name = w.codec
       |UNION ALL
       |SELECT 'explore_gate_matches_hash',
       |  CAST(count(*) FILTER (WHERE (($gate) % 1000000 < $eps) <> explored)
       |    AS BIGINT)
       |FROM w
       |UNION ALL
       |SELECT 'explored_step_picks_hash_arm',
       |  CAST(count(*) FILTER (WHERE w.explored
       |    AND arms.idx <> ($pick) % ${arms.length}) AS BIGINT)
       |FROM w JOIN arms ON arms.name = w.codec
       |UNION ALL
       |SELECT 'q_update_recurrence',
       |  -- reward/q_after are stored 6dp-rounded, so the recomputed step
       |  -- carries up to ~1.4e-6 of rounding residue (0.7*|q_prev err| +
       |  -- 0.3*|reward err| + own rounding); 5e-6 admits that and nothing
       |  -- structural
       |  CAST(count(*) FILTER (
       |    WHERE abs(q_after - (q_prev + ${Bandit.Step} * (reward - q_prev)))
       |      > 5e-6) AS BIGINT)
       |FROM (
       |  SELECT reward, q_after,
       |    coalesce(lag(q_after) OVER (
       |      PARTITION BY bkey, codec ORDER BY step), ${Bandit.Q0}) AS q_prev
       |  FROM w
       |) t
       |UNION ALL
       |SELECT 'reward_matches_recomputation',
       |  -- the rewards chain is NON-recursive (only the Q walk needed
       |  -- recursion), so every step's observed reward is recomputable
       |  -- linearly; rewards are stored 6dp-rounded on both sides
       |  CAST(count(*) FILTER (WHERE s.step IS NULL
       |    OR abs(w.reward - ($rewardCase)) > 5e-6) AS BIGINT)
       |FROM w LEFT JOIN steps s ON $stepJoin
       |UNION ALL
       |SELECT 'greedy_step_picks_argmax', CAST(count(*) AS BIGINT) FROM (
       |  -- reconstruct each arm's carried Q at every step (last q_after
       |  -- of that arm before the step, else Q0) with one ASOF join —
       |  -- linear-time full verification of the greedy choices, the part
       |  -- the recursive oracle recomputes sequentially. Tie-break is the
       |  -- walk's lowest-arm-index rule; the 1e-6 epsilon keeps a
       |  -- 6dp-rounding-induced near-tie from flagging a false violation.
       |  WITH sa AS (
       |    SELECT s.bkey, s.step, a.idx, a.name
       |    FROM (SELECT DISTINCT bkey, step FROM w) s CROSS JOIN arms a
       |  ), q_at AS (
       |    SELECT sa.bkey, sa.step, sa.idx, sa.name,
       |           coalesce(w2.q_after, ${Bandit.Q0}) AS q
       |    FROM sa ASOF LEFT JOIN w w2
       |      ON w2.bkey = sa.bkey AND w2.codec = sa.name AND sa.step > w2.step
       |  ), best AS (
       |    SELECT bkey, step, name, q, row_number() OVER (
       |      PARTITION BY bkey, step ORDER BY q DESC, idx) AS brnk
       |    FROM q_at
       |  )
       |  SELECT w.bkey, w.step
       |  FROM w JOIN best b ON b.bkey = w.bkey AND b.step = w.step
       |                    AND b.brnk = 1
       |  JOIN q_at mine ON mine.bkey = w.bkey AND mine.step = w.step
       |                AND mine.name = w.codec
       |  WHERE NOT w.explored AND w.codec <> b.name
       |    AND abs(mine.q - b.q) > 1e-6
       |) v""".stripMargin
  }

  /** 4-char-gram set CTE matching the dedup_ngram oracle's definition. */
  private val GramCte =
    """WITH g0 AS (
      |  SELECT doc_id,
      |         list_distinct([substr(lower(text), i, 4)
      |                        for i in range(1, len(text) - 2)]) AS sh
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, sh FROM g0 WHERE len(sh) > 0
      |)""".stripMargin

  val sql: Map[String, String] = Map(
    "dedup_minhash" ->
      pairSoundnessSql(TextQueries.ShingleCte, "f", "sh", 0.5),

    "dedup_ngram" ->
      pairSoundnessSql(GramCte, "f", "sh", 0.6),

    // the histogram is a pure rebin of the minhash pair dump (same
    // threshold, same jac values) — full equality, linear in |pairs|
    "dedup_jaccard_hist" ->
      s"""WITH h AS (SELECT * FROM spark_out),
         |want AS (
         |  SELECT least(9, CAST(floor(jac * 10.0) AS BIGINT)) AS bin,
         |         CAST(count(*) AS BIGINT) AS pairs
         |  FROM out_dedup_minhash GROUP BY 1
         |)
         |SELECT 'histogram_rebins_pair_dump' AS invariant,
         |  CAST((SELECT count(*) FROM h ANTI JOIN want
         |          ON h.bin = want.bin AND h.pairs = want.pairs)
         |     + (SELECT count(*) FROM want ANTI JOIN h
         |          ON h.bin = want.bin AND h.pairs = want.pairs)
         |    AS BIGINT) AS violations""".stripMargin,

    // labelings checked against the near-dup pair dump as the edge set —
    // that dump is itself soundness-checked above
    "dedup_components" -> componentsSql("out_dedup_minhash"),
    "dedup_components_star" -> componentsSql("out_dedup_minhash"),

    // kept set == documents minus the CC losers of the components dump,
    // and the carried lang column matches the source table
    "pipe_near_dedup" ->
      s"""WITH k AS (SELECT * FROM spark_out),
         |losers AS (
         |  SELECT doc_id FROM out_dedup_components WHERE NOT keeper
         |),
         |want AS (
         |  SELECT d.doc_id, d.lang FROM documents d
         |  ANTI JOIN losers l ON l.doc_id = d.doc_id
         |)
         |SELECT 'kept_set_equals_docs_minus_losers' AS invariant,
         |  CAST((SELECT count(*) FROM k ANTI JOIN want USING (doc_id))
         |     + (SELECT count(*) FROM want ANTI JOIN k USING (doc_id))
         |    AS BIGINT) AS violations
         |UNION ALL
         |SELECT 'lang_matches_source',
         |  CAST(count(*) FILTER (WHERE k.lang <> d.lang) AS BIGINT)
         |FROM k JOIN documents d USING (doc_id)""".stripMargin,

    // FULL recomputation given the components dump: quality keeper = the
    // longest (ties to lowest id) member per component, singletons keep
    // themselves — linear once the closure labels are taken as input
    "pipe_dedup_quality" ->
      s"""WITH k AS (SELECT * FROM spark_out),
         |scored AS (
         |  SELECT d.doc_id, d.lang,
         |    CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_tokens,
         |    coalesce(c.component, d.doc_id) AS component
         |  FROM documents d
         |  LEFT JOIN out_dedup_components c USING (doc_id)
         |), rk AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY component ORDER BY n_tokens DESC, doc_id) AS rnk
         |  FROM scored
         |), want AS (
         |  SELECT doc_id, lang, n_tokens FROM rk WHERE rnk = 1
         |)
         |SELECT 'keeper_set_matches' AS invariant,
         |  CAST((SELECT count(*) FROM k ANTI JOIN want USING (doc_id))
         |     + (SELECT count(*) FROM want ANTI JOIN k USING (doc_id))
         |    AS BIGINT) AS violations
         |UNION ALL
         |SELECT 'kept_columns_match',
         |  CAST(count(*) FILTER (WHERE k.lang <> w.lang
         |    OR k.n_tokens <> w.n_tokens) AS BIGINT)
         |FROM k JOIN want w USING (doc_id)""".stripMargin,

    "ml_bandit_recode" -> banditSql(Bandit.RecodeArms, banded = false,
      Bandit.recodeStepsCte(Readings.OracleCte, banded = false)),
    "ml_bandit_recode_band" -> banditSql(Bandit.RecodeArms, banded = true,
      Bandit.recodeStepsCte(Readings.OracleCte, banded = true)),
    "ml_bandit_replay" -> banditSql(Bandit.CompressArms, banded = false,
      Bandit.compressStepsCte(Readings.OracleCte)),

    // --- invariant coverage for the engine-specific ML-fit dumps (no
    // exact oracle exists: the models are Spark ML's). These do not
    // recompute the fit; they verify the dumped model's defining
    // properties against the base tables in one linear pass each.

    // KMeans Voronoi consistency: every point lies in its own centroid's
    // cell (tolerance absorbs Spark ML's norm-cached distance shortcut),
    // k centroids dumped, every embedding assigned exactly once
    "emb_kmeans" ->
      """WITH pts AS (
        |  SELECT s.id AS vec_id, s.cluster, e.embedding
        |  FROM spark_out s JOIN embeddings e ON e.vec_id = s.id
        |  WHERE s.kind = 'pt'
        |), ctrs AS (
        |  -- vec arrives as the canonical "[c0,c1,...]" string (the dump
        |  -- stringifies it so the driver's sort/hash step can handle the
        |  -- column); shortest-round-trip doubles parse back exactly
        |  SELECT id AS cluster,
        |    list_transform(string_split(trim(vec, '[]'), ','),
        |      x -> CAST(x AS DOUBLE)) AS vec
        |  FROM spark_out WHERE kind = 'ctr'
        |), d AS (
        |  SELECT p.vec_id, p.cluster AS own, c.cluster AS cand,
        |    list_sum(list_transform(range(1, len(c.vec) + 1),
        |      i -> (CAST(p.embedding[i] AS DOUBLE) - c.vec[i])
        |         * (CAST(p.embedding[i] AS DOUBLE) - c.vec[i]))) AS d2
        |  FROM pts p CROSS JOIN ctrs c
        |), best AS (
        |  SELECT vec_id, own, min(d2) FILTER (WHERE cand = own) AS d_own,
        |         min(d2) AS d_min
        |  FROM d GROUP BY 1, 2
        |)
        |SELECT 'every_point_in_own_voronoi_cell' AS invariant,
        |  CAST(count(*) FILTER (WHERE d_own IS NULL
        |    OR d_own > d_min + 1e-6 * greatest(d_min, 1.0)) AS BIGINT)
        |    AS violations
        |FROM best
        |UNION ALL
        |SELECT 'k_centroids_dumped',
        |  CAST(abs(10 - (SELECT count(*) FROM ctrs)) AS BIGINT)
        |UNION ALL
        |SELECT 'every_embedding_assigned_once',
        |  CAST(abs((SELECT count(*) FROM embeddings)
        |         - (SELECT count(DISTINCT vec_id) FROM pts)) AS BIGINT)"""
        .stripMargin,

    // purity is structurally >= the global majority-label share (each
    // cluster's majority count >= its count of any FIXED label, summed)
    // and <= 1; both bounds check against the base table
    "ml_kmeans_purity" ->
      """WITH p AS (SELECT purity FROM spark_out),
        |maj AS (
        |  SELECT CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS share
        |  FROM (SELECT label, count(*) AS c FROM embeddings GROUP BY 1)
        |)
        |SELECT 'purity_at_least_majority_label_share' AS invariant,
        |  CAST(count(*) FILTER (WHERE p.purity < m.share - 1e-9) AS BIGINT)
        |    AS violations
        |FROM p, maj m
        |UNION ALL
        |SELECT 'purity_at_most_one',
        |  CAST(count(*) FILTER (WHERE purity > 1.0 + 1e-12) AS BIGINT) FROM p
        |UNION ALL
        |SELECT 'one_summary_row',
        |  CAST(abs(1 - (SELECT count(*) FROM p)) AS BIGINT)""".stripMargin,

    // the reported accuracy IS the prediction dump's hit rate (both are
    // integer-count ratios, so the division matches exactly), accuracies
    // bounded, the expected model rows present
    "ml_classifiers" ->
      """WITH acc AS (
        |  SELECT model, accuracy FROM spark_out WHERE kind = 'acc'
        |), pr AS (
        |  SELECT prediction, label FROM spark_out WHERE kind = 'pred'
        |), dt AS (
        |  SELECT CAST(count(*) FILTER (WHERE prediction = label) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE) AS a
        |  FROM pr
        |)
        |SELECT 'accuracies_in_unit_interval' AS invariant,
        |  CAST(count(*) FILTER (WHERE accuracy < 0.0 OR accuracy > 1.0)
        |    AS BIGINT) AS violations
        |FROM acc
        |UNION ALL
        |SELECT 'dt_accuracy_matches_prediction_dump',
        |  CAST(count(*) FILTER (WHERE abs(accuracy - (SELECT a FROM dt)) > 1e-9)
        |    AS BIGINT)
        |FROM acc WHERE model = 'decision_tree'
        |UNION ALL
        |SELECT 'tree_and_forest_rows_present',
        |  CAST(2 - count(DISTINCT model)
        |    FILTER (WHERE model IN ('decision_tree', 'random_forest'))
        |    AS BIGINT)
        |FROM acc""".stripMargin,

    // file-size measurements can't have a DuckDB oracle, but their
    // internal accounting can: bytes positive, cr = bytes / the
    // uncompressed-double baseline row, exactly one baseline row
    "storage_codec_cr" ->
      """WITH m AS (SELECT * FROM spark_out),
        |base AS (
        |  SELECT bytes AS b FROM m
        |  WHERE codec = 'uncompressed' AND repr = 'double'
        |)
        |SELECT 'bytes_positive' AS invariant,
        |  CAST(count(*) FILTER (WHERE bytes <= 0) AS BIGINT) AS violations
        |FROM m
        |UNION ALL
        |SELECT 'cr_is_bytes_over_baseline',
        |  CAST(count(*) FILTER (WHERE abs(cr - CAST(bytes AS DOUBLE) /
        |    (SELECT CAST(b AS DOUBLE) FROM base)) > 1e-12) AS BIGINT)
        |FROM m
        |UNION ALL
        |SELECT 'one_baseline_row',
        |  CAST(abs(1 - (SELECT count(*) FROM base)) AS BIGINT)""".stripMargin
  )
}
