package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Readings.OracleCte

/** Driver-facing registrations for the lossy tier ladder, segment ML and
  * multimodal ops. Deterministic/SQL-expressible tiers carry oracles; the
  * Breeze-FFT, LTTB, kernel and binary-payload paths are rows-only +
  * ScalaTest error-bound properties (reference tolerance style,
  * segment.rs:882-893).
  */
object TierQueries {

  private def r(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(s)
    Readings.of(s, d)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tier_paa_max" -> ((s, d) => Tiers.paaMax(r(s, d), 4)),

    "tier_rrd" -> ((s, d) => Tiers.rrdTier(r(s, d), 4)),

    "tier_recode_plan" -> ((s, d) => Tiers.recodePlan(r(s, d), 4, 0.5)),

    "tier_fft_err" -> ((s, d) =>
      Tiers.fftError(Segments.complete(r(s, d)), keep = 4)),

    "tier_lttb" -> ((s, d) =>
      Tiers.lttbTier(Segments.complete(r(s, d)), npts = 6)),

    "seg_kernel_rbf" -> ((s, d) => {
      val segs = Segments.complete(r(s, d))
      val dict = segs.filter(col("signal_id") < 2 && col("seg") === 0)
        .orderBy(col("signal_id"))
        .collect().map(_.getSeq[Double](2).toSeq).toSeq
      SegmentMl.rbfFeatures(segs, dict, gamma = 0.001)
    }),

    "seg_knn" -> ((s, d) =>
      SegmentMl.knnSegments(Segments.complete(r(s, d)), testSignals = Seq(0L, 1L, 2L))),

    "storage_codec_cr" -> ((s, d) =>
      graft.sources.CodecStore.compressionMatrix(r(s, d))),

    "seg_kernel_sink" -> ((s, d) => {
      val segs = Segments.complete(r(s, d))
      val dict = segs.filter(col("signal_id") < 2 && col("seg") === 0)
        .orderBy(col("signal_id"))
        .collect().map(_.getSeq[Double](2).toArray).toSeq
      SegmentMl.sinkFeatures(segs, dict, gamma = 1.0, keep = 4)
    }),

    // array feature columns are emitted as CSV digest strings: the driver's
    // comparator (pandas sort + hash) cannot order ndarray cells, and a
    // digest makes the byte-histogram/frame-checksum oracle expressible
    "mm_features" -> ((s, d) =>
      Multimodal.byteHistogram(Multimodal.withPayload(Tables.documents(s, d)))
        .select(col("doc_id"), col("n_bytes"),
          concat_ws(",", col("hist16").cast("array<string>")).as("hist16_csv"))),

    "mm_frames" -> ((s, d) =>
      Multimodal.frameSample(Multimodal.withPayload(Tables.documents(s, d)),
        frameBytes = 16, stride = 2)
        .select(col("doc_id"), col("n_frames"), col("n_sampled"),
          concat_ws(",", col("frame_sums").cast("array<string>")).as("frames_csv"))),

    // LTTB keypoint summary: endpoint/count columns are deterministic
    // (first/last always kept, n_pts = min(npts, len)) -> oracle-able,
    // unlike the float triangle-area err column in tier_lttb
    "tier_lttb_summary" -> ((s, d) =>
      Tiers.lttbTier(Segments.complete(r(s, d)), npts = 6)
        .select(col("signal_id"), col("seg"), col("n_pts"),
          col("first_v"), col("last_v")))
  )

  val oracles: Map[String, String] = Map(
    "tier_paa_max" ->
      s"""$OracleCte, c AS (
         |  SELECT signal_id, CAST(floor((seq_no - 1) / 4.0) AS BIGINT) AS chunk,
         |         CAST(sum(value_q) AS BIGINT) AS sq, CAST(count(*) AS BIGINT) AS cnt
         |  FROM r GROUP BY 1, 2
         |)
         |SELECT signal_id,
         |  max(CAST(sq AS DOUBLE) / (100.0 * CAST(cnt AS DOUBLE))) AS paa_max
         |FROM c GROUP BY 1""".stripMargin,

    "tier_rrd" ->
      s"""$OracleCte SELECT signal_id, seq_no, value FROM r
         |WHERE (seq_no - 1) % 4 = 0""".stripMargin,

    "seg_knn" ->
      s"""$OracleCte, segs AS (
         |  SELECT signal_id, CAST(floor((seq_no - 1) / 16.0) AS BIGINT) AS seg,
         |         list(value ORDER BY seq_no) AS vals, count(*) AS cnt
         |  FROM r GROUP BY 1, 2
         |), f AS (
         |  SELECT signal_id, seg, vals::DOUBLE[] AS vals FROM segs WHERE cnt = 16
         |), t AS (
         |  SELECT signal_id AS test_sig, seg AS test_seg, vals AS tv
         |  FROM f WHERE signal_id IN (0, 1, 2)
         |), tr AS (
         |  SELECT signal_id AS train_sig, seg AS train_seg, vals AS rv
         |  FROM f WHERE signal_id NOT IN (0, 1, 2)
         |), s AS (
         |  SELECT test_sig, test_seg, train_sig, train_seg,
         |         round(list_distance(tv, rv), 6) AS dist
         |  FROM t, tr
         |), rk AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY test_sig, test_seg
         |    ORDER BY dist, train_sig, train_seg) AS rnk
         |  FROM s
         |)
         |SELECT test_sig, test_seg, train_sig AS pred_sig, dist
         |FROM rk WHERE rnk = 1""".stripMargin,

    // payload bytes are the UTF-8 encoding of `text`; the testdata corpus is
    // pure ASCII (asserted in MultimodalSpec), so unicode(char) == byte and
    // the histogram/frame folds are exactly expressible over characters
    "mm_features" ->
      """WITH c AS (
        |  SELECT doc_id, [unicode(x)::BIGINT for x in string_split(text, '')] AS b
        |  FROM documents
        |)
        |SELECT doc_id, CAST(len(b) AS BIGINT) AS n_bytes,
        |  array_to_string([len(list_filter(b, x -> x // 16 = h)) for h in range(0, 16)], ',') AS hist16_csv
        |FROM c""".stripMargin,

    "mm_frames" ->
      """WITH c AS (
        |  SELECT doc_id, [unicode(x)::BIGINT for x in string_split(text, '')] AS b
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, b, CAST(len(b) // 16 AS BIGINT) AS n_frames FROM c
        |)
        |SELECT doc_id, n_frames,
        |  CAST(len([fi for fi in range(0, n_frames) if fi % 2 = 0]) AS BIGINT) AS n_sampled,
        |  array_to_string([list_reduce(b[CAST(fi*16+1 AS INT):CAST(fi*16+16 AS INT)],
        |                               (a, x) -> (a*31 + x) & 4294967295)
        |                   for fi in range(0, n_frames) if fi % 2 = 0], ',') AS frames_csv
        |FROM f""".stripMargin,

    "tier_lttb_summary" ->
      s"""$OracleCte, segs AS (
         |  SELECT signal_id, CAST(floor((seq_no - 1) / 16.0) AS BIGINT) AS seg,
         |         CAST(count(*) AS BIGINT) AS cnt,
         |         arg_min(value, seq_no) AS first_v,
         |         arg_max(value, seq_no) AS last_v
         |  FROM r GROUP BY 1, 2
         |)
         |SELECT signal_id, seg, CAST(6 AS BIGINT) AS n_pts, first_v, last_v
         |FROM segs WHERE cnt = 16""".stripMargin,

    "tier_recode_plan" ->
      s"""$OracleCte, c AS (
         |  SELECT signal_id, CAST(floor((seq_no - 1) / 16.0) AS BIGINT) AS seg,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM r GROUP BY 1, 2
         |)
         |SELECT signal_id, seg, cnt, cnt * 8 AS bytes_raw,
         |  CAST(ceil(cnt / 4.0) * 8 AS BIGINT) AS bytes_paa,
         |  CAST(ceil(cnt / 4.0) * 8 AS DOUBLE) / CAST(cnt * 8 AS DOUBLE) AS cr_paa,
         |  CAST(ceil(cnt / 4.0) * 8 AS DOUBLE) / CAST(cnt * 8 AS DOUBLE) < 0.5 AS recode
         |FROM c""".stripMargin
  )
}
