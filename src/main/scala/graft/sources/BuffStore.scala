package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BUFF-style byte-plane decomposition of the fixed-point column — the
  * reference's flagship compressed-domain query path re-expressed
  * Spark-first.
  *
  * The reference (database/src/compress/split_double.rs:32-8769 and
  * buff_simd.rs:313-5433, the ~10k-LoC heart of the engine) splits each
  * fixed-point value into byte planes stored column-wise, then answers
  *  - range predicates plane-by-plane: rows decided (qualify/disqualify)
  *    on a high plane never touch lower planes; only prefix TIES descend
  *    (buff_simd.rs:4507-4681, progressive filter with early exit);
  *  - sums plane-wise as unsigned byte sums scaled by the plane shift
  *    plus `len * base` — exact for fixed-point data, no branch
  *    (buff_simd.rs:2294-2442);
  * over a base-offset representation (subtract the dataset min so planes
  * are unsigned).
  *
  * Spark mapping: each byte plane is its own `int` column (`p0` = most
  * significant). On Parquet this IS the BUFF layout — a columnar store of
  * byte planes — and the two reference wins map onto the two columnar
  * wins:
  *  - *plane pruning*  = column pruning: a filter leg that references
  *    only `p0..pj` reads only those columns (`ReadSchema` shows it);
  *  - *early exit*     = predicate pushdown: the tie leg's equality on
  *    the high planes reaches the scan as `PushedFilters`, so row groups
  *    with no tie rows are skipped by min/max stats before any low plane
  *    byte is read.
  * The progressive filter is a UNION of disjoint legs — one per plane
  * level, each deciding exactly the rows whose first non-tie level is
  * that plane — so the whole refinement ladder is visible to Catalyst
  * and each leg's scan is as narrow as that level needs. Result is a
  * position list (signal_id, seq_no), the reference's bitmap-of-row-ids
  * result shape (query/bit_vec_iter.rs:8-49).
  *
  * Plane-wise sum folds `sum(p_i) << 8*(n-1-i)` per plane plus
  * `cnt * base` — all integer math on longs, so it is exactly
  * `sum(value_q)` (the fixed-point exactness BUFF's plane sum relies on).
  *
  * 100 TB shape: decomposition and reconstruction are map-only column
  * expressions (codegen'd shifts/masks, no UDF); the range filter is
  * scan+filter+union (no shuffle, no join); the sum is one partial+final
  * aggregation. Nothing here collects or breaks partition parallelism.
  */
object BuffStore {

  /** Planes needed to cover a non-negative adjusted domain of width w. */
  def planesFor(width: Long): Int = {
    require(width >= 0, s"negative domain width $width")
    var n = 1; var cap = 256L
    while (cap - 1 < width && n < 8) { n += 1; cap = cap * 256L }
    n
  }

  private def shiftBits(n: Int, i: Int): Int = 8 * (n - 1 - i)

  /** Byte-plane columns p0..p{n-1} (p0 most significant) of `adjusted`
    * (= value_q - base, must be in [0, 256^n)).
    */
  def planeCols(adjusted: Column, n: Int): Seq[Column] =
    (0 until n).map(i =>
      shiftright(adjusted, shiftBits(n, i)).bitwiseAND(lit(255L))
        .cast("int").as(s"p$i"))

  /** Decompose readings into the plane representation. `base` must be
    * <= min(value_q) (the reference's base-offset, split_double.rs:425).
    */
  def planes(readings: DataFrame, base: Long, n: Int): DataFrame =
    readings.select(
      Seq(col("signal_id"), col("seq_no")) ++
        planeCols(col("value_q") - lit(base), n): _*)

  /** base + Σ p_i << shift_i — the exact inverse of `planes`. */
  def reconstruct(base: Long, n: Int): Column =
    (0 until n).map(i => shiftleft(col(s"p$i").cast("long"), shiftBits(n, i)))
      .reduce(_ + _) + lit(base)

  /** Progressive range filter: positions with value_q in [lo, hi].
    *
    * Leg j qualifies rows whose plane-prefix is strictly inside the
    * bound prefixes at level j after tying at every level above —
    * referencing only p0..pj. The last leg resolves remaining full-depth
    * ties with the exact compare. Legs are disjoint by construction
    * (first non-tie level is unique), so the union is exact.
    */
  def rangeProgressive(planesDf: DataFrame, base: Long, n: Int,
                       lo: Long, hi: Long): DataFrame = {
    val loA = lo - base
    val hiA = hi - base
    // prefix of the adjusted value through plane j, and the bound prefixes
    def prefix(j: Int): Column =
      (0 to j).map(i => shiftleft(col(s"p$i").cast("long"), 8 * (j - i)))
        .reduce(_ + _)
    def loP(j: Int): Long = loA >> shiftBits(n, j)   // floor-div, negative-safe
    def hiP(j: Int): Long = hiA >> shiftBits(n, j)
    def tieAbove(j: Int): Column =
      (0 until j).map(i => prefix(i) === lit(loP(i)) || prefix(i) === lit(hiP(i)))
        .foldLeft(lit(true))(_ && _)
    val keys = Seq(col("signal_id"), col("seq_no"))
    val decidedLegs = (0 until n - 1).map { j =>
      planesDf
        .filter(tieAbove(j) && prefix(j) > lit(loP(j)) && prefix(j) < lit(hiP(j)))
        .select(keys: _*)
    }
    // full-depth leg: rows that tied on every plane above; prefix(n-1) IS
    // the adjusted value, so this is the exact residual compare the
    // reference runs on the surviving candidate set
    val finalLeg = planesDf
      .filter(tieAbove(n - 1) &&
        prefix(n - 1) >= lit(loA) && prefix(n - 1) <= lit(hiA))
      .select(keys: _*)
    (decidedLegs :+ finalLeg).reduce(_ union _)
  }

  /** Exact per-signal sum/count of value_q folded plane-wise — the BUFF
    * plane sum (buff_simd.rs:2294): Σ_i (sum of plane i) << shift_i,
    * plus cnt * base. Pure integer math, equal to sum(value_q).
    */
  def sumFromPlanes(planesDf: DataFrame, base: Long, n: Int): DataFrame = {
    val planeSums = (0 until n).map(i =>
      shiftleft(sum(col(s"p$i")).cast("long"), shiftBits(n, i)))
    planesDf.groupBy(col("signal_id")).agg(
      (planeSums.reduce(_ + _) + count(lit(1)) * lit(base)).as("sum_q"),
      count(lit(1)).as("cnt"))
  }

  /** Progressive max with argmax positions (buff_simd.rs:2444-2862: track
    * the running max byte per plane, keep the bitmap of positions
    * attaining it, refine on lower planes). Plan-level equivalent: the
    * max is folded plane-major — max(p0), then max(p1) among p0-maximal
    * rows, ... — so each refinement level is a scalar aggregate over a
    * scan that needs ONE more plane than the last, and the final
    * position list (the argmax "bitmap") is a filter on the per-level
    * maxima — expressed as a broadcast semi-join against the one-row
    * maximum, so the whole thing is declarative: no driver loop, no
    * collect.
    */
  def maxWithArgmax(planesDf: DataFrame, base: Long, n: Int): DataFrame = {
    import org.apache.spark.sql.functions.{max => fmax}
    // per-level maxima as a chain of conditional aggregates: m0 = max(p0),
    // m1 = max(p1 | p0 = m0), ... — computed in ONE aggregation pass by
    // folding lexicographically: max(struct(p0, p1, ..)) is exactly the
    // plane-major byte refinement (struct ordering = lexicographic)
    val packed = struct((0 until n).map(i => col(s"p$i")): _*)
    val top = planesDf.agg(fmax(packed).as("m"))
    planesDf.join(broadcast(top), packed === col("m"))
      .select(col("signal_id"), col("seq_no"),
        reconstruct(base, n).as("value_q"))
  }

  /** Precision-progressive sum (split_double.rs:2949 `sum@precision`):
    * fold only the first `j` planes — the exact sum of the truncated
    * values — plus a hard error bound: each row contributes at most
    * (256^(n-j) - 1) unseen low-plane mass. One narrow scan of j plane
    * columns; the bound is count-based, no low plane touched.
    */
  def sumFromPlanesPrefix(planesDf: DataFrame, base: Long, n: Int, j: Int): DataFrame = {
    require(j >= 1 && j <= n, s"prefix plane count $j out of [1,$n]")
    val planeSums = (0 until j).map(i =>
      shiftleft(sum(col(s"p$i")).cast("long"), shiftBits(n, i)))
    val unseen = (1L << (8 * (n - j))) - 1L
    planesDf.groupBy(col("signal_id")).agg(
      (planeSums.reduce(_ + _) + count(lit(1)) * lit(base)).as("sum_lo"),
      (count(lit(1)) * lit(unseen)).as("err_bound"),
      count(lit(1)).as("cnt"))
  }

  /** Majority/outlier sub-column coding (buff_simd.rs:317-632 — the
    * scheme the BUFF paper is named for): per (signal, plane), when >=60%
    * of the plane's bytes share one value, store the majority byte ONCE in
    * a per-signal dictionary and keep only the EXCEPTIONS in the plane
    * column — majority rows become NULL, which Parquet's definition
    * levels encode in ~1 bit, so a skewed plane costs exception-bytes
    * instead of cnt bytes (the reference's majority byte + exception
    * bitmap, in columnar-store terms).
    *
    * Returns (data, majorities): `data` is the planes frame with majority
    * bytes nulled out; `majorities` is one row per signal with maj_0..
    * maj_{n-1} (NULL = plane not majority-coded). The mode byte is
    * deterministic (ties break to the smallest byte). One exploded
    * aggregation pass computes every plane's mode — no per-plane scans.
    */
  def outlierEncode(planesDf: DataFrame, n: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val counts = planesDf
      .select(col("signal_id"),
        posexplode(array((0 until n).map(i => col(s"p$i")): _*))
          .as(Seq("plane", "byte")))
      .groupBy(col("signal_id"), col("plane"), col("byte"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("signal_id"), col("plane"))
      .orderBy(col("c").desc, col("byte"))
    val modes = counts
      .withColumn("cnt", sum(col("c")).over(
        Window.partitionBy(col("signal_id"), col("plane"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      // the reference's >=60% occupancy gate for switching to
      // majority+exceptions (buff_simd.rs:317) — integer test, no doubles
      .withColumn("coded", col("c") * 5 >= col("cnt") * 3)
    val majAggs = (0 until n).map(i =>
      max(when(col("plane") === i && col("coded"), col("byte")))
        .as(s"maj_$i"))
    val majorities = modes.groupBy(col("signal_id"))
      .agg(majAggs.head, majAggs.tail: _*)
    val data = planesDf.join(broadcast(majorities), "signal_id")
      .select(Seq(col("signal_id"), col("seq_no")) ++
        (0 until n).map(i =>
          when(col(s"p$i") === col(s"maj_$i"), lit(null))
            .otherwise(col(s"p$i")).as(s"p$i")): _*)
    (data, majorities)
  }

  /** Inverse of [[outlierEncode]]: a planes-shaped view (p_i = exception
    * byte or the signal's majority byte), so every existing plane
    * consumer — rangeProgressive, sumFromPlanes, maxWithArgmax — runs on
    * the outlier-coded store unchanged. Map-only + one broadcast join.
    */
  def restore(data: DataFrame, majorities: DataFrame, n: Int): DataFrame =
    data.join(broadcast(majorities), "signal_id")
      .select(Seq(col("signal_id"), col("seq_no")) ++
        (0 until n).map(i =>
          coalesce(col(s"p$i"), col(s"maj_$i")).as(s"p$i")): _*)

  /** Exact per-signal sum DIRECTLY from the outlier-coded form — no
    * restore: plane i's total is sum(exception bytes) + maj_i * (cnt -
    * n_exceptions) (buff_simd.rs majority-sum shortcut). Equal to
    * sum(value_q); one aggregation + one broadcast join.
    */
  def sumFromOutlierPlanes(data: DataFrame, majorities: DataFrame,
                           base: Long, n: Int): DataFrame = {
    val aggs = Seq(count(lit(1)).as("cnt")) ++
      (0 until n).flatMap(i => Seq(
        sum(col(s"p$i")).cast("long").as(s"es_$i"),
        count(col(s"p$i")).as(s"en_$i")))
    val g = data.groupBy(col("signal_id")).agg(aggs.head, aggs.tail: _*)
    val planeTotals = (0 until n).map { i =>
      val total = coalesce(col(s"es_$i"), lit(0L)) +
        coalesce(col(s"maj_$i").cast("long"), lit(0L)) *
          (col("cnt") - col(s"en_$i"))
      shiftleft(total, shiftBits(n, i))
    }
    g.join(broadcast(majorities), "signal_id")
      .select(col("signal_id"),
        (planeTotals.reduce(_ + _) + col("cnt") * lit(base)).as("sum_q"),
        col("cnt"))
  }

  /** Progressive max + argmax DIRECTLY on the outlier-coded store — the
    * reference's majority-path max (buff_simd.rs:2863: a plane's
    * candidate byte is max(majority byte, max exception byte), then
    * refine). On the coded Parquet layout the same plane-major fold is
    * ONE lexicographic aggregate over coalesce(exception, majority): the
    * scan reads exception bytes plus ~1-bit definition levels — majority
    * rows' bytes are never materialized, so there is no restore
    * projection and the I/O is exception-mass only, exactly the
    * reference's majority shortcut in columnar terms. The argmax
    * position list is the same broadcast semi-join as [[maxWithArgmax]];
    * completes the compressed-domain query family (range/sum/max) on the
    * coded form.
    */
  def maxFromOutlierPlanes(data: DataFrame, majorities: DataFrame,
                           base: Long, n: Int): DataFrame = {
    import org.apache.spark.sql.functions.{max => fmax}
    def eff(i: Int): Column = coalesce(col(s"p$i"), col(s"maj_$i"))
    val joined = data.join(broadcast(majorities), "signal_id")
    val packed = struct((0 until n).map(i => eff(i).as(s"e$i")): _*)
    val top = joined.agg(fmax(packed).as("m"))
    joined.join(broadcast(top), packed === col("m"))
      .select(col("signal_id"), col("seq_no"),
        ((0 until n).map(i =>
          shiftleft(eff(i).cast("long"), shiftBits(n, i)))
          .reduce(_ + _) + lit(base)).as("value_q"))
  }

  /** Persist the plane representation (the on-disk BUFF layout: one
    * Parquet column per byte plane, dictionary/bit-pack encoded).
    */
  def write(planesDf: DataFrame, path: String): Unit =
    planesDf.write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
