package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval join operators Spark lacks natively, composed from
  * built-ins per SURVEY §2 preference (a) — "compose existing ops if
  * semantics allow" — rather than a custom SparkPlan: both shapes reduce
  * to one keyed shuffle + one sorted window pass, which is exactly what a
  * hand-written physical operator would do.
  */
object IntervalOps {

  /** As-of join: for each left row (key, ts), attach the payload of the
    * latest right row (key, rts) with rts <= ts (inclusive).
    *
    * Mechanics: union both sides tagged by kind (right=0 sorts before
    * left=1 at equal timestamps, making the match inclusive), then one
    * window pass per key ordered by (ts, kind) carrying the last non-null
    * right payload forward. One shuffle on `key`, no range condition, no
    * cross product — the scale shape for "latest state at event time"
    * joins (the generalization of TSBS last-point, tsbs/mod.rs:28-48).
    *
    * `rightCols` are carried to matching left rows (null if no right row
    * precedes the left row).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    // the window pass owns the _kind/_ats/_r_*/_c_* namespace; a caller
    // column with one of those names would be silently shadowed and
    // corrupt the carry — fail loudly instead
    val reserved = Seq("_kind", "_ats") ++
      rightCols.flatMap(c => Seq(s"_r_$c", s"_c_$c"))
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"asofJoin: input columns ${clash.mkString(", ")} collide with " +
        "internal temporaries (_kind/_ats/_r_*/_c_*); rename them first")
    val lTagged = left.withColumn("_kind", lit(1))
      .withColumn("_ats", col(leftTs))
    val rTagged = rightCols.foldLeft(
        right.withColumn("_kind", lit(0)).withColumn("_ats", col(rightTs))) {
        (df, c) => df.withColumnRenamed(c, s"_r_$c")
      }
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_ats"), col("_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_c_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    val out = carried.filter(col("_kind") === 1)
    val renamed = rightCols.foldLeft(out) { (df, c) =>
      df.withColumn(c, col(s"_c_$c"))
    }
    renamed.drop(
      (Seq("_kind", "_ats") ++ rightCols.flatMap(c => Seq(s"_r_$c", s"_c_$c"))): _*)
  }

  /** As-of join with a STALENESS TOLERANCE: like [[asofJoin]], but a
    * match older than `toleranceSec` at the left row's timestamp is
    * treated as no match (payloads null) — the "state expires" flavor of
    * latest-state joins (sensor offline, quote stale). Same single keyed
    * shuffle; the matched right timestamp rides the window pass as one
    * extra carried column and the staleness test is a map-side filter.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String,
                        rightCols: Seq[String], toleranceSec: Long): DataFrame = {
    // the matched-timestamp carrier must not shadow a caller column —
    // pick a name no input uses (asofJoin guards its own temporaries)
    val taken = (left.columns ++ right.columns).toSet
    val mts = Iterator.from(0).map(i => if (i == 0) "_mts" else s"_mts$i")
      .find(n => !taken.contains(n)).get
    val rr = right.withColumn(mts, col(rightTs))
    val joined = asofJoin(left, rr, key, leftTs, rightTs, rightCols :+ mts)
    val fresh = col(mts).isNotNull &&
      (unix_micros(col(leftTs)) - unix_micros(col(mts))) <=
        lit(toleranceSec * 1000000L)
    rightCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }.drop(mts)
  }

  /** Range (interval-containment) join: left rows with a point column
    * joined to right interval rows [lo, hi) that contain it.
    *
    * Mechanics: each interval is exploded into the fixed-width bins it
    * overlaps; the join is an equi-join on bin id with an exact
    * containment filter — candidate pairs are proportional to interval
    * coverage, never |left| x |right|. `binWidth` trades replication
    * (wide intervals -> many bins) against bin occupancy.
    */
  def rangeJoinByBins(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    val pBinned = points.withColumn("_bin",
      floor(col(pointCol) / lit(binWidth)).cast("long"))
    val iBinned = intervals.withColumn("_bin",
      explode(sequence(
        floor(col(loCol) / lit(binWidth)).cast("long"),
        floor((col(hiCol) - lit(1e-12)) / lit(binWidth)).cast("long"))))
    pBinned.join(iBinned, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }
}
