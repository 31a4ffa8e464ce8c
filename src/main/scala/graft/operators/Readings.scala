package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Quantize

/** Canonical time-series "readings" view over the `events` table.
  *
  * Maps the reference's Signal/Segment data model (reference
  * database/src/segment.rs:78-90, future_signal.rs:26) onto a proper wide
  * table: `signal_id` = events.user_id, event-time `ts`, `value`, a
  * fixed-point `value_q` (scale 10^2), and a per-signal positional `seq_no`
  * (the reference's windows are row-positional, SURVEY §2.6 / §7.4).
  *
  * Scale note: `seq_no` is a window function partitioned BY SIGNAL — one
  * shuffle on signal_id, no global ordering, so it distributes at 100 TB.
  * In production the engine persists seq_no/value_q at ingestion time
  * (see graft.streaming.Ingest) so queries read them from Parquet instead
  * of recomputing; for correctness runs against the driver's immutable
  * testdata we derive them in-query, deterministically (ordered by
  * (ts, event_id), both unique-ified by event_id).
  */
object Readings {
  val Scale = 2            // fixed-point decimal digits
  val SegmentRows = 16L    // rows per segment (reference segment_size=1000,
                           // scaled to the testdata's ~67 rows/signal)

  def of(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(
      col("user_id").as("signal_id"),
      col("ts"),
      col("value"),
      Quantize.quantize(col("value"), Scale).as("value_q"),
      row_number().over(w).cast("long").as("seq_no"))
  }

  /** Positional tumbling-window id: floor((seq_no - 1 - start) / width). */
  def posWindow(seqNo: Column, start: Long, width: Long): Column =
    floor((seqNo - lit(1) - lit(start)) / lit(width.toDouble)).cast("long")

  /** Segment id of a row — maps rows to the reference's fixed-size chunks. */
  def segmentId(seqNo: Column): Column = posWindow(seqNo, 0L, SegmentRows)

  /** SQL (DuckDB dialect) equivalent of `of` — shared WITH-prefix for oracles. */
  val OracleCte: String =
    """WITH r AS (
      |  SELECT user_id AS signal_id, ts, value,
      |         CAST(floor(value * 100) AS BIGINT) AS value_q,
      |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq_no
      |  FROM events
      |)""".stripMargin
}
