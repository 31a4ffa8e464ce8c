package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary: the driver regenerates the testdata between rounds
  * and has already flipped events.ts between TIMESTAMP(NANOS) and
  * TIMESTAMP(MICROS). If the physical type drifts again, THIS spec fails
  * with one clear message instead of 37 downstream DATATYPE_MISMATCH stacks.
  */
class TablesSpec extends AnyFunSuite with SparkTest {
  private val sfDir = "/root/testdata/sf0.001"

  test("events loader resolves ts to TimestampType against live testdata") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts resolved to ${ev.schema("ts").dataType}; Tables.normalizeTs " +
      "must branch on the new physical type")
    assert(ev.count() > 0)
  }

  test("Readings.of resolves and yields sane event-times") {
    val r = graft.operators.Readings.of(spark, sfDir)
    val row = r.agg(
      count(lit(1)).as("n"),
      min(year(col("ts"))).as("ymin"),
      max(year(col("ts"))).as("ymax")).head()
    assert(row.getLong(0) > 0)
    // timestamps in a plausible calendar range (a nanos-vs-micros mixup
    // lands in year 1970 or year ~52000)
    assert(row.getInt(1) >= 1990 && row.getInt(2) <= 2100,
      s"ts year range [${row.getInt(1)}, ${row.getInt(2)}] — unit mismatch?")
  }

  test("normalizeTs handles the legacy nanos-as-long generation") {
    val ns = spark.range(3).select(
      (col("id") * 1000000000L + 1700000000000000000L).as("ts"))
    val out = Tables.normalizeTs(ns)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.count() === 3)
  }
}
