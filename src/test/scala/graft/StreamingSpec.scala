package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Ingest
import graft.operators.{Readings, Segments}

/** S1–S3 — batch/stream parity: replaying the events table through the
  * streaming pipeline must produce exactly the batch-derived state
  * (FIXTURES F6 style).
  */
class StreamingSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"

  private def stageInput(): String = {
    val dir = Files.createTempDirectory("graft-stream-in")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("tier-0 replay: streamed parquet equals the batch readings view") {
    val in = stageInput()
    val tier0 = Files.createTempDirectory("graft-tier0").toString + "/data"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = Ingest.tier0Writer(
      Ingest.readingsStream(spark, in), tier0, ckpt)
    q.awaitTermination()

    val streamed = spark.read.parquet(tier0)
    val batch = Readings.of(spark, sf)
    assert(streamed.count() == batch.count())
    val a = streamed.agg(sum(col("value_q")), countDistinct(col("signal_id")))
      .collect()(0)
    val b = batch.agg(sum(col("value_q")), countDistinct(col("signal_id")))
      .collect()(0)
    assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
    // partition layout: bucketed by signal for pruning
    assert(new java.io.File(tier0).listFiles().exists(_.getName.startsWith("sig_bucket=")))
  }

  test("stream segmentation matches batch complete segments") {
    val in = stageInput()
    import spark.implicits._
    val segStream = Ingest.segmentStream(spark, in, Readings.SegmentRows.toInt)
    val q = segStream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("segs_parity")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("segs_parity")
      .select(col("signal_id"), col("seg"), col("values"))
      .as[(Long, Long, Seq[Double])].collect()
      .map { case (s, g, v) => (s, g) -> v }.toMap
    val batch = Segments.complete(Readings.of(spark, sf))
      .select(col("signal_id"), col("seg"), col("values"))
      .as[(Long, Long, Seq[Double])].collect()
      .map { case (s, g, v) => (s, g) -> v }.toMap

    assert(streamed.keySet == batch.keySet, "segment key sets differ")
    streamed.foreach { case (k, v) => assert(v == batch(k), s"segment $k differs") }
  }

  test("streaming windowed max with watermark runs and matches batch") {
    val in = stageInput()
    val q = Ingest.windowedMax(
      Ingest.readingsStream(spark, in), "1 day", "1 hour")
      .writeStream.outputMode("complete").format("memory")
      .queryName("wmax_parity")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("wmax_parity").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val batch = graft.operators.TsQuery.windowAggTime(Readings.of(spark, sf), "1 day")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }
}
