package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal binary-column plumbing: schema, batch shape, determinism. */
class MultimodalSpec extends AnyFunSuite with SparkTest {

  private lazy val docs = {
    import spark.implicits._
    Seq((0L, "hello world"), (1L, ""), (2L, "a" * 100)).toDF("doc_id", "text")
  }

  test("byte histogram bins sum to payload length") {
    import spark.implicits._
    val rows = Multimodal.byteHistogram(Multimodal.withPayload(
        docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
          .withColumn("n_chars", length(col("text")).cast("long"))))
      .as[(Long, Long, Seq[Long])].collect()
    rows.foreach { case (_, n, hist) =>
      assert(hist.length == 16 && hist.sum == n)
    }
    val empty = rows.find(_._1 == 1L).get
    assert(empty._2 == 0L && empty._3.sum == 0L)
  }

  test("frame sampling: counts and stride are exact and deterministic") {
    import spark.implicits._
    val out = Multimodal.frameSample(Multimodal.withPayload(
        docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
          .withColumn("n_chars", length(col("text")).cast("long"))),
      frameBytes = 16, stride = 2)
      .as[(Long, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> r).toMap
    // doc 2: 100 bytes -> 6 full frames -> frames 0,2,4 sampled
    assert(out(2L)._2 == 6L && out(2L)._3 == 3L)
    assert(out(1L)._2 == 0L && out(1L)._3 == 0L)
    // deterministic: rerun yields identical frame checksums
    val again = Multimodal.frameSample(Multimodal.withPayload(
        docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
          .withColumn("n_chars", length(col("text")).cast("long"))),
      16, 2).as[(Long, Long, Long, Seq[Long])].collect().map(r => r._1 -> r._4).toMap
    out.foreach { case (id, r) => assert(again(id) == r._4) }
  }

  test("testdata documents are pure ASCII (mm oracle unicode==byte premise)") {
    // the mm_features/mm_frames oracles fold over unicode(char); they equal
    // the engine's UTF-8 byte folds only while every doc is single-byte
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(dir).isDirectory) {
        val nonAscii = Tables.documents(spark, dir)
          .filter(octet_length(col("text")) =!= length(col("text"))).count()
        assert(nonAscii == 0L, s"non-ASCII text in $dir breaks the mm oracles")
      }
    }
  }
}
