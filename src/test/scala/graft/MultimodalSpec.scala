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

  test("byteGramHashes equals xxhash64 over the byte windows, null/short safe") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val in = (Seq("hello world, a longer payload", "tiny", "", null): Seq[String])
      .toDF("text").withColumn("payload", encode(col("text"), "UTF-8"))
    val rows = in.select(col("text"),
      graft.functions.TextOps.byteGramHashes(col("payload"), 8).as("hs")).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val expect =
        if (t == null || t.length < 8) Seq.empty[Long]
        else t.sliding(8).map(g =>
          XXH64.hashUTF8String(UTF8String.fromString(g), 42L)).toSeq.distinct
      assert(r.getSeq[Long](1) == expect, s"gram hashes diverge for '$t'")
    }
  }

  test("contentDedup groups byte-identical payloads, keeper = min doc_id") {
    import spark.implicits._
    val d = Seq((0L, "same blob"), (1L, "same blob"), (2L, "other"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Multimodal.contentDedup(Multimodal.withPayload(d))
      .as[(String, Long, Long)].collect().map(r => r._3 -> r._2).toMap
    assert(out(0L) == 2L && out(2L) == 1L && out.size == 2)
  }

  test("nearDupBlobs finds planted byte near-dups via banding, never all-pairs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val d = Seq(
      (0L, base), (1L, base + "tail!"),              // near-identical pair
      (2L, "completely different content here " * 9),
      (3L, ("zz" + base.drop(2))))                   // near-dup of 0 too
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val nd = Multimodal.nearDupBlobs(Multimodal.withPayload(d), 16, 0.5)
    val pairs = nd.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // scale-shape guard: candidate generation must be the band equi-join —
    // no cartesian/nested-loop anywhere in the physical plan
    nd.collect()
    val plan = nd.queryExecution.executedPlan
    val bad = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"blob near-dup plan fell back to all-pairs: $bad")
  }

  test("byteWinnowHashes equals a reference winnow, short-input branches hold") {
    import spark.implicits._
    // reference: fnv32 per n-byte window, min per sliding window of w full
    // gram positions (all gram hashes when fewer than w exist), distinct
    def ref(bytes: Array[Byte], n: Int, w: Int): Seq[Long] = {
      if (bytes.length < n) return Seq.empty
      val grams = bytes.sliding(n).map(_.foldLeft(2166136261L)((h, b) =>
        ((h ^ (b & 0xff)) * 16777619L) & 0xffffffffL)).toVector
      val mins = if (grams.length < w) grams
                 else grams.sliding(w).map(_.min).toVector
      mins.distinct
    }
    val in = (Seq("the quick brown fox jumps over the lazy dog " * 4,
      "exactly sixteen!",      // one gram, fewer than w -> distinct-all
      "seventeen bytes!!",     // two grams, still short of w
      "fifteen bytes!!", "", null): Seq[String])
      .toDF("text").withColumn("payload", encode(col("text"), "UTF-8"))
    val rows = in.select(col("text"),
      graft.functions.TextOps.byteWinnowHashes(col("payload"), 16, 16).as("fp"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val expect = if (t == null) Seq.empty[Long]
                   else ref(t.getBytes("UTF-8"), 16, 16)
      assert(r.getSeq[Long](1) == expect, s"winnow diverges for '$t'")
    }
    // the long doc must actually winnow (fewer fingerprints than grams)
    val long = rows.head
    assert(long.getSeq[Long](1).nonEmpty &&
      long.getSeq[Long](1).size < long.getString(0).length - 15)
  }

  test("winnowed blob near-dup equals brute-force winnow Jaccard (exhaustive)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val d = Seq(
      (0L, base), (1L, base + "tail!"),
      (2L, "completely different content here " * 9),
      (3L, ("zz" + base.drop(2))),
      (4L, "completely different content here " * 9)) // exact dup of 2
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val withBin = Multimodal.withPayload(d)
    val nd = Multimodal.nearDupBlobsWinnow(withBin, 16, 16, 0.5)
    val got = nd.as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // brute force over the SAME winnow sets: all pairs, no candidates step
    val sets = Multimodal.winnowSets(withBin, 16, 16).localCheckpoint()
    val brute = sets.as("a").crossJoin(sets.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        graft.functions.TextOps.jaccardLongSets(col("a.sh"), col("b.sh")).as("jac"))
      .filter(col("jac") >= 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == brute, s"postings candidates missed a pair: got $got vs $brute")
    assert(got.contains((0L, 1L)) && got.contains((0L, 3L)) &&
      got((2L, 4L)) == 1.0)
    // scale-shape guard: the candidate generator is the postings
    // equi-join — no cartesian/nested-loop in the physical plan
    val plan = nd.queryExecution.executedPlan
    val bad = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"winnow near-dup plan fell back to all-pairs: $bad")
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
