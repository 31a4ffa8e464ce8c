package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CorpusStore

/** The materialized training corpus: layout, pruning, and parity between
  * the written store and the in-memory pipeline view.
  */
class CorpusStoreSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"

  test("write partitions by (split, lang); read-back equals the pipeline view") {
    assume(new java.io.File(sf).isDirectory)
    val docs = Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-corpus").toString + "/corpus"
    CorpusStore.write(docs, out)

    // physical layout: split=... directories containing lang=... dirs
    val splitDirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(splitDirs.exists(_.startsWith("split=")), s"no split partitions in $splitDirs")

    val view = CorpusStore.curatedCorpus(docs, 512L, 8, 5L, 1000L)
    val back = spark.read.parquet(out)
    assert(back.count() == view.count())
    // exact content parity on the identifying columns
    val a = back.select("doc_id", "split", "pack_id", "toks").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val b = view.select("doc_id", "split", "pack_id", "toks").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
  }

  test("reading one split prunes partitions and yields only that split") {
    assume(new java.io.File(sf).isDirectory)
    val docs = Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-corpus").toString + "/corpus"
    CorpusStore.write(docs, out)
    val train = CorpusStore.readSplit(spark, out, "train")
    assert(train.select("split").distinct().collect().map(_.getString(0)).toSeq == Seq("train"))
    // partition pruning is visible in the scan: only split=train files read
    val scanned = train.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scanned.nonEmpty)
    val parts = scanned.head.relation.location.inputFiles
    assert(parts.nonEmpty)
    val prunedOk = scanned.head.metadata.get("PartitionFilters")
      .exists(_.contains("split"))
    assert(prunedOk, "split filter not pushed to partition pruning")
  }
}
