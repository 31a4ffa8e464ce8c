package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Dbscan

/** DBSCAN semantics on the deterministic fixture: three dense blobs become
  * three clusters, isolated points become noise, and the plan generates
  * candidates through the eps-grid cell join (never a cartesian product).
  */
class DbscanSpec extends AnyFunSuite with SparkTest {

  test("three blobs cluster, spaced noise stays noise") {
    val out = Dbscan.dbscan(Dbscan.fixture(spark), eps = 5.0, minPts = 4).cache()
    val n = out.count()
    assert(n === 457) // 3*150 + 7

    val clusters = out.filter(col("cluster") =!= -1L)
      .select(col("cluster")).distinct().count()
    assert(clusters === 3, s"expected 3 clusters, got $clusters")

    // every noise id is one of the 7 spaced far-field points
    val noise = out.filter(col("cluster") === -1L)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(noise.forall(_ >= 450L), s"blob point marked noise: ${noise.toSeq}")
    assert(noise.length === 7)

    // cluster label = min member id; the three blobs interleave ids mod 3,
    // so the minimal core ids are 0, 1, 2
    val labels = out.filter(col("cluster") =!= -1L)
      .select(col("cluster")).distinct().collect().map(_.getLong(0)).sorted
    assert(labels.toSeq === Seq(0L, 1L, 2L), s"labels: ${labels.toSeq}")

    // blob membership is exact: cluster == id % 3 for every non-noise point
    val wrong = out.filter(col("cluster") =!= -1L)
      .filter(col("cluster") =!= col("id") % 3L).count()
    assert(wrong === 0)
  }

  test("candidate generation is a cell equi-join, not a cartesian product") {
    val plan = Dbscan.dbscan(Dbscan.fixture(spark), eps = 5.0, minPts = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"dbscan plan degenerated to all-pairs:\n$plan")
  }

  test("minPts above local density turns everything to noise") {
    val sparse = Dbscan.fixture(spark, nPerCluster = 1, nNoise = 3)
    val out = Dbscan.dbscan(sparse, eps = 5.0, minPts = 4)
    assert(out.filter(col("cluster") =!= -1L).count() === 0)
  }
}
