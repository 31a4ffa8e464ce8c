package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** SemDeDup semantics on hand-checkable vectors: within-cell near-dups
  * collapse to the min-id keeper, cross-cell near-dups are (by design)
  * not paired, and the candidate join is keyed by cell.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkTest {
  import org.apache.spark.sql.DataFrame

  // centroids on +x and +y; vectors cluster around them
  private val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))

  private def vecs(rows: (Long, Array[Double])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("within-cell duplicates collapse to the min-id keeper") {
    val v = vecs(
      10L -> Array(1.0, 0.01),   // cell 0
      11L -> Array(1.0, 0.02),   // cell 0, near-dup of 10
      12L -> Array(0.02, 1.0),   // cell 1
      13L -> Array(0.01, 1.0),   // cell 1, near-dup of 12
      14L -> Array(0.7, 0.72))   // cell 1 (slightly y-leaning), alone-ish
    val out = Similarity.semanticDedup(v, "vec_id", "embedding", cents, 0.999)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(10L)._1 === 0L && out(11L)._1 === 0L)
    assert(out(12L)._1 === 1L && out(13L)._1 === 1L)
    // dup groups keep the min id
    assert(out(10L)._2 === 10L && out(10L)._3 === true)
    assert(out(11L)._2 === 10L && out(11L)._3 === false)
    assert(out(12L)._2 === 12L && out(12L)._3 === true)
    assert(out(13L)._2 === 12L && out(13L)._3 === false)
    // 14 is its own singleton component and a keeper
    assert(out(14L)._2 === 14L && out(14L)._3 === true)
  }

  test("cross-cell near-duplicates are not paired (the SemDeDup bargain)") {
    // two nearly-identical vectors straddling the 45-degree cell boundary
    val v = vecs(
      20L -> Array(0.71, 0.70),  // cell 0
      21L -> Array(0.70, 0.71))  // cell 1
    val out = Similarity.semanticDedup(v, "vec_id", "embedding", cents, 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(20L) && out(21L), "cross-cell pair must survive as two keepers")
  }

  test("candidate join is keyed by cell — no cartesian product") {
    val v = vecs(30L -> Array(1.0, 0.0), 31L -> Array(0.0, 1.0))
    val plan = Similarity.semanticDedup(v, "vec_id", "embedding", cents, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join:\n$plan")
  }
}
