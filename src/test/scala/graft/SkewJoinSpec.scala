package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

/** Salted joins must preserve exact join multiplicity on skewed data. */
class SkewJoinSpec extends AnyFunSuite with SparkTest {

  // one hot key (0) with 10k rows, a tail of 100 keys with 10 rows each
  private lazy val (left, right) = {
    import spark.implicits._
    val l = (Seq.fill(10000)(0L) ++ (1L to 100L).flatMap(k => Seq.fill(10)(k)))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "row_id")
    val r = (0L to 100L).map(k => (k, s"dim$k")).toDF("k", "attr")
    (l, r)
  }

  test("saltedJoin equals the plain join exactly") {
    val plain = left.join(right, Seq("k"))
      .select(col("k"), col("row_id"), col("attr"))
    val salted = SkewJoin.saltedJoin(left, right, "k", col("row_id"), 8)
      .select(col("k"), col("row_id"), col("attr"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("adaptiveJoin with detected heavy hitters equals the plain join") {
    val heavy = SkewJoin.heavyHitters(left, "k", threshold = 10.0)
    assert(heavy == Seq(0L), s"expected [0], got $heavy")
    val adaptive = SkewJoin.adaptiveJoin(left, right, "k", col("row_id"), heavy, 8)
      .select(col("k"), col("row_id"), col("attr"))
    val plain = left.join(right, Seq("k"))
      .select(col("k"), col("row_id"), col("attr"))
    assert(adaptive.count() == plain.count())
    assert(adaptive.except(plain).isEmpty && plain.except(adaptive).isEmpty)
  }

  test("heavy-hitter list is capped at the N largest keys") {
    // threshold 0 admits every key; the cap must keep only the heaviest,
    // ordered by count (the hot key first)
    val heavy = SkewJoin.heavyHitters(left, "k", threshold = 0.0, maxKeys = 5)
    assert(heavy.length == 5, s"cap not applied: $heavy")
    assert(heavy.head == 0L, "hot key must rank first")
  }

  test("right-side duplicates are preserved (multiplicity, not distinct)") {
    import spark.implicits._
    val rDup = Seq((0L, "a"), (0L, "b"), (1L, "c")).toDF("k", "attr")
    val lSmall = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("k", "row_id")
    val plain = lSmall.join(rDup, Seq("k"))
    val salted = SkewJoin.saltedJoin(lSmall, rDup, "k", col("row_id"), 4)
    assert(salted.count() == plain.count()) // 2*2 + 1 = 5
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
