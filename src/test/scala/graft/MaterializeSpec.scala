package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Materialize

/** Size-gated shared materialization: the local-checkpoint fast path and
  * the staged-parquet fallback must return identical rows and schema, and
  * both must truncate lineage (the upstream pipeline executes once).
  */
class MaterializeSpec extends AnyFunSuite with SparkTest {

  private def fixture = {
    import spark.implicits._
    (1L to 200L).map(i => (i % 7, i, i * 0.5)).toDF("signal_id", "seq_no", "value")
  }

  test("small frame takes the localCheckpoint path and preserves rows") {
    spark.conf.unset("spark.graft.materialize.maxLocalBytes")
    val df = fixture.withColumn("d", col("value") * 2)
    val m = Materialize.shared(df)
    // local checkpoint => the plan is an RDD scan leaf, not the pipeline
    assert(m.queryExecution.optimizedPlan.collectLeaves().exists(
      _.getClass.getSimpleName.contains("LogicalRDD")))
    assert(m.schema == df.schema)
    assert(m.collect().toSet == df.collect().toSet)
  }

  test("past the size threshold the frame stages to parquet, same rows") {
    spark.conf.set("spark.graft.materialize.maxLocalBytes", "0")
    try {
      val df = fixture.withColumn("d", col("value") * 2)
      val m = Materialize.shared(df)
      // staged => the plan reads a file source, holds no executor storage
      assert(m.queryExecution.optimizedPlan.collectLeaves().exists(
        _.getClass.getSimpleName.contains("LogicalRelation")))
      assert(spark.sparkContext.getPersistentRDDs.isEmpty ||
        !m.queryExecution.optimizedPlan.collectLeaves().exists(
          _.getClass.getSimpleName.contains("LogicalRDD")))
      // file sources force nullability, so names+types must survive the
      // round-trip but nullable flags widen (documented on Materialize)
      assert(m.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)))
      assert(m.collect().toSet == df.collect().toSet)
    } finally spark.conf.unset("spark.graft.materialize.maxLocalBytes")
  }

  test("sharedIfLarge passes small frames through and engages past the bound") {
    val df = fixture.withColumn("d", col("value") * 2)
    spark.conf.unset("spark.graft.materialize.minSharedBytes")
    // default bound (256 MiB): a 200-row frame passes through untouched —
    // same plan object, no materialization job
    val small = Materialize.sharedIfLarge(df)
    assert(small eq df)
    // bound forced to zero: the gate engages and shared()'s discipline
    // applies (here the local fast path — the plan becomes an RDD leaf)
    spark.conf.set("spark.graft.materialize.minSharedBytes", "0")
    try {
      val m = Materialize.sharedIfLarge(df)
      assert(m.queryExecution.optimizedPlan.collectLeaves().exists(
        _.getClass.getSimpleName.contains("LogicalRDD")))
      assert(m.collect().toSet == df.collect().toSet)
    } finally spark.conf.unset("spark.graft.materialize.minSharedBytes")
  }

  test("staged path keeps operator results identical (codec-matrix shape)") {
    import spark.implicits._
    val readings = (1L to 100L).map(i => (i % 5, i, i * 0.25, (i * 25)))
      .toDF("signal_id", "seq_no", "value", "value_q")
    spark.conf.set("spark.graft.materialize.maxLocalBytes", "0")
    try {
      val staged = Materialize.shared(readings)
      val sums = staged.groupBy(col("signal_id"))
        .agg(sum(col("value_q")).as("s")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val direct = readings.groupBy(col("signal_id"))
        .agg(sum(col("value_q")).as("s")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(sums == direct)
    } finally spark.conf.unset("spark.graft.materialize.maxLocalBytes")
  }
}
