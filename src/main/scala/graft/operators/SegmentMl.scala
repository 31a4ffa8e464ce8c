package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series ML over the segment-array view — the reference's kNN and
  * kernel-feature workloads (database/src/knn/mod.rs:310 classify,
  * kernel.rs:132 Kernel::run / :183 rbfrun) on Spark primitives.
  */
object SegmentMl {

  /** RBF kernel feature row: exp(-gamma * ||x - d||^2) against a small
    * dictionary of segments (broadcast as literals — the reference reads
    * its dictionary from a TSV, client.rs:346). Pure column expressions.
    */
  def rbfFeatures(segments: DataFrame, dict: Seq[Seq[Double]], gamma: Double): DataFrame = {
    val feats = dict.zipWithIndex.map { case (d, i) =>
      exp(lit(-gamma) * Similarity.sqDist(col("values"), typedLit(d))).as(s"k$i")
    }
    segments.select(col("signal_id") +: col("seg") +: feats: _*)
  }

  /** M2 — SINK/GRAIL kernel feature row (reference kernel.rs:132 Kernel::run
    * over sinkcompressed :326): shift-invariant FFT cross-correlation
    * similarity against a small broadcast dictionary. Computed per segment
    * in a typed partition map (Breeze FFT is a JVM library call, not a
    * column expression); the dictionary rides the closure — the same
    * broadcast-dictionary shape as rbfFeatures, fine at 100 TB because the
    * per-row work is O(dict * seg log seg) with no shuffle.
    */
  def sinkFeatures(segments: DataFrame, dict: Seq[Array[Double]],
                   gamma: Double, keep: Int): DataFrame = {
    val spark = segments.sparkSession
    import spark.implicits._
    import graft.functions.TierTransforms
    segments.select(col("signal_id"), col("seg"), col("values"))
      .as[(Long, Long, Seq[Double])]
      .map { case (sid, seg, vs) =>
        val xs = vs.toArray
        (sid, seg, dict.map(d => TierTransforms.sink(xs, d, gamma, keep)))
      }
      .toDF("signal_id", "seg", "sink")
      .select(col("signal_id") +: col("seg") +:
        dict.indices.map(i => col("sink").getItem(i).as(s"k$i")): _*)
  }

  /** 1-NN among complete segments: each "test" segment (signals in
    * testSignals) takes the signal id of its nearest "train" segment by
    * squared euclidean — the UCR-archive classification shape.
    */
  def knnSegments(segments: DataFrame, testSignals: Seq[Long]): DataFrame = {
    val test = segments.filter(col("signal_id").isin(testSignals: _*))
      .select(col("signal_id").as("test_sig"), col("seg").as("test_seg"),
        col("values").as("tv"))
    val train = segments.filter(!col("signal_id").isin(testSignals: _*))
      .select(col("signal_id").as("train_sig"), col("seg").as("train_seg"),
        col("values").as("rv"))
    val joined = train.join(broadcast(test), lit(true))
      .select(col("test_sig"), col("test_seg"), col("train_sig"), col("train_seg"),
        round(sqrt(Similarity.sqDist(col("tv"), col("rv"))), 6).as("dist"))
    val w = Window.partitionBy(col("test_sig"), col("test_seg"))
      .orderBy(col("dist"), col("train_sig"), col("train_seg"))
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("test_sig"), col("test_seg"),
        col("train_sig").as("pred_sig"), col("dist"))
  }
}
