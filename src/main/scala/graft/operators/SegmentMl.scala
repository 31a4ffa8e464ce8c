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
