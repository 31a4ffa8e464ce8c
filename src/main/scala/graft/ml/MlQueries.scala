package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Readings

/** Driver-facing registrations for the ML/policy surface (M3/M4/M5).
  * These are model-training / generator / estimator ops — not
  * SQL-expressible — so they are rows-only entries backed by ScalaTest
  * quality assertions (MlSpec).
  */
object MlQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M3: classifier suite on embeddings (labels are synthetic; the
    // deliverable is the deterministic train/eval pipeline shape)
    "ml_classifiers" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val feats = Classifiers.featuresFrame(e, "embedding", "label")
      val train = feats.where(pmod(hash(col("features")), lit(5)) =!= 0)
      val test = feats.where(pmod(hash(col("features")), lit(5)) === 0)
      Classifiers.trainEval(train, test)
    }),

    "ml_kmeans_purity" -> ((s, d) =>
      Classifiers.kmeansPurity(
        Classifiers.featuresFrame(Tables.embeddings(s, d), "embedding", "label"),
        k = 10)),

    // M4: deterministic outlier fixture — output its summary stats
    "ml_outlier_fixture" -> ((s, _) =>
      Fixtures.outlierColumn(s, 10000L, 0.1)
        .agg(count(lit(1)).as("n"),
          sum(col("is_outlier").cast("long")).as("n_outliers"),
          max(col("value")).as("vmax"))),

    // M5: per-codec compression-ratio estimates over the readings sample
    "ml_cr_predict" -> ((s, d) =>
      CrPredictor.estimate(Readings.of(s, d), sampleFraction = 0.5,
        scale = Readings.Scale))
  )

  val oracles: Map[String, String] = Map.empty
}
