package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-facing registrations for embedding similarity search and
  * embedding-space ML. The brute-force paths carry exact DuckDB oracles
  * (list_dot_product over DOUBLE[] is the same sequential fold); the LSH
  * and spark.ml paths are approximate/engine-specific -> rows-only +
  * ScalaTest recall/quality assertions.
  */
object AnnQueries {

  private def emb(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(s)
    Tables.embeddings(s, d)
  }

  private def probes(s: SparkSession, d: String): DataFrame =
    emb(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))

  private def corpus(s: SparkSession, d: String): DataFrame =
    emb(s, d).select(col("vec_id").as("cand_id"), col("embedding").as("ce"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_brute" -> ((s, d) =>
      Similarity.bruteTopK(probes(s, d), corpus(s, d), 10)),

    "ann_lsh" -> ((s, d) =>
      Similarity.lshTopK(probes(s, d), corpus(s, d), 10)),

    "emb_norm" -> ((s, d) =>
      emb(s, d).select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(Similarity.l2(col("embedding")), 6).as("l2"))),

    "emb_knn_1nn" -> ((s, d) => {
      val e = emb(s, d)
      val test = e.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("test_id"), col("embedding").as("te"),
          col("label").cast("long").as("true_label"))
      val train = e.filter(col("vec_id") % 5 =!= 0)
        .select(col("vec_id").as("train_id"), col("embedding").as("tre"),
          col("label").cast("long").as("train_label"))
      Similarity.knn1(test, train)
    }),

    "emb_kmeans" -> ((s, d) => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.linalg.Vectors
      val toVec = udf((a: Seq[Float]) =>
        Vectors.dense(a.map(_.toDouble).toArray))
      val feat = emb(s, d).select(col("vec_id"), col("label"),
        toVec(col("embedding")).as("features"))
      val model = new KMeans().setK(10).setSeed(42L).setMaxIter(20).fit(feat)
      model.transform(feat)
        .groupBy(col("prediction").cast("long").as("cluster"))
        .agg(count(lit(1)).as("cnt"))
    })
  )

  val oracles: Map[String, String] = Map(
    "ann_brute" ->
      """WITH p AS (
        |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pe
        |  FROM embeddings WHERE vec_id < 10
        |), c AS (
        |  SELECT vec_id AS cand_id, embedding::DOUBLE[] AS ce FROM embeddings
        |), s AS (
        |  SELECT probe_id, cand_id,
        |    round(list_dot_product(pe, ce) /
        |          (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(ce, ce))), 6) AS sim
        |  FROM p JOIN c ON probe_id <> cand_id
        |), r AS (
        |  SELECT probe_id, cand_id, sim,
        |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rnk
        |  FROM s
        |)
        |SELECT probe_id, cand_id, sim, rnk FROM r WHERE rnk <= 10""".stripMargin,

    "emb_norm" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2
        |FROM embeddings""".stripMargin,

    "emb_knn_1nn" ->
      """WITH t AS (
        |  SELECT vec_id AS test_id, embedding::DOUBLE[] AS te,
        |         CAST(label AS BIGINT) AS true_label
        |  FROM embeddings WHERE vec_id % 5 = 0
        |), tr AS (
        |  SELECT vec_id AS train_id, embedding::DOUBLE[] AS tre,
        |         CAST(label AS BIGINT) AS train_label
        |  FROM embeddings WHERE vec_id % 5 <> 0
        |), s AS (
        |  SELECT test_id, true_label, train_id, train_label,
        |    round(list_distance(te, tre), 6) AS dist
        |  FROM t JOIN tr ON test_id <> train_id
        |), r AS (
        |  SELECT test_id, train_label, true_label,
        |    row_number() OVER (PARTITION BY test_id ORDER BY dist, train_id) AS rnk
        |  FROM s
        |)
        |SELECT test_id, train_label AS pred_label, true_label FROM r WHERE rnk = 1""".stripMargin
  )
}
