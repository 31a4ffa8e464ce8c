package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Session-scoped share point between a model-fitting query and its
  * `_check` companion (emb_kmeans / ml_classifiers / ml_kmeans_purity /
  * storage_codec_cr): the primary query ALWAYS re-fits and publishes its
  * artifact here (so its bench reps keep timing real work), while the
  * companion reuses the published artifact when the primary already ran
  * in this session and only falls back to fitting when invoked
  * standalone. Both sides are deterministic (seeded fits), so
  * reuse-vs-refit cannot change a result — it only stops a full sweep
  * from paying every training job twice.
  *
  * DataFrame artifacts are stored as COLLECTED rows + schema, not as
  * cached/checkpointed frames: every published artifact is a bounded
  * summary (accuracy/prediction dumps, a 19-row codec matrix, a 1-row
  * purity), and driver-held rows survive the bench harness's
  * between-rep unpersist sweep, which would invalidate a localCheckpoint
  * and poison the companion. Keys are scoped by session identity.
  */
object FitCache {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  private def keyOf(spark: SparkSession, key: String): String =
    System.identityHashCode(spark) + ":" + key

  /** Evaluate `f`, publish the artifact, return it (non-DataFrame
    * artifacts, e.g. a fitted model object).
    */
  def put[T <: AnyRef](spark: SparkSession, key: String)(f: => T): T = {
    val v = f
    cache.put(keyOf(spark, key), v)
    v
  }

  /** The published artifact if the primary ran in this session, else `f`. */
  def getOrFit[T <: AnyRef](spark: SparkSession, key: String)(f: => T): T =
    cache.get(keyOf(spark, key)) match {
      case Some(v) => v.asInstanceOf[T]
      case None => f
    }

  /** Evaluate the frame, collect it (forcing the fit — the primary's
    * timing stays honest), publish rows + schema, and return a
    * local-relation frame over them.
    */
  def putDf(spark: SparkSession, key: String)(f: => DataFrame): DataFrame = {
    val df = f
    val rows = df.collect()
    val schema = df.schema
    cache.put(keyOf(spark, key), (schema, rows))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  /** A frame over the published rows if the primary ran this session,
    * else a one-shot materialization of `f` (collected so the
    * companion's multi-reference plan does not re-run the fit per
    * branch).
    */
  def getOrFitDf(spark: SparkSession, key: String)
                (f: => DataFrame): DataFrame =
    cache.get(keyOf(spark, key)) match {
      case Some(v) =>
        val (schema, rows) =
          v.asInstanceOf[(org.apache.spark.sql.types.StructType, Array[Row])]
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      case None =>
        val df = f
        spark.createDataFrame(
          java.util.Arrays.asList(df.collect(): _*), df.schema)
    }
}
