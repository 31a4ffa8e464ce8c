package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped share point between a model-fitting query and its
  * `_check` companion (emb_kmeans / ml_classifiers / ml_kmeans_purity):
  * the primary query ALWAYS re-fits and publishes its artifact here (so
  * its bench reps keep timing real work), while the companion reuses the
  * published artifact when the primary already ran in this session and
  * only falls back to fitting when invoked standalone. Both sides are
  * deterministic (seeded fits), so reuse-vs-refit cannot change a
  * result — it only stops a full sweep from paying every training job
  * twice.
  *
  * Keys are scoped by session identity: artifacts die with their
  * session, and a checkpointed frame is never served to a session that
  * cannot read it.
  */
object FitCache {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  private def keyOf(spark: SparkSession, key: String): String =
    System.identityHashCode(spark) + ":" + key

  /** Evaluate `f`, publish the artifact, return it. DataFrames should be
    * materialized (localCheckpoint) by the caller so the companion reads
    * rows, not a plan to re-fit.
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
}
