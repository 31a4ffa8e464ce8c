package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

/** Materialized training-corpus store — the sink of the curation pipeline
  * and the layout a trainer actually reads: curate → split → pack, written
  * as Parquet partitioned by (split, lang).
  *
  * Layout rationale at 100 TB: split/lang are low-cardinality partition
  * keys (3 × #languages directories), so a training job reads
  * `split=train/` with full partition pruning and never touches val/test;
  * shard and pack_id stay as data columns (pack_id is the read-order key
  * within a partition, and parquet row-group stats make `pack_id BETWEEN`
  * scans skip). Packing runs AFTER curation so pack token budgets reflect
  * the corpus the trainer sees.
  */
object CorpusStore {

  /** Build the curated/split/packed corpus view (no side effects). */
  def curatedCorpus(docs: DataFrame, budgetTokens: Long, shards: Int,
                    minToks: Long, maxToks: Long): DataFrame = {
    val curated = PipelineOps.curate(docs, minToks, maxToks)
    val split = PipelineOps.sampleSplit(docs).select(col("doc_id"), col("split"))
    val packs = PipelineOps.packAssignmentsFromToks(
        curated.select(col("doc_id"), col("lang"), col("toks")),
        budgetTokens, shards)
      .select(col("doc_id"), col("shard"), col("start_tok"), col("pack_id"))
    curated
      .join(split, "doc_id")       // map-only side: broadcastable hash split
      .join(packs, "doc_id")
      .select(col("doc_id"), col("lang"), col("split"), col("shard"),
        col("pack_id"), col("start_tok"), col("toks"), col("cleaned"))
  }

  /** Write the corpus partitioned by (split, lang). */
  def write(docs: DataFrame, outDir: String, budgetTokens: Long = 512L,
            shards: Int = 8, minToks: Long = 5L, maxToks: Long = 1000L): Unit =
    curatedCorpus(docs, budgetTokens, shards, minToks, maxToks)
      .write.mode("overwrite").partitionBy("split", "lang").parquet(outDir)

  /** Read one split back (partition-pruned scan). */
  def readSplit(spark: SparkSession, dir: String, split: String): DataFrame =
    spark.read.parquet(dir).filter(col("split") === split)
}
