package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (co-located) storage: write fact tables bucketed + sorted by
  * their join/aggregation key so repeated joins and groupBys on that key
  * run with NO exchange — at 100 TB the shuffle is the dominant cost of a
  * fact-fact join, and bucketing pays it once at write time instead of
  * per query. (SURVEY §1.4 / prompt: "use bucketing for co-located
  * joins".)
  *
  * Spark buckets live in the session catalog (saveAsTable); both sides
  * must agree on bucket count and key.
  */
object BucketedStore {

  /** Write `df` as a bucketed, sorted catalog table (overwrites; also
    * clears an orphaned managed-table location left by a crashed writer,
    * which Spark refuses to reuse).
    *
    * The pre-write `repartition(buckets, key)` aligns task partitioning
    * with the bucket spec (both Murmur3 on the key), so each bucket lands
    * in EXACTLY ONE file — the condition under which Spark's scan reports
    * the bucket sort order and downstream sort-merge/as-of joins elide
    * both the exchange AND the sort (AsOfJoinSpec asserts this; the sort
    * elision additionally needs
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, default-off
    * since SPARK-28595 but sound under this single-file layout). Write
    * parallelism = bucket count, the standard bucketed-write shape.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.repartition(buckets, col(key))
      .write.mode("overwrite").bucketBy(buckets, key)
    (if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*))
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both exchanges (verify with .explain: no Exchange above the scans).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Aggregation on the bucket key of a bucketed table — no exchange. */
  def colocatedAgg(spark: SparkSession, table: String, key: String): DataFrame =
    spark.table(table).groupBy(col(key))
      .agg(count(lit(1)).as("cnt"), max(col("value")).as("vmax"))
}
