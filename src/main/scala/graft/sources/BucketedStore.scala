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
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
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
