package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/scan setup should not be billed to the
    // alphabetically-first query
    try {
      SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).count())
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    } catch { case _: Throwable => () }
    // deterministic run order; failures are reported per-query and
    // excluded from the headline total instead of polluting it
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val outcome =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.getClass.getSimpleName + ": " + e.getMessage) }
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-22s $secs%8.2fs ${outcome.getOrElse("")}")
      (name, secs, outcome)
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    val qs = results.map {
      case (k, v, None) => s""""$k":$v"""
      case (k, _, Some(err)) => s""""$k":{"err":"${esc(err.take(200))}"}"""
    }.mkString("{", ",", "}")
    val ok = results.filter(_._3.isEmpty)
    val total = ok.map(_._2).sum
    val nerr = results.count(_._3.nonEmpty)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_ok":${ok.size},"n_err":$nerr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
