package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object TmpIvfDbg extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  graft.functions.VectorFunctions.ensureRegistered(spark)
  val d = "/root/testdata/sf0.1"
  val emb = spark.read.parquet(d + "/embeddings.parquet")
  println("corpus rows: " + emb.count())
  val cents = emb.filter(col("vec_id") < 16).orderBy(col("vec_id"))
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
  def timeIt(tag: String)(f: => Long): Unit = {
    for (i <- 1 to 3) {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag rep$i: ${(System.nanoTime()-t0)/1e9}%.3f s (rows=$n)")
    }
  }
  import graft.operators.Similarity.{cosine, dot, l2}
  val corpus = emb.select(col("vec_id").as("cand_id"), col("embedding").cast("array<double>").as("ce"))
  def bestCell(v: org.apache.spark.sql.Column) = {
    val scored = array(cents.map { case (i, c) =>
      struct(cosine(v.cast("array<double>"), typedLit(c)).as("c"), lit(-i).as("negCell"))
    }: _*)
    -array_max(scored).getField("negCell")
  }
  timeIt("assign-only") {
    corpus.withColumn("cn", l2(col("ce"))).withColumn("cell", bestCell(col("ce")))
      .agg(sum(col("cell"))).count()
  }
  // hoisted-norm variant: cosine = dot/(cn * litnorm), same rounding
  def bestCell2(v: org.apache.spark.sql.Column, cn: org.apache.spark.sql.Column) = {
    val scored = array(cents.map { case (i, c) =>
      val cnorm = math.sqrt(c.map(x => x*x).sum)
      struct(round(dot(v, typedLit(c)) / (cn * lit(cnorm)), 6).as("c"), lit(-i).as("negCell"))
    }: _*)
    -array_max(scored).getField("negCell")
  }
  timeIt("assign-hoisted") {
    corpus.withColumn("cn", l2(col("ce"))).withColumn("cell", bestCell2(col("ce"), col("cn")))
      .agg(sum(col("cell"))).count()
  }
  val probes = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("probe_id"), col("embedding").cast("array<double>").as("pe"))
  timeIt("full ivfTopK") {
    graft.operators.Similarity.ivfTopK(probes, corpus, 10, cents, 4).count()
  }
  spark.stop()
}
