package graft

import org.apache.spark.sql.SparkSession

/** Fit-vs-score cost split for the isolation forest — the measurement
  * behind the fixed-ψ design claim: fit cost past the feature scan is
  * independent of data size (one distributed top-k pass + driver growth
  * over ≤ trees·ψ rows), while scoring is one map-only pass that scales
  * with rows. Run at two scales and compare:
  *
  *   java -cp ... graft.FitBench /root/testdata/sf0.1
  *   java -cp ... graft.FitBench /tmp/graft_sf1
  *
  * Prints one JSON line: {"sf":..., "rows":N, "feat_sec":..,
  * "fit_sec":.., "score_sec":..} (each the median of 3 timed runs after
  * one untimed warmup).
  */
object FitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ml.IsolationForest
    import graft.operators.Readings

    def median3(f: () => Unit): Double = {
      f() // untimed warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val ids = Seq("signal_id", "seg")
    val fcs = Seq("f0", "f1", "f2", "f3")
    // features pinned once: the fit/score split should not re-bill the
    // shared PAA derivation to either phase
    val feats = IsolationForest.paaFeatures(Readings.of(spark, sfDir))
      .localCheckpoint()
    val rows = feats.count()
    val featSec = median3(() => {
      IsolationForest.paaFeatures(Readings.of(spark, sfDir)).count(); ()
    })
    val fitSec = median3(() => { IsolationForest.fit(feats, ids, fcs); () })
    val model = IsolationForest.fit(feats, ids, fcs)
    val scoreSec = median3(() => {
      IsolationForest.scoreWithModel(feats, ids, fcs, model).count(); ()
    })
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"sf":"$sfDir","rows":$rows,"feat_sec":${f3(featSec)},""" +
      s""""fit_sec":${f3(fitSec)},"score_sec":${f3(scoreSec)}}""")
    spark.stop()
  }
}
