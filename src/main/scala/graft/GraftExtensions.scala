package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.functions.VectorFunctions

/** SparkSessionExtensions entry point: enable with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  * Injects the native vector expressions (and the zone-map rewrite rule,
  * see graft.plans.ZoneMapRewrite) into every session of the cluster —
  * the deployment shape for the 1000-executor case; tests and the
  * driver-contract mains use the programmatic registration instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    (VectorFunctions.functions ++ graft.functions.CodecFunctions.functions)
      .foreach { case (name, info, builder) =>
        ext.injectFunction((FunctionIdentifier(name), info, builder))
      }
    ext.injectOptimizerRule(session => graft.plans.ZoneMapRewrite(session))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
