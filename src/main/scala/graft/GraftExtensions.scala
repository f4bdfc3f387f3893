package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-setup wiring for the engine's custom planner paths —
  * registered once at session build time via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, never
  * mutated at query time. Queries that rely on an injected strategy
  * (q40's broadcast interval join) degrade gracefully to Catalyst's
  * stock plan when the extension is absent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.BroadcastIntervalJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoin.AsofJoinStrategy)
  }
}
