package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: physical-plan audit of a catalog query — the per-operator
  * checklist the scale reviews run (is the dim join broadcast, did a
  * cartesian/BNLJ sneak in, how wide are the codegen spans, how many
  * exchanges). Prints operator counts plus the formatted plan.
  *
  * Usage: runMain graft.tools.PlanAudit <queryName> [sfDir] [--full]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.001")
    val full = args.contains("--full")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // execute THIS queryExecution (df.count() would plan a separate
    // one and leave this AdaptiveSparkPlanExec non-final): under AQE
    // the pre-execution plan carries no codegen markers or runtime
    // join rewrites; audit the ADAPTIVE FINAL plan that actually ran
    df.queryExecution.toRdd.count()
    val plan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    def count(p: String): Int = p.r.findAllIn(plan).length
    println(s"== $name physical-plan audit ($sfDir) ==")
    Seq(
      "BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct",
      "Exchange hashpartitioning", "Exchange rangepartitioning",
      "InMemoryTableScan", "Scan parquet",
      "PushedFilters: \\[[^\\]]").foreach { p =>
      println(f"${p.take(30)}%-30s ${count(p)}%d")
    }
    // codegen shows as "*(n)" operator prefixes; distinct n = spans
    val spans = """\*\((\d+)\)""".r.findAllMatchIn(plan).map(_.group(1)).toSet
    println(f"${"WholeStageCodegen spans"}%-30s ${spans.size}%d")
    if (full) println(plan)
    spark.stop()
  }
}
