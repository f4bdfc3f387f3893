package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: physical-plan audit of a catalog query — the per-operator
  * checklist the scale reviews run (is the dim join broadcast, did a
  * cartesian/BNLJ sneak in, how wide are the codegen spans, how many
  * exchanges). Prints operator counts plus the formatted plan.
  *
  * Usage:
  *   runMain graft.tools.PlanAudit <queryName> [sfDir] [--full]
  *   runMain graft.tools.PlanAudit --all [sfDir]
  *
  * `--all` sweeps the whole catalog and FAILS (exit 1) if any query's
  * adaptive final plan contains a BroadcastNestedLoopJoin or
  * CartesianProduct — the quadratic-join regression net.
  */
object PlanAudit {

  /** Adaptive FINAL plan string of an executed query. Executes THIS
    * queryExecution (a separate `df.count()` would plan its own and
    * leave this AdaptiveSparkPlanExec non-final): under AQE the
    * pre-execution plan carries no codegen markers or runtime join
    * rewrites — the audit must see the plan that actually ran.
    */
  private def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.count()
    (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args(0) == "--all") {
      // streaming gates run real micro-batch pipelines through temp
      // sinks — slow and not a single auditable plan; skip them here
      val streaming = Set("q59_sessionize_stream", "q60_asof_stream",
        "q61_components_stream", "q66_decorate_stream",
        "q73_decontaminate_stream", "q98_window_stream",
        "q104_heavy_hitters_stream", "q112_bm25_stream")
      // q21 is the BRUTE-FORCE exact-cosine BASELINE: a bounded query
      // set broadcast against the streamed corpus IS the intended
      // cross product (its scaladoc says so; q28/q42/q55 are the
      // scale paths). q96 is the same brute-force scoring with a
      // group-exclusion predicate (cosineTopKExcluding inherits
      // cosineTopK's byte-budgeted broadcast + refusal reroute).
      // Everything else must stay keyed.
      val intendedCross = Set("q21_knn_cosine", "q96_hard_negatives")
      var bad = List.empty[String]
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (streaming(name))
          println(f"$name%-34s skipped (streaming micro-batch pipeline " +
            "- no single auditable plan; its batch twin is audited)")
        else {
          val plan = finalPlanOf(fn(spark, sfDir))
          val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
          val cart = "CartesianProduct".r.findAllIn(plan).length
          val verdict =
            if (bnlj + cart == 0) "ok"
            else if (intendedCross(name)) "cross-by-design"
            else { bad ::= name; "QUADRATIC-JOIN" }
          println(f"$name%-34s bnlj=$bnlj cartesian=$cart $verdict")
        }
      }
      if (bad.nonEmpty) {
        System.err.println(s"quadratic joins in: ${bad.mkString(", ")}")
        spark.stop(); sys.exit(1)
      }
      spark.stop(); return
    }

    val name = args(0)
    val full = args.contains("--full")
    val plan = finalPlanOf(graft.SparkEntry.queries(name)(spark, sfDir))
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
