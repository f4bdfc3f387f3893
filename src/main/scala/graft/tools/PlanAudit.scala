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
      // exemption sets are CATALOG-OWNED (graft.queries.Queries) so
      // this sweep and the 100x evidence sweep derive from one source;
      // a stale exemption (naming a query the catalog no longer has)
      // fails the audit rather than silently shrinking it
      val streaming = graft.queries.Queries.streamingQueries
      val intendedCross = graft.queries.Queries.intendedCrossQueries
      val catalog = graft.SparkEntry.queries.keySet
      val staleExempt = (streaming ++ intendedCross) -- catalog
      if (staleExempt.nonEmpty) {
        System.err.println(
          s"stale exemptions (not in the catalog): ${staleExempt.mkString(", ")}")
        spark.stop(); sys.exit(1)
      }
      var bad = List.empty[String]
      var audited = Set.empty[String]
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (streaming(name)) {
          audited += name
          println(f"$name%-34s skipped (streaming micro-batch pipeline " +
            "- no single auditable plan; its batch twin is audited)")
        } else {
          val plan = finalPlanOf(fn(spark, sfDir))
          val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
          val cart = "CartesianProduct".r.findAllIn(plan).length
          val verdict =
            if (bnlj + cart == 0) "ok"
            else if (intendedCross(name)) "cross-by-design"
            else { bad ::= name; "QUADRATIC-JOIN" }
          audited += name
          println(f"$name%-34s bnlj=$bnlj cartesian=$cart $verdict")
        }
      }
      // COMPLETENESS GATE: every declared query must have produced a
      // line above — the audit refuses to pass with a catalog entry
      // missing (the r15 evidence hole: q117 was declared and green
      // but absent from the committed audit file)
      val missing = catalog -- audited
      println(s"== completeness: catalog=${catalog.size} " +
        s"audited=${(audited -- streaming).size} " +
        s"skipped-streaming=${(audited & streaming).size} " +
        s"missing=${missing.size} ==")
      if (missing.nonEmpty) {
        System.err.println(s"catalog queries not audited: ${missing.mkString(", ")}")
        spark.stop(); sys.exit(1)
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
