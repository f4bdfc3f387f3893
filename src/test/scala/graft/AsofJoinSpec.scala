package graft

import org.apache.spark.sql.functions._
import graft.plans.AsofJoin

/** The custom sort-merge as-of node: backward-inclusive semantics, null
  * emission for unmatched rows, tie handling, cross-key isolation, and
  * the physical plan actually using AsofJoinExec (one exchange per
  * side, no union/window).
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      left: Seq[(Long, Long, Long)], // (key, id, t)
      right: Seq[(Long, Long)]) = { // (key, t)
    val l = left.toDF("k", "id", "t")
    val r = right.toDF("rk", "rt")
    AsofJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "id", "t", "rt")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(3)) None else Some(x.getLong(3)))).toSeq.sortBy(r => (r._1, r._2))
  }

  test("backward as-of: latest at-or-before match, nulls when none") {
    val got = run(
      left = Seq((1L, 1L, 100L), (1L, 2L, 50L), (1L, 3L, 9L), (2L, 4L, 100L)),
      right = Seq((1L, 10L), (1L, 60L), (1L, 100L), (3L, 5L)))
    assert(got === Seq(
      (1L, 1L, Some(100L)), // inclusive: rt == t matches
      (1L, 2L, Some(10L)),
      (1L, 3L, None), // earliest error after this purchase
      (2L, 4L, None))) // key has no right rows
  }

  test("keys never leak: a match from a previous key is not reused") {
    val got = run(
      left = Seq((1L, 1L, 100L), (2L, 2L, 100L)),
      right = Seq((1L, 50L)))
    assert(got === Seq((1L, 1L, Some(50L)), (2L, 2L, None)))
  }

  test("forward as-of: earliest at-or-after match, nulls when none, plan still AsofJoinExec") {
    val l = Seq((1L, 1L, 100L), (1L, 2L, 50L), (1L, 3L, 200L), (2L, 4L, 10L))
      .toDF("k", "id", "t")
    val r = Seq((1L, 60L), (1L, 100L), (1L, 150L), (3L, 5L)).toDF("rk", "rt")
    val res = AsofJoin.forward(l, r, Seq("k"), Seq("rk"), "t", "rt")
    assert(res.queryExecution.executedPlan.toString.contains("AsofJoin"))
    val got = res.select("k", "id", "rt").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSeq.sortBy(r => (r._1, r._2))
    assert(got === Seq(
      (1L, 1L, Some(100L)), // inclusive: rt == t matches
      (1L, 2L, Some(60L)),
      (1L, 3L, None), // nothing at-or-after 200
      (2L, 4L, None))) // key has no right rows
    // helper negation columns never leak into the output
    assert(!res.columns.exists(_.startsWith("__graft")))
  }

  test("backwardWithin: stale matches null out, rows are kept") {
    val l = Seq((1L, 1L, 100L), (1L, 2L, 500L), (1L, 3L, 50L)).toDF("k", "id", "t")
    val r = Seq((1L, 90L), (1L, 60L)).toDF("rk", "rt")
    val got = AsofJoin.backwardWithin(l, r, Seq("k"), Seq("rk"), "t", "rt",
      tolerance = 50L)
      .select("k", "id", "rt").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSeq.sortBy(r => (r._1, r._2))
    assert(got === Seq(
      (1L, 1L, Some(90L)), // within 50
      (1L, 2L, None),      // latest match (90) is 410 stale -> nulled, row kept
      (1L, 3L, None)))     // no at-or-before at all
  }

  test("plan contains AsofJoinExec and matches the union+window query on real data") {
    val d = "/root/testdata/sf0.001"
    val custom = graft.queries.Queries.all("q49_asof_custom_plan")(spark, d)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom node missing from plan:\n$plan")
    val viaWindow = graft.queries.Queries.all("q39_asof_join")(spark, d)
      .select("user_id", "event_id", "purchase_us", "last_err_us")
    val a = custom.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("merge loop runs inside whole-stage codegen, no fallback") {
    // AQE hides the stage tree behind leaf QueryStage nodes; turn it
    // off here so the WholeStageCodegen node is directly collectible
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val l = Seq((1L, 1L, 100L), (1L, 2L, 50L), (2L, 3L, 10L)).toDF("k", "id", "t")
      val r = Seq((1L, 60L), (1L, 100L), (2L, 5L)).toDF("rk", "rt")
      val res = AsofJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      val fused = res.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
            if w.collect { case a: AsofJoin.AsofJoinExec => a }.nonEmpty => w
      }
      assert(fused.nonEmpty, s"AsofJoinExec not inside a WholeStageCodegen " +
        s"stage:\n${res.queryExecution.executedPlan}")
      // the generated stage must COMPILE — a janino failure would
      // silently fall back to the interpreted path at runtime
      val (_, source) = fused.head.doCodeGen()
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compile(source)
      // and the fused result is still correct
      val got = res.select("k", "id", "rt").collect()
        .map(x => (x.getLong(0), x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSeq
        .sortBy(r => (r._1, r._2))
      assert(got === Seq(
        (1L, 1L, Some(100L)), (1L, 2L, None), (2L, 3L, Some(5L))))
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("codegen is clean under spark.testing: no limitNotReachedCond [BUG]") {
    // `limitNotReachedCond` in a produce loop is only legal for nodes
    // that override `canCheckLimitNotReached` (SortMergeJoinExec
    // precedent). Without the override Spark logs a "[BUG]" WARN in
    // production and THROWS under the spark.testing system property —
    // so codegen-compiling the plan with the property set keeps this
    // whole class of bug caught.
    // save the prior value: the surrounding harness may legitimately
    // run with spark.testing set, and a blind clearProperty in finally
    // would change behavior for every later test in this JVM
    val priorTesting = Option(System.getProperty("spark.testing"))
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    System.setProperty("spark.testing", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val l = Seq((1L, 1L, 100L), (1L, 2L, 50L)).toDF("k", "id", "t")
      val r = Seq((1L, 60L), (1L, 100L)).toDF("rk", "rt")
      val res = AsofJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      val fused = res.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
            if w.collect { case a: AsofJoin.AsofJoinExec => a }.nonEmpty => w
      }
      assert(fused.nonEmpty)
      // doCodeGen invokes doProduce, which calls limitNotReachedCond —
      // the throw site when the override is missing
      val (_, source) = fused.head.doCodeGen()
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compile(source)
      assert(res.count() === 2)
    } finally {
      priorTesting match {
        case Some(v) => System.setProperty("spark.testing", v)
        case None    => System.clearProperty("spark.testing")
      }
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
    }
  }

  test("survives many partitions and empty right partitions") {
    val l = (0L until 200L).map(i => (i % 7, i, i * 10L))
    val r = (0L until 40L).map(i => (i % 3, i * 37L)) // keys 0..2 only
    val got = run(l, r)
    assert(got.size === 200)
    // spot-check oracle semantics locally
    for ((k, id, t) <- l) {
      val want = r.filter(x => x._1 == k && x._2 <= t).map(_._2).maxOption
      assert(got.find(_._2 == id).get._3 === want, s"row $id")
    }
  }
}
