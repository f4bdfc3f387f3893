package graft

import org.apache.spark.sql.functions._
import graft.plans.BroadcastIntervalJoinStrategy

class BroadcastIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(17)
  private lazy val points = Seq.tabulate(500)(i => (i.toLong, rng.nextLong(5000)))
  private lazy val intervals = Seq.tabulate(60) { i =>
    val lo = rng.nextLong(5000)
    (i.toLong, lo, lo + rng.nextLong(400))
  }

  private def joinDf = {
    val p = points.toDF("pid", "x")
    val iv = intervals.toDF("iid", "lo", "hi")
    p.join(broadcast(iv), col("x") >= col("lo") && col("x") <= col("hi"))
  }

  private def withStrategy[T](f: => T): T = {
    spark.experimental.extraStrategies =
      Seq(BroadcastIntervalJoinStrategy)
    try f finally spark.experimental.extraStrategies = Nil
  }

  test("strategy plans BroadcastIntervalJoinExec for hinted range joins") {
    withStrategy {
      val plan = joinDf.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastIntervalJoin"), s"plan:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("size-based engagement: UNHINTED small interval side plans through the custom node") {
    withStrategy {
      val p = points.toDF("pid", "x")
      val iv = intervals.toDF("iid", "lo", "hi")
      val unhinted = p.join(iv, col("x") >= col("lo") && col("x") <= col("hi"))
      val plan = unhinted.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastIntervalJoin"), s"plan:\n$plan")
      // same rows as the hinted path
      assert(unhinted.select("pid", "iid").as[(Long, Long)].collect().toSet ==
        joinDf.select("pid", "iid").as[(Long, Long)].collect().toSet)
    }
  }

  test("size-based engagement falls back when the threshold rules it out; hint still engages") {
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      withStrategy {
        val p = points.toDF("pid", "x")
        val iv = intervals.toDF("iid", "lo", "hi")
        val unhinted = p.join(iv, col("x") >= col("lo") && col("x") <= col("hi"))
        assert(!unhinted.queryExecution.executedPlan.toString
          .contains("BroadcastIntervalJoin"))
        // explicit hint overrides the disabled auto threshold
        assert(joinDf.queryExecution.executedPlan.toString
          .contains("BroadcastIntervalJoin"))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("custom exec results equal the stock nested-loop plan") {
    val want = joinDf.select("pid", "iid").as[(Long, Long)].collect().toSet
    val got = withStrategy {
      joinDf.select("pid", "iid").as[(Long, Long)].collect().toSet
    }
    assert(got == want)
    // sanity vs a local oracle
    val oracle = (for {
      (pid, x) <- points
      (iid, lo, hi) <- intervals
      if x >= lo && x <= hi
    } yield (pid, iid)).toSet
    assert(got == oracle)
  }

  test("reversed operand order and flipped conjuncts still match") {
    withStrategy {
      val p = points.toDF("pid", "x")
      val iv = intervals.toDF("iid", "lo", "hi")
      val flipped = p.join(broadcast(iv),
        col("hi") >= col("x") && col("lo") <= col("x"))
      val plan = flipped.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastIntervalJoin"), s"plan:\n$plan")
      assert(flipped.count() ==
        points.flatMap { case (_, x) =>
          intervals.filter { case (_, lo, hi) => x >= lo && x <= hi } }.size)
    }
  }

  test("null points and empty interval side behave") {
    withStrategy {
      val p = Seq((1L, Some(10L)), (2L, None)).toDF("pid", "x")
      val iv = Seq((1L, 5L, 15L)).toDF("iid", "lo", "hi")
      val got = p.join(broadcast(iv), col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid").as[Long].collect().toSeq
      assert(got == Seq(1L))
      val empty = iv.where(col("iid") < 0)
      assert(p.join(broadcast(empty),
        col("x") >= col("lo") && col("x") <= col("hi")).count() == 0)
    }
  }

  test("non-range conditions fall back to stock planning") {
    withStrategy {
      val p = points.toDF("pid", "x")
      val iv = intervals.toDF("iid", "lo", "hi")
      // strict inequality is not the containment pattern -> no custom node
      val strict = p.join(broadcast(iv), col("x") > col("lo") && col("x") < col("hi"))
      assert(!strict.queryExecution.executedPlan.toString.contains("BroadcastIntervalJoin"))
      strict.count() // still executes fine
    }
  }
}
