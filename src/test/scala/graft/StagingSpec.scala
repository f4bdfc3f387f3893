package graft

import org.apache.spark.sql.functions._
import graft.core.Staging

class StagingSpec extends SparkSpec {
  import spark.implicits._

  test("scratchParquet round-trips rows and schema, returns a fresh scan") {
    val df = (1L to 100L).toDF("id")
      .withColumn("g", pmod(col("id"), lit(7)))
      .groupBy("g").agg(sum("id").as("s"), count(lit(1)).as("n"))
    val staged = Staging.scratchParquet(df)
    // parquet read-back widens nullability (documented on the seam);
    // names and types must survive exactly
    assert(staged.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(staged.orderBy("g").collect().toSeq ==
      df.orderBy("g").collect().toSeq)
    // the point of the seam: the staged frame owns NO lineage into the
    // producer — it must be a bare file scan, so the producer's
    // shuffles can reap while the staged frame is still consumed
    val plan = staged.queryExecution.optimizedPlan.toString
    assert(plan.contains("Relation") && !plan.contains("Aggregate"), plan)
  }

  test("second stage lands in a distinct directory (no overwrite races)") {
    val a = Staging.scratchParquet(Seq(1, 2).toDF("x"))
    val b = Staging.scratchParquet(Seq(3).toDF("x"))
    assert(a.collect().map(_.getInt(0)).toSet == Set(1, 2))
    assert(b.collect().map(_.getInt(0)).toSet == Set(3))
  }

  test("drop reclaims one stage early and leaves the others readable") {
    val a = Staging.scratchParquet(Seq(10, 20).toDF("x"))
    val b = Staging.scratchParquet(Seq(30).toDF("x"))
    Staging.drop(a)
    Staging.drop(a) // idempotent
    Staging.drop(Seq(1).toDF("x")) // unknown handle: no-op
    assert(intercept[Exception](a.count()).toString.nonEmpty)
    assert(b.collect().map(_.getInt(0)).toSet == Set(30))
  }
}
