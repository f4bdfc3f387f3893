package graft

import org.apache.spark.sql.functions._
import graft.core.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans without a shuffle exchange") {
    val left = (1L to 2000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 2000L).map(i => (i, i * 2)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", nBuckets = 4)
    Bucketing.writeBucketed(right, "bkt_right", "k", nBuckets = 4)

    // force the sort-merge path: tiny test tables would otherwise
    // broadcast, which disables bucket pruning entirely
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(Bucketing.isShuffleFree(joined),
        s"expected no shuffle Exchange:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 2000)

      // contrast: the same join over unbucketed frames does shuffle
      val plain = left.join(right, "k")
      assert(!Bucketing.isShuffleFree(plain))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("groupBy on the bucket key also avoids the shuffle") {
    val agg = spark.table("bkt_left").groupBy("k").agg(count(lit(1)))
    assert(Bucketing.isShuffleFree(agg),
      s"expected no Exchange:\n${agg.queryExecution.executedPlan}")
  }
}
