package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)

  test("binned pointInInterval matches nested-loop oracle on random data") {
    val points = Seq.tabulate(300)(i => (i.toLong, rng.nextLong(10000)))
    val intervals = Seq.tabulate(80) { i =>
      val lo = rng.nextLong(10000)
      (i.toLong, lo, lo + rng.nextLong(800))
    }
    val pDf = points.toDF("pid", "x")
    val iDf = intervals.toDF("iid", "lo", "hi")
    for (binWidth <- Seq(1L, 100L, 1000L, 100000L)) {
      val got = RangeJoin
        .pointInInterval(pDf, "x", iDf, "lo", "hi", binWidth)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = (for {
        (pid, x) <- points
        (iid, lo, hi) <- intervals
        if x >= lo && x <= hi
      } yield (pid, iid)).toSet
      assert(got == want, s"binWidth=$binWidth")
    }
  }

  test("containment bounds are inclusive on both ends") {
    val p = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("pid", "x")
    val i = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "x", i, "lo", "hi", 7L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("keyed variant joins only within equal keys") {
    val p = Seq(("u1", 15L, 1L), ("u2", 15L, 2L)).toDF("user", "x", "pid")
    val i = Seq(("u1", 10L, 20L)).toDF("user", "lo", "hi")
    val got = RangeJoin
      .pointInIntervalKeyed(p, "x", i, "lo", "hi", Seq("user"))
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("negative coordinates bin correctly") {
    val p = Seq((1L, -150L), (2L, -50L), (3L, 50L)).toDF("pid", "x")
    val i = Seq((1L, -200L, -100L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "x", i, "lo", "hi", 100L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
