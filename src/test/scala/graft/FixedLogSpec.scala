package graft

import org.apache.spark.sql.functions._

import graft.functions.FixedLog

/** The fixed-point integer log: a pure integer function (so any
  * engine replays it exactly) that tracks true ln closely enough for
  * relevance ranking.
  */
class FixedLogSpec extends SparkSpec {
  import spark.implicits._

  test("iln1m tracks 1e6*ln within 40 ppm-of-value across magnitudes") {
    val ms = Seq(1L, 2L, 3L, 5L, 7L, 11L, 101L, 999L, 12345L,
      (1L << 30) - 1, 1L << 30, 1L << 31, 1000000000000L, 3333333333L) ++
      (1 to 200).map(i => i * 997L)
    ms.foreach { m =>
      val got = FixedLog.iln1mImpl(m)
      val want = 1e6 * math.log(m.toDouble)
      assert(math.abs(got - want) < 40.0, s"m=$m got=$got want=$want")
    }
  }

  test("exact at powers of two: iln1m(2^k) = k * 693147") {
    (0 to 62).foreach { k =>
      assert(FixedLog.iln1mImpl(1L << k) === k * 693147L, s"k=$k")
    }
  }

  test("monotone non-decreasing") {
    var prev = Long.MinValue
    (1L to 5000L).foreach { m =>
      val v = FixedLog.iln1mImpl(m)
      assert(v >= prev, s"m=$m")
      prev = v
    }
  }

  test("column form: codegen path equals the impl; m < 1 is null") {
    val rows = Seq(1L, 7L, 12345L, -3L, 0L).toDF("m")
      .select(col("m"), FixedLog.iln1m(col("m")).as("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L) === Some(0L))
    assert(rows(7L) === Some(FixedLog.iln1mImpl(7L)))
    assert(rows(12345L) === Some(FixedLog.iln1mImpl(12345L)))
    assert(rows(-3L) === None)
    assert(rows(0L) === None)
  }
}
