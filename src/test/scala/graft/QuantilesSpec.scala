package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantiles

/** Exact sort-free quantiles: must equal the textbook type-1 quantile
  * (smallest value with ≥ ceil(num·N/den) rows ≤ it) on every input
  * and partitioning.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def brute(values: Seq[Long], num: Long, den: Long): Long = {
    val sorted = values.sorted
    val target = ((num * values.size + den - 1) / den).toInt
    sorted(target - 1) // 1-based rank
  }

  private def run(
      values: Seq[Long], qs: Seq[(Long, Long)],
      parts: Int): Map[(Long, Long), Long] =
    Quantiles.exactQuantiles(
      spark.createDataset(values).repartition(parts).toDF("v"), "v", qs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("hand case: median and extremes on a tied distribution") {
    // values: 1×4, 2×3, 5×2, 9×1 → N=10
    val vs = Seq.fill(4)(1L) ++ Seq.fill(3)(2L) ++ Seq.fill(2)(5L) :+ 9L
    val got = run(vs, Seq(1L -> 10L, 50L -> 100L, 100L -> 100L), 3)
    // p10: target ceil(1) = 1 → 1; p50: target 5 → 2; p100: target 10 → 9
    assert(got === Map((1L, 10L) -> 1L, (50L, 100L) -> 2L, (100L, 100L) -> 9L))
  }

  test("randomized: equals the sorted-rank definition across seeds, " +
      "fractions, and partitionings") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 100 + rnd.nextInt(3000)
      // heavy ties: values from a small domain, skewed
      val vs = Vector.fill(n)((math.pow(rnd.nextDouble(), 3) * 40).toLong)
      val qs = Seq(1L -> 100L, 10L -> 100L, 25L -> 100L, 50L -> 100L,
        75L -> 100L, 99L -> 100L, 1L -> 1L)
      val got = run(vs, qs, 1 + rnd.nextInt(7))
      qs.foreach { case (num, den) =>
        assert(got((num, den)) === brute(vs, num, den),
          s"seed=$seed q=$num/$den")
      }
    }
  }

  test("single row, single value; and empty input yields no rows") {
    assert(run(Seq(42L), Seq(50L -> 100L), 2) === Map((50L, 100L) -> 42L))
    assert(Quantiles.exactQuantiles(
      Seq.empty[Long].toDF("v"), "v", Seq(50L -> 100L)).count() === 0)
  }

  test("percentileRanks equals the SQL percent_rank definition on tied, " +
      "skewed data across partitionings") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(1000)
      val vs = Vector.fill(n)((math.pow(rnd.nextDouble(), 2) * 25).toLong)
      val denom = math.max(n - 1L, 1L)
      val expected =
        vs.map(v => v -> vs.count(_ < v).toLong * 1000000L / denom).toMap
      val got = graft.ops.Quantiles.percentileRanks(
        spark.createDataset(vs).repartition(1 + rnd.nextInt(5)).toDF("v"),
        "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      expected.foreach { case (v, ppm) =>
        assert(got(v) === ppm, s"seed=$seed v=$v")
      }
    }
  }

  test("percentileRanks: single row ranks 0; null value ranks null; " +
      "extra columns pass through") {
    val one = graft.ops.Quantiles.percentileRanks(
      Seq((7L, 42L)).toDF("id", "v"), "v").collect()
    assert(one.length === 1 && one(0).getLong(2) === 0L)
    val withNull = graft.ops.Quantiles.percentileRanks(
      Seq((1L, java.lang.Long.valueOf(5L)),
        (2L, null.asInstanceOf[java.lang.Long]),
        (3L, java.lang.Long.valueOf(9L))).toDF("id", "v"), "v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(withNull(2L) === None)
    // null is outside the distribution: N = 2 non-null, denom = 1
    assert(withNull(1L) === Some(0L))
    assert(withNull(3L) === Some(1000000L))
  }

  test("percentileRanks refuses a domain over the rank-table byte " +
      "budget by name, and honors the conf-key escape hatch") {
    val df = spark.range(100).toDF("v")
    spark.conf.set(graft.ops.Quantiles.RankTableBytesKey,
      (10L * graft.ops.Quantiles.RankRowBytes).toString)
    try {
      val e = intercept[IllegalArgumentException] {
        Quantiles.percentileRanks(df, "v")
      }
      assert(e.getMessage.contains(graft.ops.Quantiles.RankTableBytesKey))
      assert(e.getMessage.contains("exactQuantiles"))
      // raising the budget back over the domain admits the same frame
      spark.conf.set(graft.ops.Quantiles.RankTableBytesKey,
        (1000L * graft.ops.Quantiles.RankRowBytes).toString)
      assert(Quantiles.percentileRanks(df, "v").count() === 100L)
    } finally spark.conf.unset(graft.ops.Quantiles.RankTableBytesKey)
  }

  test("invalid fractions are refused") {
    val df = Seq(1L).toDF("v")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "v", Seq(0L -> 100L))
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "v", Seq(101L -> 100L))
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "v", Seq.empty)
    }
  }
}
