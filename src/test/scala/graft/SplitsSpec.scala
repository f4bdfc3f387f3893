package graft

import org.apache.spark.sql.functions._

import graft.ops.Splits

/** Stable hash splitting: reproducible assignment, correct label
  * boundaries, roughly-right fractions.
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private def labeled(n: Int) =
    spark.range(n.toLong).select(col("id"),
      Splits.splitLabel(col("id"), Seq("train" -> 90, "val" -> 95), "test")
        .as("split"))

  test("assignment is a pure function of the id (stable across runs)") {
    val a = labeled(2000).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = labeled(2000).orderBy(desc("id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("fractions land near 90/5/5 and every label appears") {
    val counts = labeled(20000).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val n = counts.values.sum.toDouble
    assert(math.abs(counts("train") / n - 0.90) < 0.02, counts)
    assert(math.abs(counts("val") / n - 0.05) < 0.02, counts)
    assert(math.abs(counts("test") / n - 0.05) < 0.02, counts)
  }

  test("sampleKeep: rate boundaries, determinism, and basis-point exactness") {
    val rows = spark.range(10000).select(col("id"),
      Splits.sampleKeep(col("id"), lit(10000)).as("all"),
      Splits.sampleKeep(col("id"), lit(0)).as("none"),
      Splits.sampleKeep(col("id"), lit(2500)).as("q"))
      .collect()
    assert(rows.forall(_.getBoolean(1)))
    assert(rows.forall(!_.getBoolean(2)))
    val kept = rows.count(_.getBoolean(3)) / 10000.0
    assert(math.abs(kept - 0.25) < 0.02, s"kept fraction $kept")
    // pure function of the id — rerun matches row for row
    val again = spark.range(10000)
      .select(col("id"), Splits.sampleKeep(col("id"), lit(2500)).as("q"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getBoolean(3)))
  }

  test("sampleKeep is independent of splitLabel (the salt is the point)") {
    // with the UNSALTED split bucket, keeping <=90% would keep ONLY
    // train rows and empty val/test; the salted decision must thin
    // every split at about the same rate
    val df = labeled(20000)
      .withColumn("keep", Splits.sampleKeep(col("id"), lit(5000)))
    val bySplit = df.groupBy("split")
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Seq("train", "val", "test").foreach { s =>
      val (n, kept) = bySplit(s)
      val frac = kept.toDouble / n
      assert(math.abs(frac - 0.5) < 0.05,
        s"split $s kept $kept of $n ($frac) — sampling correlated with split")
    }
  }

  test("degenerate cuts are rejected at construction") {
    val id = col("id")
    intercept[IllegalArgumentException] {
      Splits.splitLabel(id, Seq("train" -> 90, "val" -> 90), "test") // empty val
    }
    intercept[IllegalArgumentException] {
      Splits.splitLabel(id, Seq("train" -> 100), "test") // unreachable rest
    }
    intercept[IllegalArgumentException] {
      Splits.splitLabel(id, Seq("train" -> 0, "val" -> 50), "test") // empty train
    }
    intercept[IllegalArgumentException] {
      Splits.splitLabel(id, Seq.empty, "all") // no cuts at all
    }
  }

  test("label matches the bucket arithmetic exactly") {
    val rows = spark.range(500).select(col("id"),
      (conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100).as("b"),
      Splits.splitLabel(col("id"), Seq("train" -> 90, "val" -> 95), "test")
        .as("split"))
      .collect()
    rows.foreach { r =>
      val expected =
        if (r.getLong(1) < 90) "train" else if (r.getLong(1) < 95) "val" else "test"
      assert(r.getString(2) == expected, r)
    }
  }

  test("group-keyed split (the q94 shape): near-dup groups never " +
      "straddle splits, even when their members' OWN hashes would") {
    // ids chosen so per-doc buckets straddle within group A: md5
    // buckets are 1→train, 8→val (93), 20→test (96); group B =
    // {10, 11}; singletons 21 (train), 30 (test).
    val membership = Seq(
      (1L, 1L), (8L, 1L), (20L, 1L),
      (10L, 10L), (11L, 10L),
      (21L, 21L), (30L, 30L)).toDF("doc_id", "group_id")
    val out = membership.withColumn("split",
      Splits.splitLabel(col("group_id"), Seq("train" -> 90, "val" -> 95),
        "test"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // one split per group, always
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.size == 1, rows.toSeq)
    }
    // and the per-doc hash WOULD have straddled group A (sanity that
    // the test is not vacuous)
    val own = membership.withColumn("split",
      Splits.splitLabel(col("doc_id"), Seq("train" -> 90, "val" -> 95),
        "test"))
      .collect().map(r => r.getLong(1) -> r.getString(2)).toSeq
    assert(own.filter(_._1 == 1L).map(_._2).distinct.size == 3,
      "expected ids 1/8/20 to hash into three different splits on their own")
    // singleton groups degrade to exactly the q67 per-doc assignment
    val gkeyed = out.filter(r => r._1 >= 21L).map(r => r._1 -> r._3).toMap
    assert(gkeyed === Map(21L -> "train", 30L -> "test"))
  }
}
