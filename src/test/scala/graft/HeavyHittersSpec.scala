package graft

import org.apache.spark.sql.functions._

import graft.ops.HeavyHitters

/** Exact heavy hitters via MG-candidates + verify: the output must
  * equal the brute-force `groupBy.count.filter` answer on EVERY input
  * and partitioning — the sketch only generates candidates; any
  * over-admission dies on the exact threshold filter, and the MG
  * bound makes under-admission impossible.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def brute(terms: Seq[String], denom: Long): Map[String, Long] = {
    val n = terms.size.toLong
    val t = if (n == 0) 1L else (n + denom - 1) / denom
    terms.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= t).toMap
  }

  private def run(
      terms: Seq[String], denom: Long, parts: Int,
      inSetMax: Int = 8192): Map[String, Long] =
    HeavyHitters.heavyHitters(
      spark.createDataset(terms).repartition(parts).toDF("term"),
      "term", denom, inSetMax)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("matches brute force on a skewed corpus, all partitionings, " +
      "with heavy sketch eviction (k far below vocab)") {
    // zipf-ish: term i appears ~ 2000/i times; vocab 200 >> k = 6
    val rnd = new scala.util.Random(7)
    val terms = rnd.shuffle(
      (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"t$i")).toVector)
    // N ≈ 11.8k, T = ceil(N/20) ≈ 590: t1(2000), t2(1000), t3(666) hit
    val expected = brute(terms, denom = 20) // k = 21 counters, vocab 200
    assert(expected.nonEmpty)
    for (parts <- Seq(1, 3, 8))
      assert(run(terms, 20, parts) === expected, s"parts=$parts")
  }

  test("a plan with non-deterministic expressions is auto-pinned: the " +
      "sketch and verify passes see the same rows") {
    // rand(42) < 2.0 is always true, so the VALUES are known, but the
    // expression flags the plan non-deterministic — exercising the
    // localCheckpoint branch; the answer must still equal brute force
    val terms = (1 to 50).flatMap(i => Seq.fill(i)(s"t${i % 5}"))
    val df = spark.createDataset(terms).toDF("term")
      .where(rand(42) < 2.0)
    val got = HeavyHitters.heavyHitters(df, "term", denom = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === brute(terms, 10L))
  }

  test("an over-budget auto-pin is released and refused by name " +
      "(graft.heavyHitters.pinBytes)") {
    val terms = (1 to 5000).map(i => s"term-with-some-payload-$i")
    val df = spark.createDataset(terms).toDF("term")
      .where(rand(42) < 2.0) // flags the plan non-deterministic
    spark.conf.set(HeavyHitters.PinBytesKey, "1")
    // other tests' (legitimately still-held) pins are not ours to check
    val preexisting = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    try {
      val e = intercept[IllegalArgumentException] {
        HeavyHitters.heavyHitters(df, "term", denom = 10L).collect()
      }
      assert(e.getMessage.contains(HeavyHitters.PinBytesKey))
      // and the refused pin's blocks are actually released (unpersist
      // is async — poll briefly rather than flake)
      val gone = (1 to 40).exists { _ =>
        val now = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
        if ((now -- preexisting).isEmpty) true
        else { Thread.sleep(50); false }
      }
      assert(gone, "refused pin's blocks were not released")
    } finally spark.conf.unset(HeavyHitters.PinBytesKey)
    // with the budget back at default the same input succeeds
    val got = HeavyHitters.heavyHitters(df, "term", denom = 10L)
    assert(got.count() >= 0L)
  }

  test("incremental term counts across snapshots == full recount, and " +
      "hitters from the maintained artifact == brute force on v2") {
    def termsOf(df: org.apache.spark.sql.DataFrame) = df.select(
      explode(split(col("text"), " ")).as("term"))
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 3) {
      val v1 = (0L until 60L).map(i =>
        (i, (0 until 3 + rnd.nextInt(6)).map(_ => s"w${rnd.nextInt(8)}")
          .mkString(" "))).toMap
      val removed = v1.keys.filter(_ => rnd.nextInt(5) == 0).toSet
      val edited = (v1.keySet -- removed).filter(_ => rnd.nextInt(4) == 0)
      val v2 = (v1 -- removed).map { case (id, t) =>
        id -> (if (edited(id)) s"w${rnd.nextInt(8)} edited$trial" else t)
      } ++ (100L until 100L + rnd.nextInt(10)).map(i => i -> s"w0 w1 fresh")
      val v1df = v1.toSeq.toDF("doc_id", "text")
      val v2df = v2.toSeq.toDF("doc_id", "text")
      val prior = termsOf(v1df).groupBy("term").agg(count(lit(1)).as("cnt"))
      val got = graft.ops.HeavyHitters.incrementalTermCounts(
        prior, v1df, v2df, "doc_id", Seq("text"), termsOf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = v2.values.flatMap(_.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      assert(got === want, s"trial=$trial")
      // hitters from the artifact == brute force over the v2 stream
      val hitters = graft.ops.HeavyHitters.heavyHittersFromCounts(
        graft.ops.HeavyHitters.incrementalTermCounts(
          prior, v1df, v2df, "doc_id", Seq("text"), termsOf), 10L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hitters === brute(v2.values.flatMap(_.split(" ")).toSeq, 10L),
        s"trial=$trial hitters")
    }
  }

  test("a prior table that is not oldDocs' exact counts fails loudly " +
      "(negative residual), not silently under-counts") {
    def termsOf(df: org.apache.spark.sql.DataFrame) = df.select(
      explode(split(col("text"), " ")).as("term"))
    val v1 = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b c")).toDF("doc_id", "text") // doc 1 removed
    val wrongPrior = Seq(("a", 1L), ("b", 2L), ("c", 1L)).toDF("term", "cnt")
    val e = intercept[Throwable] {
      graft.ops.HeavyHitters.incrementalTermCounts(
        wrongPrior, v1, v2, "doc_id", Seq("text"), termsOf).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("negative residual")),
      msgs(e).mkString(" | "))
  }

  test("randomized: equals brute force across seeds, denoms, layouts") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = 1 + rnd.nextInt(60)
      val terms = Vector.fill(500 + rnd.nextInt(2000))(
        s"w${(math.pow(rnd.nextDouble(), 2) * vocab).toInt}")
      for (denom <- Seq(3L, 10L, 50L)) {
        val expected = brute(terms, denom)
        val got = run(terms, denom, 1 + rnd.nextInt(6))
        assert(got === expected, s"seed=$seed denom=$denom")
      }
    }
  }

  test("semi-join verify branch (inSetMax = 0) gives the same answer " +
      "as the InSet branch") {
    val terms = Vector.tabulate(3000)(i => s"x${i % 40}")
    val a = run(terms, 30, 4)
    val b = run(terms, 30, 4, inSetMax = 0)
    assert(a === b)
    assert(a === brute(terms, 30))
  }

  test("nulls are ignored; empty corpus yields no hitters") {
    val withNulls = Seq("a", null, "a", null, "b").toDF("term")
    val got = HeavyHitters.heavyHitters(withNulls, "term", 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N = 3 non-null, T = ceil(3/2) = 2: only "a"
    assert(got === Map("a" -> 2L))
    assert(HeavyHitters.heavyHitters(
      Seq.empty[String].toDF("term"), "term", 10L).count() === 0)
  }

  test("merge trim keeps the completeness bound: no true hitter lost " +
      "when many partitions merge at the counter ceiling") {
    // 16 partitions, each dominated by its own local noise, one global
    // hitter spread thin across all partitions (the case a naive
    // "local top-k" would drop): "hot" is 8% of every partition.
    val perPart = (0 until 16).flatMap { p =>
      Seq.fill(25)("hot") ++ (1 to 275).map(i => s"noise${p}_$i")
    }
    val expected = brute(perPart, denom = 12) // T = ceil(4800/12) = 400
    val got = run(perPart, 12, 16)
    assert(got === expected)
    assert(got.contains("hot") === expected.contains("hot"))
    // and at a threshold "hot" does meet (400 occurrences >= T=400):
    val expected2 = brute(perPart, denom = 12)
    assert(expected2.keySet.forall(got.keySet))
  }
}
