package graft

import org.apache.spark.sql.functions._

import graft.ops.InvertedIndex

/** Sharded positional postings: hand-checkable digests, shard-bound
  * row sizes, df-cap elision.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("hand case: positions, shard split, and the canonical digest") {
    val docs = Seq(
      (1L, "a b a"),      // a@0,2  b@1
      (2L, "b a"),        // b@0    a@1
      (150L, "a")         // a@0, lands in shard 1 at span 100
    ).toDF("doc_id", "text")
    val out = InvertedIndex.postingShards(docs, "text", "doc_id", 100L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(out.keySet === Set(("a", 0L), ("a", 1L), ("b", 0L)))
    // term a, shard 0: docs 1 (pos 0,2) and 2 (pos 1)
    assert(out(("a", 0L))._1 === 2L)
    assert(out(("a", 0L))._2 === 3L)
    assert(out(("a", 0L))._3 ===
      md5Hex("000000000001:0,2;000000000002:1"))
    // term a, shard 1: doc 150 only
    assert(out(("a", 1L)) === ((1L, 1L, md5Hex("000000000150:0"))))
    // term b, shard 0: docs 1 (pos 1) and 2 (pos 0)
    assert(out(("b", 0L))._3 ===
      md5Hex("000000000001:1;000000000002:0"))
  }

  test("no (term, shard) row ever covers more than shardSpan docs, " +
      "even for a term in EVERY doc") {
    val docs = (0L until 300L).map(i => (i, "stop word" + (i % 7)))
      .toDF("doc_id", "text")
    val out = InvertedIndex.postingShards(docs, "text", "doc_id", 50L)
    val maxDf = out.where(col("term") === "stop")
      .agg(max("df_shard")).head().getLong(0)
    assert(maxDf <= 50L)
    // 300 docs at span 50 -> exactly 6 shards for the ubiquitous term
    assert(out.where(col("term") === "stop").count() === 6L)
  }

  test("maxDocFreq elides stop-terms globally, keeps the rest intact") {
    val docs = (0L until 40L).map(i => (i, s"common tok$i")).toDF("doc_id", "text")
    val all = InvertedIndex.postingShards(docs, "text", "doc_id", 10L)
    val capped = InvertedIndex.postingShards(
      docs, "text", "doc_id", 10L, maxDocFreq = Some(5L))
    assert(all.where(col("term") === "common").count() === 4L)
    assert(capped.where(col("term") === "common").count() === 0L)
    // the rare terms' rows are untouched by the cap
    assert(capped.count() === all.count() - 4L)
  }

  test("ids outside [0, 1e12) fail loudly instead of corrupting the " +
      "zero-pad serialization") {
    def run(id: Long) =
      InvertedIndex.postingShards(
        Seq((id, "a b")).toDF("doc_id", "text"), "text", "doc_id", 10L)
        .collect()
    val big = intercept[Exception] { run(1000000000000L) }
    assert(big.getMessage.contains("zero-pad"))
    val neg = intercept[Exception] { run(-1L) }
    assert(neg.getMessage.contains("zero-pad"))
    // the max in-range id still pads to exactly 12 digits
    assert(run(999999999999L).nonEmpty)
  }

  test("phraseMatches: overlapping occurrences count, repeated words " +
      "align independently, absent phrases yield no row") {
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "a a a"),
      (3L, "b b b"),
      (4L, "x a b a y")).toDF("doc_id", "text")
    def run(p: String*) = InvertedIndex
      .phraseMatches(docs, "text", "doc_id", p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "a b a" occurs at offsets 0 and 2 of doc 1 (overlap) and once in doc 4
    assert(run("a", "b", "a") === Map(1L -> 2L, 4L -> 1L))
    // repeated-word phrase: "a a" aligns at offsets 0 and 1 of doc 2
    assert(run("a", "a") === Map(2L -> 2L))
    assert(run("a", "x") === Map.empty)
    // single-token phrase degrades to tf
    assert(run("a") === Map(1L -> 3L, 2L -> 3L, 4L -> 2L))
  }

  test("proximityMatches: banded pairing equals the brute-force pair " +
      "count; bucket-boundary pairs are not lost or double-counted") {
    // positions of a: 0, 5, 9; b: 3, 4, 12 — window 4 buckets are
    // [0-3],[4-7],[8-11],[12-15]; pair (5,3) spans a boundary, (9,12)
    // spans another, (0,4) sits exactly at the window edge
    val docs = Seq(
      (1L, "a x x b b a x x x a x x b"),
      (2L, "a x x x x x x x x x x x b"), // distance 12 > 4: no pair
      (3L, "b a")).toDF("doc_id", "text")
    def brute(text: String, w: Long): Long = {
      val ts = text.split(" ")
      val pa = ts.zipWithIndex.collect { case ("a", i) => i }
      val pb = ts.zipWithIndex.collect { case ("b", i) => i }
      pa.flatMap(i => pb.filter(j => math.abs(i - j) <= w)).size.toLong
    }
    val got = InvertedIndex
      .proximityMatches(docs, "text", "doc_id", "a", "b", 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Seq(
      1L -> brute("a x x b b a x x x a x x b", 4),
      3L -> brute("b a", 4)).toMap
    assert(got === want)
    assert(!got.contains(2L))
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.proximityMatches(docs, "text", "doc_id", "a", "a", 4L)
    }
    assert(e.getMessage.contains("phraseMatches"))
  }

  test("deterministic across partitionings") {
    val docs = (0L until 120L).map(i =>
      (i, s"w${i % 5} w${i % 11} w${i % 5}")).toDF("doc_id", "text")
    def run(parts: Int) =
      InvertedIndex.postingShards(
        docs.repartition(parts), "text", "doc_id", 30L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSet
    assert(run(1) === run(7))
  }

  /** Flatten a binary artifact to comparable tuples (bytes as hex). */
  private def artifactRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("term"), col("shard"), col("df_shard"), col("tf_shard"),
      lower(hex(col("bin"))).as("hx"), col("raw_bytes"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toSet

  test("incremental artifact maintenance == full rebuild, byte for " +
      "byte, across randomized add/remove/edit churn") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val v1 = (0L until 90L).map(i =>
        (i, s"w${i % 7} w${i % 13} w${i % 7} w${i % 3}")).toMap
      // churn: remove ~1/6, edit ~1/5 (some edits add NEW terms, some
      // delete a term from a shard), add fresh ids incl. a new shard
      val removed = v1.keys.filter(_ => rnd.nextInt(6) == 0).toSet
      val edited = (v1.keySet -- removed).filter(_ => rnd.nextInt(5) == 0)
      val v2 = (v1 -- removed).map { case (id, t) =>
        id -> (if (!edited(id)) t
               else if (id % 2 == 0) s"brandnew$trial w${id % 13}"
               else t + s" w${id % 5}")
      } ++ (200L until 200L + rnd.nextInt(20)).map(i =>
        i -> s"w${i % 7} added w${i % 13}")
      val v1df = v1.toSeq.toDF("doc_id", "text")
      val v2df = v2.toSeq.toDF("doc_id", "text")
      val prior = InvertedIndex.postingShardsBinary(v1df, "text", "doc_id", 25L)
      val inc = InvertedIndex.incrementalShardsBinary(
        prior, v1df, v2df, "text", "doc_id", 25L)
      val full = InvertedIndex.postingShardsBinary(v2df, "text", "doc_id", 25L)
      assert(artifactRows(inc) === artifactRows(full), s"trial=$trial")
    }
  }

  test("incremental maintenance: empty delta carries the whole " +
      "artifact; total replacement rebuilds everything") {
    val v1 = (0L until 40L).map(i => (i, s"a b w${i % 4}")).toDF("doc_id", "text")
    val prior = InvertedIndex.postingShardsBinary(v1, "text", "doc_id", 10L)
    assert(artifactRows(InvertedIndex.incrementalShardsBinary(
      prior, v1, v1, "text", "doc_id", 10L)) === artifactRows(prior))
    val v2 = (0L until 40L).map(i => (i, s"x y w${(i + 1) % 4}")).toDF("doc_id", "text")
    assert(artifactRows(InvertedIndex.incrementalShardsBinary(
      prior, v1, v2, "text", "doc_id", 10L)) ===
      artifactRows(InvertedIndex.postingShardsBinary(v2, "text", "doc_id", 10L)))
  }

  test("append from the artifact alone == the from-scratch build " +
      "(randomized splits, incl. empty prior)") {
    val docs = (0L until 60L).map(i =>
      (i, s"w${i % 5} w${(i * 7) % 11} w${i % 5} z${i % 3}"))
      .toDF("doc_id", "text")
    for (m <- Seq(2L, 3L, 7L)) {
      val base = docs.where(col("doc_id") % m =!= 0)
      val added = docs.where(col("doc_id") % m === 0)
      val prior = InvertedIndex.postingShardsBinary(base, "text", "doc_id", 10L)
      val appended = InvertedIndex.appendToShardsBinary(
        prior, added, "text", "doc_id", 10L)
      val full = InvertedIndex.postingShardsBinary(docs, "text", "doc_id", 10L)
      assert(artifactRows(appended) === artifactRows(full), s"mod=$m")
    }
    // empty prior: everything encodes fresh
    val empty = InvertedIndex.postingShardsBinary(
      docs.limit(0), "text", "doc_id", 10L)
    assert(artifactRows(InvertedIndex.appendToShardsBinary(
      empty, docs, "text", "doc_id", 10L)) ===
      artifactRows(InvertedIndex.postingShardsBinary(
        docs, "text", "doc_id", 10L)))
  }

  test("append refuses re-ingesting an already-indexed doc by name") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val prior = InvertedIndex.postingShardsBinary(docs, "text", "doc_id", 10L)
    val e = intercept[Throwable] {
      InvertedIndex.appendToShardsBinary(
        prior, Seq((2L, "b edited")).toDF("doc_id", "text"),
        "text", "doc_id", 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("already indexed")),
      msgs(e).mkString(" | "))
  }

  test("phraseTableMatches (one pass, keyed dictionary join) == the " +
      "per-phrase phraseMatches loop; empty phrases refuse in-plan") {
    val docs = (0L until 120L).map(i =>
      (i, s"w${i % 3} w${i % 5} w${i % 3} w${i % 3} w${i % 7}"))
      .toDF("doc_id", "text")
    val phrases: Seq[(Long, Seq[String])] = Seq(
      0L -> Seq("w0", "w0"), 1L -> Seq("w1", "w2"),
      2L -> Seq("w0", "w1", "w0"), 3L -> Seq("zz", "w0"))
    val fromTable = InvertedIndex.phraseTableMatches(
        docs, "text", "doc_id", phrases.toDF("phrase_id", "terms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fromLoop = phrases.flatMap { case (pid, p) =>
      InvertedIndex.phraseMatches(docs, "text", "doc_id", p)
        .collect().map(r => (pid, r.getLong(0)) -> r.getLong(1))
    }.toMap
    assert(fromTable === fromLoop)
    val e = intercept[Throwable] {
      InvertedIndex.phraseTableMatches(docs, "text", "doc_id",
        Seq((9L, Seq.empty[String])).toDF("phrase_id", "terms")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("must be 1..64")), msgs(e).mkString(" | "))
  }

  test("proximityMatchesFromPostings == proximityMatches (artifact " +
      "round-trip)") {
    val docs = Seq(
      (1L, "a x x b b a x x x a x x b"),
      (2L, "a x x x x x x x x x x x b"),
      (3L, "b a"),
      (151L, "a b a b")).toDF("doc_id", "text") // second shard at span 100
    val idx = InvertedIndex.postingShardsBinary(docs, "text", "doc_id", 100L)
    val fromIdx = InvertedIndex
      .proximityMatchesFromPostings(idx, 100L, "a", "b", 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromScan = InvertedIndex
      .proximityMatches(docs, "text", "doc_id", "a", "b", 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromIdx === fromScan)
    assert(fromIdx.contains(151L))
  }
}
