package graft

import graft.functions.BpeMerge
import graft.ops.BpeLearn

/** BPE merge learning must equal an independent single-machine replay
  * on every input and partitioning; the merge kernel's leftmost-
  * non-overlapping rule is the part worth hand-pinning (runs of
  * identical symbols are where naive implementations double-merge).
  */
class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent replay of the documented algorithm ----
  private def mergeSeq(l: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < l.length) {
      if (i + 1 < l.length && l(i) == a && l(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += l(i); i += 1 }
    }
    out.result()
  }

  private def brute(
      corpus: Seq[Vector[String]], rounds: Int): Seq[(Long, String, String, Long)] = {
    var seqs = corpus.filter(_.length >= 2)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = seqs.flatMap(l => l.zip(l.tail))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        merges += ((r.toLong, a, b, c))
        seqs = seqs.map(mergeSeq(_, a, b)).filter(_.length >= 2)
        r += 1
      }
    }
    merges.result()
  }

  private def run(corpus: Seq[Vector[String]], rounds: Int, parts: Int) =
    BpeLearn.learnMerges(
      corpus.zipWithIndex.map { case (l, i) => (i.toLong, l.mkString(" ")) }
        .toDF("doc_id", "text").repartition(parts),
      "text", rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("merge kernel: leftmost non-overlapping, runs don't chain") {
    def m(l: String*)(a: String, b: String): Seq[String] =
      Seq(Tuple1(l)).toDF("syms")
        .select(BpeMerge.mergePair(org.apache.spark.sql.functions.col("syms"),
          org.apache.spark.sql.functions.lit(a),
          org.apache.spark.sql.functions.lit(b)))
        .head().getSeq[String](0)
    assert(m("a", "a", "a")("a", "a") === Seq("aa", "a"))
    assert(m("a", "a", "a", "a")("a", "a") === Seq("aa", "aa"))
    assert(m("a", "b", "a", "b", "a")("a", "b") === Seq("ab", "ab", "a"))
    assert(m("x", "a", "b", "y")("a", "b") === Seq("x", "ab", "y"))
    assert(m("a", "b")("c", "d") === Seq("a", "b"))
    // a merged symbol never re-merges within the round
    assert(m("a", "a", "b", "b")("a", "ab") === Seq("a", "a", "b", "b"))
  }

  test("learned merge table equals the replay on run-heavy and " +
      "randomized corpora, all partitionings") {
    val runHeavy = Seq(
      Vector("a", "a", "a", "a", "a"), Vector("a", "a", "a"),
      Vector("a", "b", "a", "b", "a"), Vector("x", "y", "x", "y"),
      Vector("b", "a", "b", "a", "b"), Vector("solo"))
    assert(run(runHeavy, 6, 3) === brute(runHeavy, 6))
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val corpus = Seq.fill(40)(
        Vector.fill(1 + rnd.nextInt(12))(s"w${rnd.nextInt(6)}"))
      for (parts <- Seq(1, 5))
        assert(run(corpus, 6, parts) === brute(corpus, 6),
          s"seed=$seed parts=$parts")
    }
  }

  test("stops early when the corpus runs out of pairs; refuses bad rounds") {
    // two two-symbol docs: round 1 merges both to singletons, so the
    // table has exactly 1 row however many rounds were requested
    val tiny = Seq(Vector("p", "q"), Vector("p", "q"))
    assert(run(tiny, 5, 2) === brute(tiny, 5))
    assert(run(tiny, 5, 2).size === 1)
    val e = intercept[IllegalArgumentException] {
      BpeLearn.learnMerges(Seq((1L, "a b")).toDF("doc_id", "text"), "text", 0)
    }
    assert(e.getMessage.contains("rounds"))
  }
}
