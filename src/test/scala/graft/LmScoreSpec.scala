package graft

import graft.functions.FixedLog
import graft.ops.LmScore

/** Bigram-LM scoring: exact-integer replay, smoothing edges, and the
  * semantic sanity that in-distribution text scores lower nll than
  * out-of-vocabulary text.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the cat ran")

  private def brute(text: String): (Long, Long) = {
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
    val tg = train.flatMap(t => toks(t._2).sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq)
    val c2 = tg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = tg.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = train.flatMap(t => toks(t._2)).distinct.size.toLong + 1
    val bgs = toks(text).sliding(2).filter(_.size == 2).toSeq
    val nll = bgs.map { p =>
      FixedLog.iln1mImpl(c1.getOrElse(p(0), 0L) + v) -
        FixedLog.iln1mImpl(c2.getOrElse((p(0), p(1)), 0L) + 1L)
    }.sum
    (bgs.size.toLong, nll)
  }

  private def run(docs: Seq[(Long, String)], parts: Int = 3) =
    LmScore.bigramNll(
      train.toDF("doc_id", "text"),
      docs.toDF("doc_id", "text").repartition(parts),
      "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("equals the exact-integer replay, including unseen bigrams " +
      "(seen tokens, new pair) and unseen prev tokens") {
    val docs = Seq(
      10L -> "the cat sat",      // all bigrams seen
      11L -> "cat the mat on",   // seen tokens, unseen pairs
      12L -> "zebra quark the",  // unseen prev tokens
      13L -> "single")           // < 2 tokens: no row
    val got = run(docs)
    assert(!got.contains(13L))
    for (id <- Seq(10L, 11L, 12L)) {
      val (n, nll) = brute(docs.find(_._1 == id).get._2)
      assert(got(id)._1 === n, s"doc $id n")
      assert(got(id)._2 === nll, s"doc $id nll")
      assert(got(id)._3 === nll / n, s"doc $id avg")
    }
  }

  test("fluent in-distribution text scores lower avg nll than " +
      "out-of-vocabulary text") {
    val got = run(Seq(20L -> "the cat sat on the mat",
      21L -> "xyzzy plugh foobar qux"))
    assert(got(20L)._3 < got(21L)._3)
  }

  test("empty training corpus refuses by name") {
    val e = intercept[IllegalArgumentException] {
      LmScore.bigramNll(
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        Seq(1L -> "a b").toDF("doc_id", "text"), "text", "doc_id")
    }
    assert(e.getMessage.contains("training"))
  }
}
