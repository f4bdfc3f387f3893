package graft

import org.apache.spark.sql.functions._

import graft.functions.FixedLog
import graft.ops.Bm25

/** BM25 over a toy corpus: the distributed plan must equal an
  * independent single-machine replay of the exact integer formula on
  * every partitioning, and the overflow/width guards must refuse by
  * name.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "apple banana apple cherry",
    2L -> "banana banana date",
    3L -> "apple date date date egg",
    4L -> "cherry egg fig fig fig fig",
    5L -> "apple banana cherry date egg fig")

  /** Independent replay of the documented integer formula. */
  private def brute(
      qs: Map[Long, Seq[String]], k: Int): Seq[(Long, Long, Long, Long)] = {
    val tf = corpus.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (w, occ) => (id, w, occ.length.toLong) }
    }
    val dl = tf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = dl.size.toLong
    val tot = dl.values.sum
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val idf = df.map { case (w, d) =>
      w -> (FixedLog.iln1mImpl(2 * n + 2) - FixedLog.iln1mImpl(2 * d + 1))
    }
    qs.toSeq.flatMap { case (qid, terms) =>
      val scores = corpus.map(_._1).map { doc =>
        val s = terms.distinct.map { w =>
          tf.find(r => r._1 == doc && r._2 == w).fold(0L) { r =>
            val lppm = 1000000L * dl(doc) * n / tot
            val denom = 1000000L * r._3 + 300000L + 9L * lppm / 10L
            idf(w) * (2200000L * r._3 * 1000000L / denom)
          }
        }.sum
        (doc, s)
      }.filter(_._2 > 0)
      scores.sortBy { case (doc, s) => (-s, doc) }.take(k)
        .zipWithIndex.map { case ((doc, s), i) => (qid, (i + 1).toLong, doc, s) }
    }.sortBy(r => (r._1, r._2))
  }

  private def run(
      qs: Map[Long, Seq[String]], k: Int, parts: Int) =
    Bm25.bm25TopK(
      corpus.toDF("doc_id", "text").repartition(parts),
      qs.toSeq.map { case (q, t) => (q, t) }.toDF("query_id", "terms"),
      "text", "doc_id", "query_id", "terms", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(r => (r._1, r._2)).toSeq

  test("equals the exact-integer replay on every partitioning; " +
      "duplicate query terms count once; absent terms contribute 0") {
    val qs = Map(
      10L -> Seq("apple", "date"),
      11L -> Seq("fig", "fig", "zzz-absent"),
      12L -> Seq("banana"))
    val want = brute(qs, 3)
    for (parts <- Seq(1, 2, 7))
      assert(run(qs, 3, parts) === want, s"parts=$parts")
  }

  test("a doc with distinctive vocabulary ranks itself first") {
    val qs = Map(4L -> Seq("fig", "egg", "cherry"))
    assert(run(qs, 1, 3).head._3 === 4L)
  }

  test("guards refuse by name: query width and empty corpus") {
    val wide = Map(1L -> (1 to Bm25.MaxQueryTerms + 1).map(i => s"t$i"))
    // the width guard is IN-PLAN (raise_error), so it surfaces at the
    // action as a task failure wrapping the user-raised message
    val e = intercept[Throwable] { run(wide, 5, 2) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("distinct terms")),
      s"expected the width refusal in: ${messages(e).mkString(" | ")}")
    val empty = intercept[IllegalArgumentException] {
      Bm25.bm25TopK(
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        Seq((1L, Seq("a"))).toDF("query_id", "terms"),
        "text", "doc_id", "query_id", "terms", 3)
    }
    assert(empty.getMessage.contains("empty corpus"))
  }
}
