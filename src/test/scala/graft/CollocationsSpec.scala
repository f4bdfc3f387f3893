package graft

import org.apache.spark.sql.functions._

import graft.functions.FixedLog
import graft.ops.Collocations

/** Integer-PMI collocation mining: hand-replayed scores, pinned
  * tie-break, additive-form equivalence, refusals.
  */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private def pmi(cab: Long, n: Long, ca: Long, cb: Long): Long =
    FixedLog.iln1mImpl(cab) + FixedLog.iln1mImpl(n) -
      FixedLog.iln1mImpl(ca) - FixedLog.iln1mImpl(cb)

  test("hand case: counts, marginals, and the exact integer score") {
    // doc1 grams: ab, ba, ab, bc, cb; doc2: bc
    // => c_ab=2, c_ba=1, c_bc=2, c_cb=1, N=6
    // first-position marginals: a.=2, b.=3, c.=1
    // second-position marginals: .a=1, .b=3, .c=2
    val docs = Seq("a b a b c b", "b c").toDF("text")
    val out = Collocations.pmiTopK(docs, "text", minCount = 1L, k = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet === Set(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")))
    assert(out(("a", "b")) === ((2L, pmi(2, 6, 2, 3))))
    assert(out(("b", "a")) === ((1L, pmi(1, 6, 3, 1))))
    assert(out(("b", "c")) === ((2L, pmi(2, 6, 3, 2))))
    assert(out(("c", "b")) === ((1L, pmi(1, 6, 1, 3))))
  }

  test("ordering: pmi desc with ties to (a, b) ascending; k truncates") {
    // symmetric corpus: (x y) and (y x) have identical counts and
    // marginals -> identical pmi -> tie breaks to ("x","y") first
    val docs = Seq("x y x y", "y x y x").toDF("text")
    val rows = Collocations.pmiTopK(docs, "text", 1L, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(rows.map(t => (t._1, t._2)).toSeq ===
      Seq(("x", "y"), ("y", "x")).sorted)
    assert(rows(0)._3 === rows(1)._3)
    assert(Collocations.pmiTopK(docs, "text", 1L, 1).count() === 1L)
  }

  test("minCount filters support; refusals by name") {
    // "a b a b" grams: ab, ba, ab -> only (a, b) reaches count 2
    val docs = Seq("a b a b", "c d").toDF("text")
    val kept = Collocations.pmiTopK(docs, "text", minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(kept.toSet === Set(("a", "b")))
    intercept[IllegalArgumentException] {
      Collocations.pmiTopK(docs, "text", 0L, 5)
    }
    intercept[IllegalArgumentException] {
      Collocations.pmiTopK(docs, "text", 1L, 0)
    }
    intercept[IllegalArgumentException] {
      // only sub-2-token docs -> no bigrams -> empty-corpus refusal
      Collocations.pmiTopK(Seq("solo", "x").toDF("text"), "text", 1L, 5)
    }
  }
}
