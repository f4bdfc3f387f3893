package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{FixedLog, Shingling, TextAnalytics}

/** Collocation mining by pointwise mutual information (Church & Hanks,
  * Computational Linguistics 1990) — the phrase-discovery stage of a
  * corpus pipeline: bigrams whose co-occurrence is far above chance
  * become tokenizer vocabulary candidates, multi-word entities, or
  * stop-bigram lists. The reference's closest analog is its term/
  * phrase facet counting (`search/counts.js` aggregations); this is
  * the statistical generalization a training corpus needs.
  *
  * Every arithmetic step is integer, so the score gates hash-exact
  * cross-engine: with c(a·), c(·b) the bigram-position marginals, N
  * the total bigram count, and iln ≈ 10⁶·ln the pure-integer
  * fixed-point log ([[graft.functions.FixedLog]]),
  *
  *   pmi_1m = iln(c(ab)) + iln(N) − iln(c(a·)) − iln(c(·b))
  *
  * — the ADDITIVE decomposition of ln(c·N/(cₐ·c_b)), chosen over the
  * product form deliberately: every log argument is a plain count
  * (≤ N), so nothing overflows at ANY corpus size — no N·c product, no
  * refusal bound needed (ln(2⁶³) ≈ 43.7, so |pmi_1m| stays ≤ ~9·10⁷).
  *
  * Plan shape: one tokenize pass → bigram groupBy (map-side partials
  * bound the shuffle by the distinct-bigram vocabulary), marginals
  * re-aggregate from the bigram table (never a second corpus pass),
  * marginal attach is KEYED on the token (a web-scale bigram table
  * shuffles, never broadcasts), and the top-k is a
  * TakeOrderedAndProject — no full sort materializes. Ties pin
  * (pmi desc, a asc, b asc).
  */
object Collocations {

  /** Top-`k` collocations with support ≥ `minCount`:
    * `(a, b, c_ab, pmi_1m)`.
    */
  def pmiTopK(
      docs: DataFrame,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(TextAnalytics.tokens(col(textCol)).as("l"))
      .where(size(col("l")) >= 2)
    // tokens are space-free by the tokenizer's definition, so the
    // bigram string splits back unambiguously (the LmScore precedent)
    // bigram-vocabulary-sized; FOUR consumers below (both marginals,
    // the scalar N, the scored output) — materialize the single
    // tokenize+aggregate pass instead of replaying it per consumer
    val cab = graft.core.StagingScope.stage(toks
      .select(explode(Shingling.orderedShingles(col("l"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .select(
        element_at(split(col("bg"), " "), 1).as("a"),
        element_at(split(col("bg"), " "), 2).as("b"),
        col("c_ab")))
    val ca = cab.groupBy("a").agg(sum("c_ab").as("c_a"))
    val cb = cab.groupBy("b").agg(sum("c_ab").as("c_b"))
    // one bounded stats job for the scalar N (the Bm25.buildIndex
    // precedent); empty corpora refuse by name
    val n = cab.agg(coalesce(sum("c_ab"), lit(0L))).head().getLong(0)
    require(n > 0, "pmi: no bigrams in the corpus")
    cab.where(col("c_ab") >= minCount)
      .join(ca, Seq("a"))
      .join(cb, Seq("b"))
      .select(col("a"), col("b"), col("c_ab"),
        (FixedLog.iln1m(col("c_ab")) + lit(FixedLog.iln1mImpl(n)) -
          FixedLog.iln1m(col("c_a")) - FixedLog.iln1m(col("c_b")))
          .as("pmi_1m"))
      .orderBy(col("pmi_1m").desc, col("a"), col("b"))
      .limit(k)
  }
}
