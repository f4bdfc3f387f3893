package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{FixedLog, Shingling, TextAnalytics}

/** N-gram language-model quality scoring — the CCNet-style filter
  * (Wenzek et al. 2020): score each document's negative log-likelihood
  * under a bigram LM trained on a reference corpus; high perplexity
  * marks gibberish/boilerplate, low marks fluent text. Exact integer
  * scores so the gate replays them:
  *
  *  - add-one-smoothed conditional: p(tok|prev) =
  *    (c₂(prev,tok)+1)/(c₁(prev)+V), V = train vocabulary + 1 — both
  *    log arguments are INTEGERS;
  *  - per-bigram nll = iln(c₁+V) − iln(c₂+1) ≥ 0 through the
  *    pure-integer [[FixedLog.iln1m]] (units 10⁻⁶ nats);
  *  - per-doc `nll_scaled` = the exact integer sum; `avg_nll` =
  *    `nll_scaled div n_bigrams` is the perplexity proxy a filter
  *    thresholds on (ppl = e^(avg/10⁶)).
  *
  * Plan shape: the bigram and prev-count tables are train-corpus-
  * keyed joins (never broadcast-forced — a web-scale LM table
  * shuffles on its key), the vocabulary size is one scalar job, the
  * scoring pass is one explode + two keyed left joins + a per-doc
  * aggregation. Unseen bigrams and unseen prev tokens smooth to
  * 1/(0+V) — no row drops out.
  *
  * Output: `(doc_id, n_bigrams, nll_scaled, avg_nll)`, one row per
  * scored doc with ≥ 2 tokens.
  */
object LmScore {

  def bigramNll(
      train: DataFrame,
      docs: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val trainToks = train
      .select(TextAnalytics.tokens(col(textCol)).as("l"))
    val tg = trainToks.where(size(col("l")) >= 2)
      .select(explode(Shingling.orderedShingles(col("l"), 2)).as("bg"))
    // the LM artifact: materialized once (bigram-table-sized), read by
    // the scoring join AND the c1 derivation below
    val c2 = graft.core.StagingScope.stage(
      tg.groupBy("bg").agg(count(lit(1)).as("c2")))
    // c1(prev) = bigrams starting at prev = occurrences of prev in
    // non-final positions = Σ c2 over bigrams whose first token is
    // prev — re-aggregated from the bigram table, never a second
    // train-corpus tokenize pass
    val c1 = c2
      .groupBy(expr("split(bg, ' ')[0]").as("prev"))
      .agg(sum("c2").as("c1"))
    val v = trainToks.select(explode(col("l")).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0) + 1L
    require(v >= 2, "lm: empty training corpus")

    // tokens are space-free by the tokenizer's definition, so the
    // bigram string splits back unambiguously
    val rg = docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextAnalytics.tokens(col(textCol)).as("l"))
      .where(size(col("l")) >= 2)
      .select(col("doc_id"),
        explode(Shingling.orderedShingles(col("l"), 2)).as("bg"))
      .withColumn("prev", expr("split(bg, ' ')[0]"))

    rg.join(c2, Seq("bg"), "left")
      .join(c1, Seq("prev"), "left")
      .select(col("doc_id"),
        (FixedLog.iln1m(coalesce(col("c1"), lit(0L)) + lit(v)) -
          FixedLog.iln1m(coalesce(col("c2"), lit(0L)) + lit(1L)))
          .as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("nll_scaled"))
      .withColumn("avg_nll", expr("nll_scaled div n_bigrams"))
  }
}
