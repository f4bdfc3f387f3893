package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{FixedLog, TextAnalytics}

/** DSIR-style importance scoring — Data Selection via Importance
  * Resampling (Xie et al. 2023): score each raw-corpus document by
  * how much more likely its text is under a TARGET distribution than
  * under the raw distribution, using hashed n-gram (here: unigram
  * bucket) features — the standard cheap proxy for "select web data
  * that looks like the high-quality target". Scores here are EXACT
  * integers so the gate replays them:
  *
  *  - feature = md5-60-bit(token) mod `buckets` (the cross-engine
  *    hash this repo standardizes on);
  *  - per bucket, add-one-smoothed probabilities under each corpus:
  *    p = (c + 1)/(T + B) — the log-likelihood ratio needs only
  *    integer-argument logs: llr_b = [iln(c_t+1) − iln(T_t+B)] −
  *    [iln(c_r+1) − iln(T_r+B)] through the pure-integer
  *    [[FixedLog.iln1m]] (units 10⁻⁶ nats);
  *  - per doc, llr_scaled = Σ over token positions of its bucket's
  *    llr — an exact integer sum, order- and partition-independent.
  *
  * Plan shape: ONE token pass per corpus — the raw corpus folds to a
  * (doc, bucket, cnt) table (materialized once; every downstream
  * consumer, including the scoring join, reads it), the target to its
  * ≤ B-row bucket table (broadcast). Nothing vocabulary-sized ever
  * shuffles; B bounds every broadcast. The llr magnitude is bounded by ~2·iln(2⁶³) <
  * 10⁸, so a doc would need ~10¹¹ tokens to overflow the Long sum —
  * far past any real document.
  *
  * Output: `(doc_id, n_tokens, llr_scaled)`, one row per raw doc with
  * ≥ 1 token. Selection composes downstream (q113 keeps docs at or
  * above the median per-token score via [[Quantiles.exactQuantiles]]).
  */
object Dsir {

  def importanceScores(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    def bucket(tok: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast("long"),
        lit(buckets.toLong))

    // ONE raw tokenize pass: fold the corpus to (doc_id, bucket, cnt)
    // — at most min(B, dl) rows per doc — and derive everything else
    // from it (the per-doc scoring sum distributes over equal-bucket
    // tokens: Σ_positions llr(b) = Σ_buckets cnt·llr(b), exact integer
    // either way). The un-checkpointed form re-tokenized the raw
    // corpus three times (bucket table, scalar total, scoring join).
    val rawBuckets = graft.core.StagingScope.stage(
      raw.select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalytics.tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), bucket(col("tok")).as("b"))
      .agg(count(lit(1)).as("cnt")))
    val rb = rawBuckets.groupBy("b").agg(sum("cnt").as("cr"))
    // ≤ B rows; feeds the scalar total AND the llr table — one target
    // tokenize pass instead of two
    val tb = graft.core.StagingScope.stage(target
      .select(explode(TextAnalytics.tokens(col(textCol))).as("tok"))
      .groupBy(bucket(col("tok")).as("b"))
      .agg(count(lit(1)).as("ct")))

    // two scalar totals off the (≤ B)-row bucket tables
    val tr = rb.agg(coalesce(sum("cr"), lit(0L))).head().getLong(0)
    val tt = tb.agg(coalesce(sum("ct"), lit(0L))).head().getLong(0)
    require(tr > 0, "dsir: empty raw corpus")
    require(tt > 0, "dsir: empty target corpus")
    val kT = FixedLog.iln1mImpl(tt + buckets)
    val kR = FixedLog.iln1mImpl(tr + buckets)

    val llr = rb.join(tb, Seq("b"), "left")
      .select(col("b"),
        ((FixedLog.iln1m(coalesce(col("ct"), lit(0L)) + lit(1L)) - lit(kT)) -
          (FixedLog.iln1m(col("cr") + lit(1L)) - lit(kR))).as("llr"))

    rawBuckets
      .join(broadcast(llr), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("llr")).as("llr_scaled"))
  }
}
