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
  * Plan shape: one token pass per corpus for the bucket tables (≤ B
  * rows each — broadcast), one raw-corpus token pass for the scoring
  * join (bucket-keyed against the broadcast llr table), one per-doc
  * aggregation. Nothing vocabulary-sized ever shuffles; B bounds
  * every broadcast. The llr magnitude is bounded by ~2·iln(2⁶³) <
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

    val rawTok = raw.select(col(idCol).cast("long").as("doc_id"),
      explode(TextAnalytics.tokens(col(textCol))).as("tok"))
    val rb = rawTok.groupBy(bucket(col("tok")).as("b"))
      .agg(count(lit(1)).as("cr"))
    val tb = target
      .select(explode(TextAnalytics.tokens(col(textCol))).as("tok"))
      .groupBy(bucket(col("tok")).as("b"))
      .agg(count(lit(1)).as("ct"))

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

    rawTok
      .select(col("doc_id"), bucket(col("tok")).as("b"))
      .join(broadcast(llr), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("llr").as("llr_scaled"))
  }
}
