package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed evaluation statistics for model-based curation filters.
  *
  * A training-data pipeline that filters by a scored classifier
  * (quality model, fasttext-style language/toxicity scorer, dedup
  * confidence) has to EVALUATE that scorer against labels at corpus
  * scale before trusting it to drop petabytes. The standard metric is
  * ROC-AUC, and the standard distributed formulation is the
  * Mann-Whitney rank-sum identity:
  *
  *   AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)
  *
  * where R⁺ is the sum of the positive rows' ranks under ascending
  * score order, ties taking the AVERAGE rank of their run. The naive
  * plan ranks with `rank() OVER (ORDER BY score)` — a GLOBAL sort
  * whose window is ONE task holding the corpus. This implementation
  * instead:
  *
  *  1. collapses the corpus to one row per distinct score (count +
  *     positive count) — a map-side-combinable aggregation, the only
  *     corpus-sized pass;
  *  2. ranks the (small) score table with the same two-level
  *     distributed prefix sum sequence packing uses
  *     ([[Packing.startOffsetsAuto]]) — no global sort, no one-task
  *     window, every task O(√distinct-scores);
  *  3. folds the rank-sum in INTEGER space: a run of `cnt` tied scores
  *     after `start` lower-scored rows has average rank
  *     start + (cnt+1)/2, so 2·R⁺ = Σ npos·(2·start + cnt + 1) — an
  *     exact BIGINT both engines sum order-independently (no
  *     floating-point accumulation to diverge across partitionings).
  *
  * The one floating division happens once, on exact integers, and is
  * published floor-scaled (`auc_ppm` = ⌊AUC·10⁶⌋) so the oracle
  * comparison never hinges on round-half-tie behavior.
  */
object Eval {

  /** Tie-averaged ROC-AUC of an INTEGER score column against a 0/1
    * label column, as a single row:
    * (auc_ppm, n_pos, n_neg, rank_sum2). `auc_ppm` is null when either
    * class is empty (AUC undefined). Scores must be integral (callers
    * with real-valued scores quantize first — fixed-point scaling
    * preserves AUC exactly since it is rank-based); labels any numeric
    * 0/1.
    */
  def binaryAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val byScore = df
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("npos"))
      .withColumn("__g", lit(0))
    // The collapsed score table is the op's whole working set (one row
    // per distinct score — bounded for fixed-point scores). Checkpoint
    // it so the corpus-sized scoring aggregation runs exactly ONCE:
    // left lazy, startOffsetsAuto's span-stats probe and BOTH
    // prefix-sum branches (the shard subtotals and the final join
    // side) each re-evaluate the corpus pass — 3x the dominant cost,
    // measured in the plan (two FileScans + a separate stats job, no
    // exchange reuse since the branch subtrees prune differently).
    // The result is one row, so it is materialized eagerly and the
    // staged table released before returning (verifyAuto's lifecycle
    // — no pinned blocks ride past the call).
    val staged = byScore.localCheckpoint()
    try {
      val out = Packing.startOffsetsAuto(staged, "__g", "score", "cnt")
        .agg(
          sum(col("npos") * (col("start_offset") * 2 + col("cnt") + lit(1L)))
            .as("rank_sum2"),
          sum(col("npos")).as("n_pos"),
          sum(col("cnt") - col("npos")).as("n_neg"))
        .select(
          when(col("n_pos") > 0 && col("n_neg") > 0,
            floor(
              (col("rank_sum2") - col("n_pos") * (col("n_pos") + lit(1L)))
                .cast("double") * lit(1000000.0)
                / (col("n_pos").cast("double") * col("n_neg") * lit(2.0)))
              .cast("long")).as("auc_ppm"),
          col("n_pos"), col("n_neg"), col("rank_sum2"))
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(out.collect().toSeq.asJava, out.schema)
    } finally
      // Dataset.unpersist would miss the checkpoint RDD hiding behind
      // the LogicalRDD — the bridge releases the blocks themselves
      org.apache.spark.sql.classic.GraftColumnBridge
        .unpersistLocalCheckpoint(staged)
  }
}
