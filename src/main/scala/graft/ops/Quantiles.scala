package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles of an integral column — corpus length
  * and score distributions are how a curation pipeline sets its
  * filter thresholds ("drop the shortest 10%", "cap at p99 tokens"),
  * and approximate sketches (t-digest / `approx_percentile`) give
  * answers that drift with partitioning, which a reproducible
  * pipeline spec cannot tolerate. The naive exact plan is
  * `ORDER BY value` + row_number — a global sort with a one-task
  * window. This one never sorts the corpus:
  *
  *  1. collapse to one row per DISTINCT value (map-side combinable —
  *     the only corpus-sized pass; for lengths/fixed-point scores the
  *     distinct table is thousands of rows);
  *  2. rank the value table with the two-level distributed prefix sum
  *     ([[Packing.startOffsetsAuto]] — every task O(√distinct));
  *  3. each requested quantile becomes an integer target rank
  *     `ceil(num·N / den)` (exact arithmetic, no floating point), and
  *     the answer is the unique value whose cumulative range
  *     `(start, start+cnt]` covers the target — found by one codegen
  *     array-filter pass over the ranked table, no join, no sort.
  *
  * The result is the type-1 (lower discrete) quantile: the smallest
  * value v with at least ceil(num·N/den) rows ≤ v — deterministic,
  * partition-layout-independent, and replayable in ANSI SQL, unlike
  * interpolating definitions whose float blends diverge across
  * engines.
  */
object Quantiles {

  /** Exact quantiles of `valueCol` (cast to long) at the rational
    * fractions `quantiles` = (num, den) pairs, 0 < num ≤ den. Output:
    * one row per requested fraction, `(pct_num, pct_den, value)`;
    * empty input yields no rows.
    */
  def exactQuantiles(
      df: DataFrame,
      valueCol: String,
      quantiles: Seq[(Long, Long)]): DataFrame = {
    require(quantiles.nonEmpty, "at least one quantile fraction required")
    quantiles.foreach { case (num, den) =>
      require(den > 0 && num > 0 && num <= den,
        s"quantile fraction must satisfy 0 < num <= den, got $num/$den")
    }
    val byValue = df
      .groupBy(col(valueCol).cast("long").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__g", lit(0))
    // Same lifecycle as Eval.binaryAuc: the distinct-value table is
    // the whole working set; checkpoint it so the corpus pass runs
    // once (the span-stats probe, the prefix-sum branches, and the
    // N-scalar below would otherwise each re-run it), release before
    // returning — the output is quantile-count-sized, materialized
    // eagerly.
    val staged = byValue.localCheckpoint()
    try {
      val nRow = staged.agg(coalesce(sum("cnt"), lit(0L))).head()
      val n = nRow.getLong(0)
      // the target-rank product must stay exact: refuse fractions whose
      // numerator could overflow num·N (practical only for extreme
      // num/den pairs on 10^17+-row corpora)
      quantiles.foreach { case (num, _) =>
        require(n == 0 || num <= Long.MaxValue / n,
          s"quantile numerator $num times corpus size $n would overflow " +
            "Long — reduce the fraction (e.g. 999999/1000000 on a " +
            "smaller base)")
      }
      val targets = array(quantiles.map { case (num, den) =>
        struct(
          lit(num).as("pct_num"),
          lit(den).as("pct_den"),
          lit((num * n + den - 1L) / den).as("target"))
      }: _*)
      val out = Packing.startOffsetsAuto(staged, "__g", "value", "cnt")
        .select(col("value"),
          explode(filter(targets, t =>
            col("start_offset") < t("target") &&
              t("target") <= col("start_offset") + col("cnt"))).as("q"))
        .select(
          col("q.pct_num").as("pct_num"),
          col("q.pct_den").as("pct_den"),
          col("value"))
      val spark = df.sparkSession
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(out.collect().toSeq.asJava, out.schema)
    } finally
      org.apache.spark.sql.classic.GraftColumnBridge
        .unpersistLocalCheckpoint(staged)
  }
}
