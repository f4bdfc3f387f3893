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

  /** Byte budget for the checkpointed distinct-value rank table
    * [[percentileRanks]] pins for the returned plan's lifetime.
    * Modeled at [[RankRowBytes]] per distinct value; a column whose
    * domain prices over the budget is refused by name (the guard that
    * makes "percentile-rank a corpus-cardinality column" impossible
    * to do by accident — that misuse would pin corpus-sized
    * checkpoint blocks on the executors with no release point).
    */
  val RankTableBytesKey = "graft.quantiles.rankTableBytes"
  val DefaultRankTableBytes: Long = 256L << 20
  /** Cost model for one ranked distinct value: two longs + unsafe-row
    * + block-manager overhead.
    */
  val RankRowBytes = 48L

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
      // FULL addend `num·N + den − 1` could overflow (not just the
      // product — when num·N lands within den−1 of Long.MaxValue the
      // addition still wraps; practical only for extreme num/den pairs
      // on 10^17+-row corpora)
      quantiles.foreach { case (num, den) =>
        require(n == 0 || num <= (Long.MaxValue - den + 1L) / n,
          s"quantile target rank ($num*$n + $den - 1) would overflow " +
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

  /** Per-row EXACT percentile rank of an integral column — the
    * enrichment form of [[exactQuantiles]] ("how deep into the length
    * distribution is THIS doc"), published as the SQL-standard
    * `percent_rank` in exact parts-per-million:
    * `pct_rank_ppm = floor(count(values < v) · 10⁶ / (N − 1))`
    * (single-row corpora rank 0; null values rank null). The naive
    * plan is `percent_rank() OVER (ORDER BY v)` — a global sort with
    * a one-task window; here the distinct-value table is ranked by
    * the distributed prefix sum and the corpus re-joins it BY VALUE
    * (the rank is a pure function of the value), a narrow keyed join
    * the planner broadcasts when the value domain is small.
    *
    * Returns `df`'s columns plus `pct_rank_ppm`. The staged
    * distinct-value table stays checkpointed for the returned plan's
    * lifetime (it cannot be released before the caller evaluates the
    * enrichment); for the bounded domains this exists for — lengths,
    * fixed-point scores — that is KBs of executor state, the
    * jaccardScreen precedent. A domain over the [[RankTableBytesKey]]
    * byte budget is REFUSED by name (no silent corpus-sized pin).
    */
  def percentileRanks(df: DataFrame, valueCol: String): DataFrame = {
    // null values are OUTSIDE the distribution (they re-join as null
    // rank anyway); left in, their group would rank first and shift
    // every real value's below-count
    val byValue = df
      .where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__g", lit(0))
    val staged = byValue.localCheckpoint()
    // ONE row over the staged table both sizes the pinned rank table
    // (distinct count × RankRowBytes vs the budget) and totals N.
    val statsRow = staged
      .agg(count(lit(1)).as("d"), coalesce(sum("cnt"), lit(0L)).as("n"))
      .head()
    val distinctVals = statsRow.getLong(0)
    val budget = df.sparkSession.conf.getOption(RankTableBytesKey)
      .map(_.toLong).getOrElse(DefaultRankTableBytes)
    if (distinctVals * RankRowBytes > budget) {
      org.apache.spark.sql.classic.GraftColumnBridge
        .unpersistLocalCheckpoint(staged)
      throw new IllegalArgumentException(
        s"percentileRanks: $distinctVals distinct '$valueCol' values " +
          s"price the pinned rank table at ${distinctVals * RankRowBytes} B " +
          s"(> $budget B, $RankTableBytesKey). This op pins the table " +
          "for the returned plan's LIFETIME and exists for bounded " +
          "domains (lengths, fixed-point scores); for a " +
          "corpus-cardinality column use exactQuantiles (released " +
          "eagerly) or raise the budget explicitly.")
    }
    val n = statsRow.getLong(1)
    val denom = math.max(n - 1L, 1L)
    require(n == 0 || Long.MaxValue / 1000000L >= n,
      s"corpus size $n would overflow the ppm product")
    val ranked = Packing.startOffsetsAuto(staged, "__g", "__v", "cnt")
      .select(col("__v"),
        expr(s"start_offset * 1000000 div ${denom}L").as("pct_rank_ppm"))
    df.join(ranked, df(valueCol).cast("long") === col("__v"), "left")
      .drop("__v")
  }
}
