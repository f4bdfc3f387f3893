package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: concatenate a corpus
  * into fixed-token-budget training sequences, deterministically and at
  * scale.
  *
  * Two semantics are offered:
  *
  *  - '''Offset packing''' ([[packByOffset]]): documents are laid out in
  *    a deterministic order; each document belongs to the sequence its
  *    START offset falls into (`floor(start / budget)`). Documents may
  *    straddle a boundary (the trainer truncates or spills) — the
  *    semantics every "concat-then-chunk" data loader implements, and the
  *    one that is expressible as a pure prefix sum.
  *  - '''Greedy packing''' ([[packGreedyShards]]): first-fit-in-order
  *    with reset — a document that would overflow the open sequence
  *    closes it and starts the next, so no sequence exceeds the budget
  *    unless a single document does. Inherently sequential, so it is
  *    computed independently per (stratum, shard): bin packing is a
  *    local decision and sharding makes it embarrassingly parallel.
  *
  * Scale design: the naive offset layout is
  * `sum(w) OVER (PARTITION BY stratum ORDER BY order)` — which plans as
  * ONE task per stratum holding the stratum's entire corpus; with a
  * handful of languages over 100 TB that is a straight driver-killer.
  * [[startOffsets]] instead runs the classic two-level distributed
  * prefix sum:
  *
  *  1. shard the order key (`order div shardSpan`) and aggregate one
  *     subtotal per (stratum, shard) — map-side-combined, fully parallel;
  *  2. prefix-sum the subtotals per stratum — a window over the SHARD
  *     table, smaller than the corpus by ~shardSpan;
  *  3. broadcast the shard base offsets back and finish with a local
  *     prefix sum inside each (stratum, shard) — bounded-size groups, so
  *     no task ever materializes more than ~shardSpan rows.
  *
  * Equality of the two plans is pinned in PackingSpec; q74 gates the
  * distributed one against a DuckDB window oracle.
  */
object Packing {

  /** Start offset of every row in its stratum's concatenated weight
    * stream (ordering by `order`, which must be unique within a
    * stratum), via the distributed prefix sum described above. Adds
    * column `start_offset`; preserves all input columns.
    *
    * `shardSpan` buckets the ORDER KEY VALUE (`order div shardSpan`), so
    * with a dense id the shard table is ~n/shardSpan rows. Pick
    * shardSpan ≈ sqrt(corpus/strata) to balance the two levels; any
    * value is correct.
    */
  def startOffsets(df: DataFrame, stratum: String, order: String,
                   weight: String, shardSpan: Long): DataFrame = {
    require(shardSpan > 0, s"shardSpan must be positive, got $shardSpan")
    val in = df.withColumn("__shard",
      floor(col(order) / lit(shardSpan)).cast("long"))
    // level 1: one subtotal per (stratum, shard) — partial-agg combine
    // keeps the shuffle at one row per (map task, stratum, shard)
    val subtotals = in.groupBy(stratum, "__shard")
      .agg(sum(col(weight).cast("long")).as("__sub"))
    // level 2: prefix-sum the shard table. It is ~shardSpan× smaller
    // than the corpus; the per-stratum window is over shard COUNTS,
    // not rows, so the single-task-per-stratum cost is bounded.
    val wShards = Window.partitionBy(stratum).orderBy("__shard")
    val bases = subtotals
      .withColumn("__base", sum("__sub").over(wShards) - col("__sub"))
      .drop("__sub")
    // level 3: local prefix sum inside bounded (stratum, shard) groups,
    // plus the broadcast shard base
    val wLocal = Window.partitionBy(stratum, "__shard").orderBy(order)
    in.join(broadcast(bases), Seq(stratum, "__shard"))
      .withColumn("start_offset",
        col("__base") + sum(col(weight).cast("long")).over(wLocal)
          - col(weight).cast("long"))
      .drop("__shard", "__base")
  }

  /** A balanced `shardSpan` from corpus stats: with `n` rows across
    * `strata` strata and order keys spanning `keyRange` values, level 2
    * holds ~keyRange/span shard rows per stratum and level 3
    * ~(n/strata)·(span/keyRange) rows per group — equal at
    * `span = keyRange / sqrt(n/strata)`, making BOTH levels
    * O(sqrt(n/strata)) per task. Uniformity of the key over its range
    * (dense ids, or hash-derived keys over their domain) is what
    * balances the levels; density is not required. A FIXED span — or a
    * fixed shard COUNT like `domain >> k` — breaks this: one level's
    * per-task state then grows linearly with the corpus (the q87
    * 256-shards-forever regression this helper replaces).
    */
  def balancedSpan(n: Long, keyRange: Long, strata: Long = 1L): Long = {
    require(keyRange > 0, s"keyRange must be positive, got $keyRange")
    val shards = math.max(1L,
      math.ceil(math.sqrt(n.toDouble / math.max(1L, strata))).toLong)
    math.max(1L, keyRange / shards)
  }

  /** [[startOffsets]] with the span derived from the data itself: ONE
    * cheap aggregate computes (n, strata, key range) and picks
    * [[balancedSpan]] — the form call sites should reach for, so the
    * shard count scales with the corpus instead of freezing at
    * whatever constant was right at authoring time. `start_offset` is
    * span-invariant, so swapping a fixed span for this changes no
    * results.
    */
  def startOffsetsAuto(df: DataFrame, stratum: String, order: String,
                       weight: String): DataFrame = {
    val r = df.agg(
      count(lit(1)).as("n"),
      countDistinct(col(stratum)).as("s"),
      min(col(order).cast("long")).as("lo"),
      max(col(order).cast("long")).as("hi")).head()
    if (r.getLong(0) == 0L) startOffsets(df, stratum, order, weight, 1L)
    else {
      val range = math.max(1L, r.getLong(3) - r.getLong(2) + 1L)
      startOffsets(df, stratum, order, weight,
        balancedSpan(r.getLong(0), range, r.getLong(1)))
    }
  }

  /** The one-task-per-stratum window layout — the plan [[startOffsets]]
    * exists to avoid. Kept as the differential-testing reference.
    */
  def startOffsetsNaive(df: DataFrame, stratum: String, order: String,
                        weight: String): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(order)
    df.withColumn("start_offset",
      sum(col(weight).cast("long")).over(w) - col(weight).cast("long"))
  }

  /** Offset packing: [[startOffsets]] plus
    * `seq_id = start_offset div budget`.
    */
  def packByOffset(df: DataFrame, stratum: String, order: String,
                   weight: String, budget: Long,
                   shardSpan: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    startOffsets(df, stratum, order, weight, shardSpan)
      .withColumn("seq_id", floor(col("start_offset") / lit(budget)).cast("long"))
  }

  /** [[packByOffset]] with the data-derived [[balancedSpan]] —
    * `seq_id` is span-invariant like `start_offset`.
    */
  def packByOffsetAuto(df: DataFrame, stratum: String, order: String,
                       weight: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    startOffsetsAuto(df, stratum, order, weight)
      .withColumn("seq_id", floor(col("start_offset") / lit(budget)).cast("long"))
  }

  /** Greedy first-fit-with-reset packing within (stratum, shard) groups:
    * rows are taken in `order`; a row whose weight would push the open
    * sequence past `budget` closes it (an over-budget SINGLE row still
    * gets its own sequence). Emits one row per input row with columns
    * (stratum, shard, order, weight, seq) where `seq` counts sequences
    * within the (stratum, shard) group.
    *
    * The fold is a pure Catalyst `aggregate` higher-order function over
    * a `sort_array(collect_list(...))` group buffer — no UDFs, and group
    * state is bounded by shardSpan rows, so the plan is a single
    * hash-aggregate shuffle regardless of corpus size.
    */
  def packGreedyShards(df: DataFrame, stratum: String, order: String,
                       weight: String, budget: Long,
                       shardSpan: Long): DataFrame = {
    require(budget > 0 && shardSpan > 0,
      s"budget and shardSpan must be positive, got $budget, $shardSpan")
    val grouped = df
      .withColumn("__shard", floor(col(order) / lit(shardSpan)).cast("long"))
      .groupBy(stratum, "__shard")
      .agg(sort_array(collect_list(struct(
        col(order).cast("long").as("o"),
        col(weight).cast("long").as("w")))).as("__docs"))
    val zero = struct(
      lit(0L).as("seq"), lit(0L).as("running"),
      array().cast("array<struct<o:bigint,w:bigint,seq:bigint>>").as("out"))
    val folded = (st: Column, x: Column) => {
      val overflow = st.getField("running") > lit(0L) &&
        st.getField("running") + x.getField("w") > lit(budget)
      val seq = when(overflow, st.getField("seq") + 1L)
        .otherwise(st.getField("seq"))
      val running = when(overflow, x.getField("w"))
        .otherwise(st.getField("running") + x.getField("w"))
      struct(seq.as("seq"), running.as("running"),
        concat(st.getField("out"), array(struct(
          x.getField("o").as("o"), x.getField("w").as("w"),
          seq.as("seq")))).as("out"))
    }
    grouped
      .select(col(stratum), col("__shard").as("shard"),
        explode(aggregate(col("__docs"), zero, folded,
          st => st.getField("out"))).as("p"))
      .select(col(stratum), col("shard"),
        col("p.o").as(order), col("p.w").as(weight), col("p.seq").as("seq"))
  }
}
