package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in EXACT integer arithmetic — link-style
  * centrality over corpus-derived graphs (the near-dup pair graph,
  * reference/citation edges), the signal Common-Crawl-lineage
  * pipelines use to separate template/boilerplate hubs from organic
  * documents. Two deliberate departures from textbook PageRank, both
  * for engine-grade reproducibility:
  *
  *  - ALL arithmetic is integral: ranks carry `scale` units of mass
  *    per node; one step is
  *    `r'(v) = floor(scale·(100−damp)/100) + Σ_{u→v} floor(r(u)·damp / (100·deg(u)))`
  *    with Long floor division. No floating point ever touches the
  *    state, so the result is bit-identical across engines,
  *    partitionings, and summation orders (integer addition
  *    commutes; float addition does not) — replayable in ANSI SQL by
  *    unrolling the fixed iteration count as chained CTEs.
  *  - A FIXED iteration count, not a convergence test: a pipeline
  *    spec needs the same answer tomorrow; epsilon-convergence on
  *    floats is partitioning-dependent.
  *
  * Scale shape: degrees are attached to the edge table ONCE and the
  * (edges ⋈ deg) frame checkpointed — each iteration is then one
  * keyed join edges⋈ranks on src + one aggregation on dst + one left
  * join back to the node spine: all hash-partitioned by node id, the
  * canonical Pregel-on-DataFrames step. Rank frames are
  * locally checkpointed per round and the superseded round's blocks
  * released immediately ([[Closure]]'s fixpoint lifecycle — without
  * it every round's lineage re-executes and its blocks pin executor
  * memory).
  *
  * Dangling nodes (no out-edges) keep receiving the base mass but
  * contribute nothing — their mass leaks, the standard simplification;
  * with symmetrized similarity edges every connected node has
  * deg ≥ 1, and isolated spine nodes sit at exactly the base.
  */
object PageRank {

  /** Ranks after `iterations` steps: `(node, rank)` for every node in
    * `nodes` (single-column spine; edges may reference only a
    * subset — edges from outside the spine contribute nothing).
    * `scale` is the starting mass per node; the caller must keep
    * `totalNodes · scale · damp` inside Long range — enforced with a
    * count-based require, refusing configurations whose hub
    * accumulation could overflow.
    *
    * The returned frame is an eager local checkpoint (its blocks ARE
    * the result); long-lived sessions can release it after consuming
    * via [[GraftColumnBridge.unpersistLocalCheckpoint]].
    */
  def pageRank(
      nodes: DataFrame,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      scale: Long = 1000000000L,
      damp: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(scale >= 1000, s"scale must be >= 1000, got $scale")
    require(damp >= 1 && damp <= 99, s"damp must be in [1, 99], got $damp")
    val nodeCol = nodes.columns.head
    val spine = nodes.select(col(nodeCol).cast("long").as("node")).distinct()

    // Overflow refusal: a single sink absorbing ALL mass holds at most
    // n·scale; the per-edge product multiplies by damp ≤ 99.
    val n = spine.count()
    require(n == 0 || scale <= Long.MaxValue / math.max(n, 1L) / 100L,
      s"scale=$scale with $n nodes could overflow Long in the " +
        "contribution product — lower scale (mass bound n*scale*100 " +
        "must stay below 2^63)")

    val base = scale * (100L - damp) / 100L
    val deg = edges
      .groupBy(col(srcCol).cast("long").as("src"))
      .agg(count(lit(1)).as("deg"))
    // One shuffle to co-locate degree with edges; frozen so the join
    // is not re-planned every round.
    val edgesDeg = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .join(deg, Seq("src"))
      .localCheckpoint()
    val spineCk = spine.localCheckpoint()
    try {
      var ranks = spineCk.withColumn("rank", lit(scale))
      var prev: Option[DataFrame] = None
      var i = 0
      while (i < iterations) {
        val contribs = edgesDeg
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          // `div`, not `/`: Spark's `/` on longs is DOUBLE division,
          // and rank·damp exceeds 2^53 long before the mass bound —
          // IntegralDivide keeps the arithmetic exact
          .select(col("dst").as("node"),
            expr(s"rank * $damp div (100 * deg)").as("c"))
          .groupBy("node")
          .agg(sum(col("c")).as("m"))
        val next = spineCk
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + coalesce(col("m"), lit(0L))).as("rank"))
          .localCheckpoint()
        prev.foreach(GraftColumnBridge.unpersistLocalCheckpoint)
        prev = Some(ranks)
        ranks = next
        i += 1
      }
      // the final checkpoint stays alive for the caller; only the
      // superseded round is released — the final is registered so the
      // harness's query-boundary drain frees it
      prev.foreach(GraftColumnBridge.unpersistLocalCheckpoint)
      graft.core.StagingScope.register(ranks)
    } finally {
      // every round's checkpoint is eager, so by the time we return
      // the final frame's blocks are independent of these two —
      // release them rather than pinning node- and edge-sized state
      // until driver GC
      GraftColumnBridge.unpersistLocalCheckpoint(edgesDeg)
      GraftColumnBridge.unpersistLocalCheckpoint(spineCk)
    }
  }
}
