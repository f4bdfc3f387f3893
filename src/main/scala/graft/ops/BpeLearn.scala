package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.functions._

import graft.functions.{BpeMerge, TextAnalytics}

/** BPE merge-pair LEARNING (Sennrich et al., ACL 2016) — learn the
  * merge TABLE from a corpus: `rounds` iterations of count-all-
  * adjacent-pairs → pick the most frequent (ties pinned: count desc,
  * then pair ascending) → re-pair every sequence with
  * [[graft.functions.BpeMerge]]. The APPLY side of BPE is already
  * covered (q52 pre-tokenizes with the GPT-2-style regex); this is
  * the TRAINING side — the artifact a tokenizer ships is exactly the
  * ordered merge list this returns.
  *
  * Symbols here are whatever the caller's sequences contain — the
  * gate runs word tokens (engine and oracle tokenize identically);
  * subword learning feeds per-word character sequences through the
  * same kernel.
  *
  * Scale shape, per round: ONE distributed aggregation (explode
  * adjacent pairs → groupBy(pair).count — map-side partials bound the
  * shuffle by the distinct-pair vocabulary, never corpus positions)
  * with a 1-ROW bounded collect for the argmax, then a narrow O(n)
  * re-pair map. Rounds are sequential by nature (round r+1's counts
  * depend on round r's merge — this is the algorithm, not a plan
  * artifact). Each round's sequences are EAGERLY checkpointed and the
  * previous round's checkpoint released (the [[Closure]] iteration
  * lifecycle), so round r costs one corpus pass over round r−1's
  * materialized state — O(rounds · corpus) total, not the
  * O(rounds² · corpus) a growing lazy lineage would re-evaluate, and
  * never more than two round-states pinned at once.
  *
  * Returns the merge table `(round, lft, rgt, pair_count)` — at most
  * `rounds` rows (fewer if the corpus runs out of adjacent pairs).
  */
object BpeLearn {

  /** Bounds the sequential driver loop (and the total checkpoint
    * traffic); real subword vocabularies train tens of thousands of
    * merges, but each round is a full corpus aggregation — a caller
    * wanting 30k merges on 100 TB batches corpora per round, which is
    * a different (sampled) algorithm, not a bigger loop.
    */
  val MaxRounds = 64

  def learnMerges(
      docs: DataFrame,
      textCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= MaxRounds,
      s"rounds must be in [1, $MaxRounds], got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._

    // sequences with < 2 symbols can never contribute a pair — drop
    // them up front and re-drop as merges shrink sequences (pure
    // optimization: their pair contribution is zero either way)
    // eager like every later round's state: round 1's count pass AND
    // its merge pass both read this — un-checkpointed, the corpus
    // tokenize ran twice before round 2 even started
    var seqs = docs
      .select(TextAnalytics.tokens(col(textCol)).as("syms"))
      .where(size(col("syms")) >= 2)
      .localCheckpoint()
    var pinned: Option[DataFrame] = Some(seqs)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val top = seqs
        .select(explode(expr(
          """transform(slice(syms, 1, size(syms) - 1),
               (s, i) -> named_struct('lft', s, 'rgt', syms[i + 1]))""")).as("p"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("lft"), col("rgt"))
        .head(1) // bounded collect: exactly one row per round
      if (top.isEmpty) dry = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, c))
        if (r < rounds) {
          val next = seqs
            .select(BpeMerge.mergePair(col("syms"), lit(a), lit(b)).as("syms"))
            .where(size(col("syms")) >= 2)
            .localCheckpoint() // eager: materialize round r+1's input once
          pinned.foreach(GraftColumnBridge.unpersistLocalCheckpoint)
          pinned = Some(next)
          seqs = next
        }
        r += 1
      }
    }
    pinned.foreach(GraftColumnBridge.unpersistLocalCheckpoint)
    merges.toSeq.toDF("round", "lft", "rgt", "pair_count")
  }
}
