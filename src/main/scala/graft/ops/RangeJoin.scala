package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment ("range") join.
  *
  * The reference hand-rolls this twice with sorted arrays + binary search:
  * gene-in-QTL containment (`search/qtl_adder.js:41-68`) and synteny-block
  * containment (`search/dump_homologs.js:206-243`). A naive Catalyst plan
  * for `p.x BETWEEN i.lo AND i.hi` is a BroadcastNestedLoopJoin — O(n*m)
  * and a cliff at scale. We instead bucket both sides into fixed-width
  * bins and equi-join on the bin id, keeping the exact predicate as a
  * post-filter. The equi-key lets Catalyst pick a shuffled or broadcast
  * HASH join, which partitions correctly and survives a 100x scale-up:
  * cost becomes O(n + m * avg_bins_per_interval) with a shuffle on the
  * bin key instead of a cartesian product.
  *
  * Each point owns exactly one bin, so a (point, interval) pair can match
  * in at most one bin — no post-join dedup is needed.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `points(pointCol)` lies in
    * `[intervals(startCol), intervals(endCol)]` (inclusive). All three
    * columns must be integral (LongType-compatible); callers convert
    * timestamps to epoch micros first. `extraKeys` optionally adds
    * equi-join keys (column name present on both sides), mirroring the
    * reference's per-(map, region) interval sets.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = "__graft_bin"
    val binnedIntervals = intervals.withColumn(
      bin,
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val binnedPoints =
      points.withColumn(bin, floor(col(pointCol) / binWidth).cast("long"))
    binnedPoints
      .join(binnedIntervals, Seq(bin) ++ extraKeys)
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(bin)
  }

  /** Keyed variant where the equi-keys alone already bound the match set
    * (e.g. per-user windows): a plain equi-join + predicate, no binning
    * needed because the key is selective. Catalyst plans a hash join on
    * `keys` and the predicate stays a cheap post-filter.
    */
  def pointInIntervalKeyed(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keys: Seq[String]): DataFrame =
    points
      .join(intervals, keys)
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
}
