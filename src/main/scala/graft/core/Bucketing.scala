package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed managed tables — the co-located-join layout for the
  * engine's big recurring joins (genes⋈homolog-pairs, docs⋈shingles at
  * corpus scale): both sides bucketed by the join key into the same
  * bucket count join WITHOUT a shuffle (SortMergeJoin reads bucket i
  * against bucket i directly). On a 100 TB table this converts every
  * repeated key-join from a full-network shuffle into a local merge —
  * the Spark analog of the reference's persistent MongoDB key indexes.
  */
object Bucketing {

  /** Persist `df` as a managed table bucketed (and sorted) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** True when the physical plan of `df` contains no SHUFFLE exchange
    * (broadcast exchanges move no fact data and don't count) — the
    * assertion that a bucketed join is actually co-located.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.linesIterator
      .exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
}
