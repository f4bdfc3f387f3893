package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every row is
  * assigned a split (train/val/test/...) by a STABLE content-independent
  * hash of its id, so the assignment is reproducible across runs,
  * engines, partitionings and re-shuffles — the property that makes
  * splits auditable and prevents leakage when upstream stages are
  * re-run. Per-row expression, no shuffle, no RNG state: `rand()`-based
  * splitting is none of those things (seed + partitioning dependent).
  *
  * The hash is the first 8 hex chars of md5(id) — engine-portable
  * (any SQL engine can replay it), uniform, and independent of Spark's
  * internal hash functions.
  */
object Splits {

  /** Split-label column for `id`: `cuts` are (label, upper-percent)
    * pairs with ascending exclusive upper bounds over [0, 100); rows
    * hashing at or past the last bound get `rest`. E.g.
    * `splitLabel(col("doc_id"), Seq("train" -> 90, "val" -> 95), "test")`
    * is a 90/5/5 split.
    */
  def splitLabel(id: Column, cuts: Seq[(String, Int)], rest: String): Column = {
    require(cuts.nonEmpty && cuts.map(_._2) == cuts.map(_._2).sorted,
      "cuts must be ascending (label, upper-percent) pairs")
    val bucket = conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    cuts.foldRight(lit(rest): Column) { case ((label, upper), rhs) =>
      when(bucket < upper, lit(label)).otherwise(rhs)
    }
  }
}
