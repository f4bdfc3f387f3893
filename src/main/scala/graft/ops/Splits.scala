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
  /** Deterministic Bernoulli keep-decision for `id` at `rateBp` basis
    * points (rateBp/10000 of rows kept) — the per-stratum downsampling
    * a data-mixing stage runs ("keep 25% of lang=es"). Integer basis
    * points, not a double fraction: `rate * 10000` truncates floats
    * (0.0007 → 6.99…bp) and the decision must replay exactly in any
    * engine.
    *
    * The hash is SALTED (`md5(id || ":" || salt)`), which makes the
    * decision independent of [[splitLabel]]'s bucketing — with the
    * UNSALTED bucket, sampling at ≤90% would keep only train-split
    * rows (both decisions would read the same bucket), silently
    * emptying val/test. Independence is spec-pinned per split.
    */
  def sampleKeep(id: Column, rateBp: Column, salt: String = "mix"): Column = {
    val bucket = conv(
      substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % 10000
    bucket < rateBp.cast("long")
  }

  def splitLabel(id: Column, cuts: Seq[(String, Int)], rest: String): Column = {
    val uppers = cuts.map(_._2)
    // strict bounds: equal uppers would ship an empty split silently
    // (when(b < u, a).otherwise(when(b < u, b)) never reaches b), an
    // upper <= 0 an empty first split, and an upper >= 100 an
    // unreachable `rest`
    require(cuts.nonEmpty &&
        uppers.zip(uppers.tail).forall { case (a, b) => a < b } &&
        uppers.head > 0 && uppers.last < 100,
      s"cuts must be strictly ascending upper-percent bounds in (0, 100), got $uppers")
    val bucket = conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    cuts.foldRight(lit(rest): Column) { case ((label, upper), rhs) =>
      when(bucket < upper, lit(label)).otherwise(rhs)
    }
  }
}
