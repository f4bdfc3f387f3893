package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot DIFF — the version audit an evolving training set
  * needs before anyone retrains on it: which documents were added,
  * removed, or changed between two corpus versions, and a digest that
  * pins WHAT changed. Curated corpora ship in versions (crawl
  * refreshes, re-filtered releases); the diff is the artifact that
  * makes a version bump reviewable and incremental downstream
  * processing possible (re-screen only `added ∪ changed` instead of
  * the full corpus).
  *
  * Plan: one full outer join on the id — the canonical two-sided
  * reconciliation, hash-partitioned on the key, no broadcast of
  * either corpus — comparing md5 digests of the projected content
  * columns (null-safe: a null content column digests as a marker, so
  * null→value transitions classify as changed, not unchanged).
  * Output one row per id in either version:
  * `(id, status ∈ added|removed|changed|unchanged, old_md5, new_md5)`
  * — statuses are emitted rather than counts so downstream stages can
  * semi-join the `added`/`changed` slice directly.
  */
object SnapshotDiff {

  def diff(
      oldV: DataFrame,
      newV: DataFrame,
      idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "at least one content column required")
    // \u0001 separates columns and \u0002 marks SQL NULL — control
    // bytes no text column plausibly contains, so "ab"+"c" vs "a"+"bc"
    // and null-vs-"null" cannot collide into one digest
    def digested(df: DataFrame, out: String) = df.select(
      col(idCol).as("id"),
      md5(concat_ws("\u0001",
        contentCols.map(c => coalesce(col(c).cast("string"),
          lit("\u0002"))): _*)).as(out))
    digested(oldV, "old_md5")
      .join(digested(newV, "new_md5"), Seq("id"), "full_outer")
      .select(
        col("id"),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_md5"),
        col("new_md5"))
  }
}
