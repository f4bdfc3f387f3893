package graft

import org.apache.spark.sql.functions._

import graft.ops.SnapshotDiff

/** Snapshot diff: classification correctness on crafted versions,
  * null/ambiguity safety of the digest, layout determinism.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def statuses(
      oldV: Seq[(Long, String, String)],
      newV: Seq[(Long, String, String)]): Map[Long, String] =
    SnapshotDiff.diff(
      oldV.toDF("id", "text", "lang"), newV.toDF("id", "text", "lang"),
      "id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("added / removed / changed / unchanged classify correctly") {
    val got = statuses(
      oldV = Seq((1L, "same", "en"), (2L, "gone", "en"), (3L, "was", "en")),
      newV = Seq((1L, "same", "en"), (3L, "now", "en"), (4L, "new", "en")))
    assert(got === Map(1L -> "unchanged", 2L -> "removed",
      3L -> "changed", 4L -> "added"))
  }

  test("null content is distinct from empty, from the string 'null', " +
      "and equal to itself") {
    assert(statuses(Seq((1L, null, "en")), Seq((1L, "", "en")))(1L)
      === "changed")
    assert(statuses(Seq((1L, null, "en")), Seq((1L, "null", "en")))(1L)
      === "changed")
    assert(statuses(Seq((1L, null, "en")), Seq((1L, null, "en")))(1L)
      === "unchanged")
  }

  test("a column-boundary shift is a change (ab|c vs a|bc)") {
    val got = statuses(
      oldV = Seq((1L, "ab", "c")), newV = Seq((1L, "a", "bc")))
    assert(got(1L) === "changed")
  }

  test("incremental screen (carry unchanged + re-screen delta) equals " +
      "the full re-screen — the q100 equivalence, unit-scale") {
    import graft.ops.Decontaminate
    val bench = Seq((100L, "the quick brown fox jumps over it"))
      .toDF("id", "text")
    val v1 = Seq(
      (1L, "a quick brown fox jumps here"), // will change in v2
      (2L, "totally unrelated words here today"),
      (3L, "the quick brown fox jumps over it")) // removed in v2
      .toDF("id", "text")
    val v2 = Seq(
      (1L, "a quick brown fox jumps ELSEWHERE"),
      (2L, "totally unrelated words here today"),
      (4L, "fox jumps over it yes")) // added
      .toDF("id", "text")
    val full = Decontaminate.ngramOverlap(v2, bench, "text", "id", 3)
      .collect().map(_.toSeq).toSet
    val delta = SnapshotDiff.diff(v1, v2, "id", Seq("text"))
    val carried = Decontaminate.ngramOverlap(v1, bench, "text", "id", 3)
      .join(delta.where(col("status") === "unchanged").select("id"),
        Seq("id"), "left_semi")
    val rescreen = Decontaminate.ngramOverlap(
      v2.join(delta.where(col("status").isin("added", "changed"))
        .select("id"), Seq("id"), "left_semi"),
      bench, "text", "id", 3)
    val incremental = carried.unionByName(rescreen)
      .collect().map(_.toSeq).toSet
    assert(incremental === full)
  }

  test("deterministic across partitionings") {
    val oldV = (0L until 500L).map(i => (i, s"t$i", "en"))
    val newV = (100L until 600L).map(i =>
      (i, if (i % 3 == 0) s"t$i!" else s"t$i", "en"))
    def run(p: Int) = SnapshotDiff.diff(
      oldV.toDF("id", "text", "lang").repartition(p),
      newV.toDF("id", "text", "lang").repartition(p),
      "id", Seq("text", "lang"))
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r = run(1)
    assert(r === run(6))
    assert(r("added") === 100L && r("removed") === 100L)
    assert(r("changed") + r("unchanged") === 400L)
  }
}
