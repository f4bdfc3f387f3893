package graft

import org.apache.spark.sql.Row
import graft.ops.FosterGraft

/** Pins the foster-grafting rules (`ontologies/filter_taxonomy2.js:
  * 141-199`): sibling derivation (hundreds digit must be 0), the
  * clone-the-parent graft shape, the lineage gene-count rollup, and
  * the drop of unresolvable ids.
  */
class FosterGraftSpec extends SparkSpec {
  import spark.implicits._

  //      1
  //     / \
  //    2   3
  //   / \
  //  4   5
  private val tax = Seq(
    (1L, 0L, Seq(1L), "root"),
    (2L, 1L, Seq(1L, 2L), "cladeA"),
    (3L, 1L, Seq(1L, 3L), "cladeB"),
    (4L, 2L, Seq(1L, 2L, 4L), "species4"),
    (5L, 2L, Seq(1L, 2L, 5L), "species5"))
    .toDF("id", "parent", "ancestors", "name")

  private def run(desired: Seq[(Long, String, Long)]): Map[Long, Row] =
    FosterGraft.graft(tax, desired.toDF("id", "display_name", "n_genes"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

  test("present ids pass through with their taxonomy node") {
    val out = run(Seq((4L, "genome4", 10L)))
    val r = out(4L)
    assert(r.getAs[Long]("is_a") === 2L)
    assert(r.getAs[Seq[Long]]("ancestors") === Seq(1L, 2L, 4L))
    assert(r.getAs[String]("name") === "species4")
    assert(!r.getAs[Boolean]("fostered"))
    assert(r.getAs[Long]("num_genes") === 10L)
  }

  test("missing genome id grafts under its sibling's parent with cloned lineage") {
    // 4001: hundreds digit 0 → sibling 4 → foster parent 2
    val out = run(Seq((4001L, "genome4001", 7L)))
    val r = out(4001L)
    assert(r.getAs[Long]("is_a") === 2L)
    assert(r.getAs[Seq[Long]]("ancestors") === Seq(1L, 2L, 4001L))
    assert(r.getAs[String]("name") === "genome4001")
    assert(r.getAs[Boolean]("fostered"))
    assert(r.getAs[Long]("num_genes") === 7L)
  }

  test("foster gene counts roll up into the parent lineage, not the child itself") {
    val out = run(Seq(
      (1L, "g1", 100L), (2L, "g2", 20L), (3L, "g3", 30L),
      (4001L, "genome4001", 7L), (5002L, "genome5002", 3L)))
    // both fostered genomes hang under 2 → lineage {1, 2} gains 7 + 3
    assert(out(1L).getAs[Long]("num_genes") === 110L)
    assert(out(2L).getAs[Long]("num_genes") === 30L)
    assert(out(3L).getAs[Long]("num_genes") === 30L)
    assert(out(4001L).getAs[Long]("num_genes") === 7L)
    assert(out(5002L).getAs[Long]("num_genes") === 3L)
  }

  test("unresolvable ids are dropped: non-zero hundreds digit or unknown sibling") {
    val out = run(Seq(
      (4101L, "nope", 1L), // hundreds digit 1 → regex no-match
      (9001L, "nope", 1L), // sibling 9 not in taxonomy
      (4001L, "ok", 1L)))
    assert(out.keySet === Set(4001L))
  }
}
