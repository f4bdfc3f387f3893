package graft

import org.apache.spark.sql.functions._
import graft.ops.GeneTreeRep
import graft.ops.GeneTreeRep.{LeafAttr, Node}

/** Pins every faithfulness note documented in [[graft.ops.GeneTreeRep]]
  * on hand-built trees: tie keeps the first pre-order leaf, the −60 gate
  * is strict and does NOT prune descent, the 0.8·parent override is
  * strict `>`, ath (closest-model) reps exist only under gated parents,
  * duplication tagging collects ancestors-or-self above 0.5 confidence,
  * the exclude-taxon leaves never receive a representative, and null
  * gene ids don't kill the task.
  */
class GeneTreeRepSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Node]): Map[String, LeafAttr] =
    GeneTreeRep.leafAttrs(nodes.toDS())
      .collect()
      .map(a => Option(a.gene_id).getOrElse("<null>") -> a)
      .toMap

  private def node(
      tree: Long, id: Long, parent: Long, dist: Double,
      taxon: Long = 4577L, gene: String = null,
      score: Double = 0.0, dupConf: Double = 0.0): Node =
    Node(tree, id, parent, dist, taxon, gene, score, dupConf)

  test("DP tie keeps the first pre-order leaf") {
    // A (id 2) and B (id 3) both reach the root at −79; A walks first.
    // C's own score is bad enough to take the root's rep, exposing it.
    val out = run(Seq(
      node(1, 1, -1, 0.0),
      node(1, 2, 1, 1.0, gene = "A", score = -80),
      node(1, 3, 1, 1.0, gene = "B", score = -80),
      node(1, 4, 1, 30.0, gene = "C", score = -20)))
    assert(out("C").closest_id === Some("A"))
    assert(out("C").rep_score === Some(-79.0))
    // A and B keep themselves (own scores not worse than 0.8·parent)
    assert(out("A").closest_id === None)
    assert(out("B").closest_id === None)
  }

  test("cutoff boundary: rep at exactly −60 gets no representative, gate is strict") {
    // single-leaf trees probe the emission cutoff exactly
    val out = run(Seq(
      node(1, 1, -1, 0.0, gene = "X", score = -60.0),
      node(2, 1, -1, 0.0, gene = "Y", score = -60.25)))
    assert(out("X").rep_score === None)
    assert(out("Y").rep_score === Some(-60.25))
    assert(out("Y").model_id === Some("Y")) // self rep, no ath → itself

    // a parent whose rep is exactly −60 is NOT gated: no override, no ath
    val out2 = run(Seq(
      node(1, 1, -1, 0.0),
      node(1, 2, 1, 0.0, gene = "D", score = -60),
      node(1, 3, 1, 0.0, gene = "E", score = -59)))
    assert(out2("D").rep_score === None)
    assert(out2("E").rep_score === None)
  }

  test("an ungated node does not prune descent: deeper gated nodes still override") {
    // root rep is −49.5 (not gated) but internal X holds −99.5 (gated):
    // X's child G must still inherit X's rep.
    val out = run(Seq(
      node(1, 1, -1, 0.0),
      node(1, 2, 1, 0.0, gene = "H", score = 0),
      node(1, 3, 1, 50.0), // internal X
      node(1, 4, 3, 0.5, gene = "F", score = -100),
      node(1, 5, 3, 0.25, gene = "G", score = -70)))
    assert(out("G").closest_id === Some("F"))
    assert(out("G").rep_score === Some(-99.5))
    assert(out("F").closest_id === None) // self-representative
    assert(out("H").rep_score === None)  // rep 0 ≥ −60
  }

  test("0.8 override is strict >: a child at exactly 0.8·parent keeps its own rep") {
    // parent rep −100 (gated); child at exactly −80 (= 0.8·−100) keeps
    // its own; child at −79.75 (> −80) inherits.
    val out = run(Seq(
      node(1, 1, -1, 0.0),
      node(1, 2, 1, 0.0, gene = "R", score = -100),
      node(1, 3, 1, 0.0, gene = "S", score = -80),
      node(1, 4, 1, 0.0, gene = "T", score = -79.75)))
    assert(out("S").closest_id === None)
    assert(out("S").rep_score === Some(-80.0))
    assert(out("T").closest_id === Some("R"))
    assert(out("T").rep_score === Some(-100.0))
  }

  test("ath reps are assigned only under gated parents, from the post-override rep") {
    // gated chain: root rep AT1G1; X's subtree rep is GP (non-model) so
    // ath inherits down to P and Q; Q is overridden to P and keeps the
    // inherited model id.
    val out = run(Seq(
      node(1, 1, -1, 0.0),
      node(1, 2, 1, 0.25, gene = "AT1G1", score = -90),
      node(1, 3, 1, 0.25), // internal X
      node(1, 4, 3, 0.25, gene = "GP", score = -85),
      node(1, 5, 3, 0.25, gene = "GQ", score = -65)))
    assert(out("AT1G1").model_id === Some("AT1G1"))
    assert(out("GP").model_id === Some("AT1G1"))
    assert(out("GP").closest_id === None)
    assert(out("GQ").model_id === Some("AT1G1"))
    assert(out("GQ").closest_id === Some("GP"))

    // under a NON-gated root, no ath is tracked even when a model leaf
    // exists in the tree: the self-rep leaf falls back to itself.
    val out2 = run(Seq(
      node(2, 1, -1, 0.0),
      node(2, 2, 1, 100.0, gene = "G1", score = -70),
      node(2, 3, 1, 0.5, gene = "AT9", score = 0)))
    assert(out2("G1").rep_score === Some(-70.0))
    assert(out2("G1").model_id === Some("G1")) // not AT9
  }

  test("duplication tagging: ancestors-or-self above 0.5, distinct sorted") {
    val out = run(Seq(
      node(1, 1, -1, 0.0, taxon = 100, dupConf = 0.9),
      node(1, 2, 1, 0.0, taxon = 200, dupConf = 0.4), // internal, below threshold
      node(1, 3, 2, 0.0, taxon = 300, dupConf = 0.6), // internal, above
      node(1, 4, 3, 0.0, taxon = 400, gene = "L1", score = 0, dupConf = 0.55),
      node(1, 5, 2, 0.0, taxon = 500, gene = "L2", score = 0)))
    assert(out("L1").duplications === Seq(100L, 300L, 400L))
    assert(out("L2").duplications === Seq(100L))
  }

  test("exclude-taxon leaves never receive a representative") {
    val out = run(Seq(
      node(1, 1, -1, 0.0),
      node(1, 2, 1, 0.0, taxon = 3702001L, gene = "EX", score = -90),
      node(1, 3, 1, 0.0, gene = "OK", score = -90)))
    assert(out("EX").rep_score === None)
    assert(out("OK").rep_score === Some(-90.0))
  }

  test("null gene ids do not NPE the group task") {
    val out = run(Seq(
      node(1, 1, -1, 0.0),
      node(1, 2, 1, 0.0, gene = null, score = -90),
      node(1, 3, 1, 0.0, gene = "AT2", score = -85)))
    assert(out("<null>").rep_score === Some(-90.0))
    assert(out("AT2").rep_score === Some(-85.0))
  }

  test("leafScore: null genomeHosted is penalized like non-hosted") {
    val df = Seq(
      ("g1", Some(true)),
      ("g2", Some(false)),
      ("g3", Option.empty[Boolean]))
      .toDF("gene", "hosted")
      .select(col("gene"), GeneTreeRep.leafScore(
        curated = lit(false), description = lit(null).cast("string"),
        displayLabel = lit(null).cast("string"), geneId = col("gene"),
        taxonId = lit(9L), genomeHosted = col("hosted")).as("score"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(df("g1") === 0.0)
    assert(df("g2") === GeneTreeRep.Bad)
    assert(df("g3") === GeneTreeRep.Bad)
  }

  test("cleanDescription survives regex metacharacters in the gene id") {
    val out = Seq(("G(1)+x kinase [Source:Foo]", "G(1)+"))
      .toDF("descr", "gene")
      .select(GeneTreeRep.cleanDescription(col("descr"), col("gene")).as("c"))
      .collect().head.getString(0)
    assert(out === " kinase")
  }
}
