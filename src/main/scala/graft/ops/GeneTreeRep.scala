package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** Reference-fidelity gene-tree representative selection — the flagship
  * decorator of the reference's genes pipeline, re-derived as two Spark
  * stages:
  *
  *  1. LEAF SCORING (`trees/genetree.js:136-198`) — a pure per-row
  *     function of the leaf's annotations, expressed as codegen'd column
  *     expressions ([[leafScore]]): curation, description quality
  *     regexes, display-label heuristics, model-species bonus, hosted-
  *     genome penalty. Row-parallel; runs at scan speed on any corpus.
  *  2. IN-TREE PROPAGATION ([[leafAttrs]]) — per tree, the bottom-up
  *     min-(score+distance) DP (`trees/genetree.js:211-233`), the
  *     top-down 0.8·parent override + closest-model (ath) tracking
  *     (`search/genetree_adder.js:139-156`), duplication-subtree
  *     tagging (:157-173), and per-leaf attribute emission (:176-245).
  *     One tree = one `flatMapGroups` group: the single shuffle keys
  *     nodes by tree id, every walk is executor-local over a bounded
  *     (≤ thousands of nodes) tree, and trees distribute freely across
  *     the cluster — the same unit of work the reference processes
  *     one-at-a-time in a single Node process.
  *
  * Faithfulness notes (each pinned by a unit test):
  *  - lower score is better; the propagation climb adds the CHILD's
  *    `distance_to_parent` per hop and replaces only on strictly-less,
  *    so ties keep the first leaf in pre-order (the reference iterates
  *    its leaf index in tree-walk order).
  *  - the reference's `walk` helper ignores the callback's return
  *    value, so `score >= -60 → return false` does NOT prune descent:
  *    it only skips that node's own child overrides; deeper nodes with
  *    good scores still override their children.
  *  - the 0.8 rule is strict `>`: a child at exactly 0.8·parent keeps
  *    its own representative.
  *  - ath (closest-model) reps are assigned only under gated
  *    (score < cutoff) parents, from the child's POST-override rep.
  *  - the reference mutates a shared `lookupValue` when building leaf
  *    docs, leaking one leaf's `duplications` into no-rep siblings
  *    (`search/genetree_adder.js:177-189`) — we emit per-leaf
  *    duplications instead (the obvious intent), sorted ascending.
  */
object GeneTreeRep {

  /** One flat tree row. `parent` = -1 marks the root. `geneId` is null
    * for internal nodes; `score` is only meaningful on leaves (feed
    * [[leafScore]]'s output); `dupConf` is the node's
    * duplication_confidence_score (0 when absent).
    */
  case class Node(
      treeId: Long,
      id: Long,
      parent: Long,
      dist: Double,
      taxonId: Long,
      geneId: String,
      score: Double,
      dupConf: Double)

  /** Per-leaf decoration, the reference's `genetreeIdLut` value shape
    * (`search/genetree_adder.js:113-248`): tree identity, the final
    * propagated representative (score + gene id), the model/closest
    * split, and duplication taxa.
    */
  case class LeafAttr(
      tree_id: Long,
      gene_id: String,
      root_taxon_id: Long,
      rep_score: Option[Double],
      model_id: Option[String],
      closest_id: Option[String],
      duplications: Seq[Long])

  /** The reference's scoring constants (`trees/genetree.js:125-130`). */
  val Bad = 100.0
  val Meh = -50.0
  val Good = -100.0
  val Curated = -500.0
  val ModelSpeciesBonus = -25.0

  /** Regex-escape a column value so it can be embedded in a pattern:
    * every non-[A-Za-z0-9_] char gets a leading backslash. Gene ids with
    * metacharacters (`.`, `+`, `(`) would otherwise mis-match or make
    * `regexp_replace` throw at runtime.
    */
  def regexQuote(c: Column): Column =
    regexp_replace(c, lit("([^A-Za-z0-9_])"), lit("\\\\$1"))

  /** Description cleanup (`trees/genetree.js:147-149`): strip the
    * `[Source:...]` suffix, then any token starting with the gene's own
    * stable id (case-insensitive) — what remains is the information
    * content the quality regexes judge.
    *
    * Two intentional deviations from the reference, which passes the id
    * through a JS string literal where `'\S'` collapses to `'S'` (so its
    * effective pattern is `<id>S*`) and uses first-occurrence-only
    * string `.replace`: we implement the evident intent — a real `\S*`
    * tail — and strip ALL occurrences of the id token.
    */
  def cleanDescription(description: Column, geneId: Column): Column =
    regexp_replace(
      regexp_replace(description, lit("\\s*\\[Source:.*"), lit("")),
      concat(lit("(?i)"), regexQuote(geneId), lit("\\S*")), lit(""))

  /** Leaf representative score (`trees/genetree.js:136-198`), lower is
    * better. Pure codegen'd column expression — the scoring pass is a
    * narrow projection over the leaf table, embarrassingly parallel.
    *
    * @param curated      the gene appears in the curated set
    *                     (`isCurated` LUT in the reference)
    * @param description  raw gene_description (null when absent)
    * @param displayLabel gene_display_label (null when absent)
    * @param geneId       gene_stable_id
    * @param taxonId      leaf taxon
    * @param genomeHosted whether the taxon is a hosted genome
    *                     (`haveGenome` in the reference)
    * @param modelTaxon   the model species taxon (3702 = Arabidopsis)
    */
  def leafScore(
      curated: Column,
      description: Column,
      displayLabel: Column,
      geneId: Column,
      taxonId: Column,
      genomeHosted: Column,
      modelTaxon: Long = 3702L): Column = {
    val desc = cleanDescription(description, geneId)
    val curScore = when(curated, lit(Curated)).otherwise(lit(0.0))
    val descScore = when(description.isNull, lit(0.0)).otherwise(
      lit(Good) + when(
        desc.rlike("(?i)(projected|unknown|uncharacterized|predicted|hypothetical|putative|cDNA)"),
        lit(Bad))
        .when(desc.rlike("(?i)^(expressed)?\\s*protein$"), lit(Bad))
        .when(desc.rlike("^Zm0"), lit(Bad))
        .when(desc === "", lit(Bad))
        .otherwise(lit(0.0)))
    val labelScore = when(displayLabel.isNull, lit(0.0)).otherwise(
      lit(Meh) + when(displayLabel === geneId, -lit(Meh))
        .when(displayLabel.rlike("^POPTRDRAFT"), -lit(Meh))
        .otherwise(lit(0.0)))
    val modelScore = when(taxonId === modelTaxon,
      lit(ModelSpeciesBonus) +
        when(description.isNotNull && desc.rlike("^Putative"), -lit(Bad))
          .otherwise(lit(0.0)))
      .otherwise(lit(0.0))
    // NULL hosted flag (e.g. from a left join against the hosted-genome
    // table) means UNKNOWN taxon, which the reference penalizes exactly
    // like a non-hosted one (`!haveGenome[taxon]` is truthy for
    // undefined) — coalesce to false so NULL takes the penalty too.
    val hostedScore =
      when(!coalesce(genomeHosted, lit(false)), lit(Bad)).otherwise(lit(0.0))
    curScore + descScore + labelScore + modelScore + hostedScore
  }

  /** In-tree propagation + leaf-attribute emission. One row out per
    * leaf. `cutoff` is the reference's `-60` hopelessness gate,
    * `overrideFactor` its `0.8`, `athPattern` the model-species gene-id
    * prefix (`^AT`), `excludeTaxon` the synthetic taxon whose leaves
    * never receive a representative (3702001).
    */
  def leafAttrs(
      nodes: Dataset[Node],
      cutoff: Double = -60.0,
      overrideFactor: Double = 0.8,
      athPattern: String = "^AT",
      excludeTaxon: Long = 3702001L): Dataset[LeafAttr] = {
    import nodes.sparkSession.implicits._
    val athRe = athPattern.r
    // null-safe ath test: internal nodes (and malformed leaves) carry a
    // null geneId; a rep built from one must never NPE the whole task.
    def isAth(gene: String): Boolean =
      gene != null && athRe.findFirstIn(gene).isDefined
    nodes
      .groupByKey(_.treeId)
      .flatMapGroups { (treeId, it) =>
        val ns = it.toArray
        val children: Map[Long, Array[Node]] =
          ns.filter(_.parent != -1L).groupBy(_.parent)
            .view.mapValues(_.sortBy(_.id)).toMap
        val root = ns.find(_.parent == -1L)
          .getOrElse(throw new IllegalArgumentException(s"tree $treeId has no root"))

        // pre-order walk (children ascending by id — the reference gets
        // its order from the SQL's left_index sort; any fixed total
        // order per siblings is equivalent, ours is the node id)
        val preorder = mutable.ArrayBuffer.empty[Node]
        val stack = mutable.Stack(root)
        while (stack.nonEmpty) {
          val n = stack.pop()
          preorder += n
          children.getOrElse(n.id, Array.empty).reverseIterator.foreach(stack.push)
        }
        val leaves = preorder.filter(n => !children.contains(n.id)).toArray

        // bottom-up DP (`trees/genetree.js:211-233`): each node keeps
        // the smallest (leaf score + path distance) over the leaves
        // below it, ties to the FIRST leaf in pre-order — exactly what
        // the reference's per-leaf climb with its strict-improvement
        // break computes (a climb stopped by >= at any node can never
        // win at an ancestor: the blocker's candidate rides the same
        // remaining path with a <= value, and on equality the blocker
        // IS the earlier pre-order leaf). One pass over the reversed
        // pre-order (all descendants follow their node, so the reverse
        // is a valid bottom-up order): O(n) per tree, where the climb
        // was O(leaves x depth) — quadratic on deep caterpillar trees
        // (surfaced by the 10x scale audit).
        case class Rep(leafId: Long, gene: String, score: Double, pre: Int)
        val preIdx = preorder.iterator.zipWithIndex.map {
          case (n, i) => n.id -> i
        }.toMap
        val bu = mutable.HashMap.empty[Long, Rep]
        preorder.reverseIterator.foreach { n =>
          val kids = children.getOrElse(n.id, Array.empty)
          if (kids.isEmpty) bu(n.id) = Rep(n.id, n.geneId, n.score, preIdx(n.id))
          else {
            var best: Rep = null
            kids.foreach { c =>
              val cb = bu(c.id)
              val s = cb.score + c.dist
              if (best == null || s < best.score ||
                  (s == best.score && cb.pre < best.pre))
                best = Rep(cb.leafId, cb.gene, s, cb.pre)
            }
            bu(n.id) = best
          }
        }

        // top-down override + ath tracking (`search/genetree_adder.js:
        // 139-156`): pre-order again, so a node's FINAL rep (possibly
        // inherited from its parent) is what its children compare to.
        val fin = mutable.HashMap.empty[Long, Rep]
        val ath = mutable.HashMap.empty[Long, Rep]
        val rootRep = bu(root.id)
        fin(root.id) = rootRep
        if (isAth(rootRep.gene)) ath(root.id) = rootRep
        preorder.foreach { node =>
          val nodeRep = fin(node.id)
          val gated = nodeRep.score < cutoff
          children.getOrElse(node.id, Array.empty).foreach { child =>
            val own = bu(child.id)
            val rep =
              if (gated && own.score > overrideFactor * nodeRep.score) nodeRep
              else own
            fin(child.id) = rep
            if (gated) {
              if (isAth(rep.gene)) ath(child.id) = rep
              else ath.get(node.id).foreach(a => ath(child.id) = a)
            }
          }
        }

        // duplication tagging (`search/genetree_adder.js:157-173`): a
        // leaf collects the taxa of its ancestors-or-self whose
        // duplication confidence exceeds 0.5. One DFS with a path
        // accumulator instead of one walk per duplication node —
        // EXPLICIT stack: a caterpillar tree's depth is O(n), and a
        // recursive walk overflows the task thread's stack at a few
        // thousand nodes (surfaced by the 10× scale audit; the path
        // list is shared structurally, so memory stays O(depth)).
        val dups = mutable.HashMap.empty[Long, Seq[Long]]
        val dupStack = mutable.Stack((root, List.empty[Long]))
        while (dupStack.nonEmpty) {
          val (n, acc) = dupStack.pop()
          val acc2 = if (n.dupConf > 0.5) n.taxonId :: acc else acc
          val kids = children.getOrElse(n.id, Array.empty)
          if (kids.isEmpty) dups(n.id) = acc2.distinct.sorted
          else kids.reverseIterator.foreach(k => dupStack.push((k, acc2)))
        }

        // leaf emission (`search/genetree_adder.js:176-245`)
        leaves.iterator.map { leaf =>
          val rep = fin(leaf.id)
          val leafDups = dups.getOrElse(leaf.id, Nil)
          if (rep.score >= cutoff || leaf.taxonId == excludeTaxon)
            LeafAttr(treeId, leaf.geneId, root.taxonId, None, None, None, leafDups)
          else if (rep.leafId == leaf.id) {
            // self-representative: the model slot carries the closest
            // model-species rep when one exists, else the leaf itself
            // (Option-wrapped: a null geneId must encode as None, not
            // Some(null), which the Catalyst serializer rejects)
            val model = ath.get(leaf.id).map(_.gene).orElse(Option(leaf.geneId))
            LeafAttr(treeId, leaf.geneId, root.taxonId, Some(rep.score),
              model, None, leafDups)
          } else {
            val model = ath.get(leaf.id).collect {
              case a if a.gene != rep.gene => a.gene
            }
            LeafAttr(treeId, leaf.geneId, root.taxonId, Some(rep.score),
              model, Option(rep.gene), leafDups)
          }
        }
      }
  }
}
