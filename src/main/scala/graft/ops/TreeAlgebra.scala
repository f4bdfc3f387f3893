package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed tree algebra: flat (node, parent) rows grouped per tree and
  * folded into per-tree statistics inside `mapGroups` — the Spark
  * restatement of the reference's flat→nested tree assembly and
  * representative selection (`trees/genetree.js:75-80` assembly,
  * `trees/genetree.js:120-246` representative propagation,
  * `search/genetree_adder.js:176-245` leaf-attribute extraction).
  *
  * Each tree is one group: thousands of nodes at most, so the tree walk
  * is executor-local while trees themselves distribute across the
  * cluster — the same partitioning the reference gets from "one tree
  * doc at a time", minus the single-process bottleneck. No GraphX: a
  * tree never spans groups.
  */
object TreeAlgebra {

  /** One flat tree row. `parent` is -1 for the tree root. `score` feeds
    * representative selection (argmax, ties to lowest id — the
    * deterministic re-derivation of the reference's min-(score+distance)
    * propagation).
    */
  case class TreeNode(treeId: Long, id: Long, parent: Long, score: Double)

  /** Per-tree fold result: size, height, and the representative leaf. */
  case class TreeStats(
      tree_id: Long,
      n_nodes: Long,
      max_depth: Long,
      rep_id: Long,
      rep_score: Double)

  /** Group flat rows by tree and fold each tree: assemble the child
    * adjacency, walk from the root computing depths (iterative DFS —
    * recursion-free, so a pathological chain cannot blow the stack),
    * and pick the representative node by (max score, min id).
    */
  def treeStats(nodes: Dataset[TreeNode]): Dataset[TreeStats] = {
    import nodes.sparkSession.implicits._
    nodes
      .groupByKey(_.treeId)
      .mapGroups { (treeId, it) =>
        val ns = it.toArray
        val children = ns.groupBy(_.parent)
        val rootIds = ns.filter(_.parent == -1L).map(_.id)
        var maxDepth = 0L
        val stack = scala.collection.mutable.Stack[(Long, Long)]()
        rootIds.foreach(r => stack.push((r, 0L)))
        while (stack.nonEmpty) {
          val (id, d) = stack.pop()
          if (d > maxDepth) maxDepth = d
          children.getOrElse(id, Array.empty).foreach(c => stack.push((c.id, d + 1)))
        }
        val rep = ns.minBy(n => (-n.score, n.id))
        TreeStats(treeId, ns.length, maxDepth, rep.id, rep.score)
      }
  }

  /** Assign every node of a binary-heap-shaped hierarchy (parent = id/2,
    * root = 1) to the subtree rooted at its ancestor on `level` (ids in
    * [2^level, 2^level+1)), by repeated halving — the id-arithmetic
    * analog of the reference's `taxon_id*1000+offset` invariants
    * (`maps/load_maps_and_taxonomy.js:77-94`). Pure column expressions.
    */
  def heapSubtreeRoot(id: org.apache.spark.sql.Column, level: Int): org.apache.spark.sql.Column = {
    // Exactly one right-shift amount lands id inside [2^level, 2^level+1),
    // so the candidates are disjoint and coalesce picks the one match.
    // Linear expression size — a when(acc).otherwise(...) fold would nest
    // acc twice per step and blow up exponentially.
    val lo = 1L << level
    val hi = (1L << (level + 1)) - 1
    coalesce((0 to 62 - level).map { shifts =>
      val cand = shiftright(id, shifts)
      when(cand >= lo && cand <= hi, cand)
    }: _*).cast("long")
  }

  /** Lowest common ancestor of two root-paths (arrays ordered
    * root→node): the last element of the longest common prefix —
    * `search/domain_architect.js:180-193` re-expressed as higher-order
    * functions (zip_with equality + position of first mismatch).
    */
  def lcaFromPaths(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val eqs = zip_with(a, b, (x, y) => x === y)
    val firstMismatch = array_position(eqs, false)
    val prefixLen = when(firstMismatch === 0, least(size(a), size(b)))
      .otherwise(firstMismatch - 1)
    when(prefixLen > 0, element_at(a, prefixLen.cast("int")))
      .otherwise(lit(null))
  }
}
