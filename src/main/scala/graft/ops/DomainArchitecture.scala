package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.Dataset

/** Domain-architecture clustering — the reference's per-protein sweep
  * that merges overlapping InterPro features into architecture clusters
  * and names each cluster by the LCA of its members
  * (`search/domain_architect.js:119-203`), restated for Spark:
  *
  *  - one (gene, hierarchy-root) group = one sweep. The single shuffle
  *    keys features by (gene, root); each sweep is executor-local over a
  *    bounded (tens of features) group, so proteins distribute freely
  *    across the cluster while the order-dependent merge stays exact.
  *  - LCA is a pluggable fold over member ids, so the ontology can be a
  *    broadcast path LUT ([[pathSetLca]], the reference's
  *    `pathFromRoot` walk) or pure arithmetic ([[heapSetLca]] for
  *    binary-heap-labelled hierarchies — no LUT at all).
  *
  * Faithfulness notes (each pinned by a unit test in
  * DomainArchitectureSpec):
  *  - features sort by (start, end) and the sweep merges an incoming
  *    feature iff it starts before the cluster end AND (it is strictly
  *    contained — `end < clust.end` merges unconditionally, no 20% test,
  *    cluster end unchanged — or the overlap is ≥ 20% of the INCOMING
  *    feature's length OR ≥ 20% of the CURRENT cluster span)
  *    (`domain_architect.js:140-152`). The ≥ is inclusive: exactly 20%
  *    merges.
  *  - a feature that overlaps but fails the 20% rule SEEDS A NEW
  *    cluster (it does not extend the old one).
  *  - the reference's trailing `if (!done) clusters.push(clust)`
  *    (`domain_architect.js:165`) drops the final cluster of a group
  *    when its last feature seeded it: equivalently, the LAST cluster is
  *    dropped iff it has exactly one member and the group has more than
  *    one feature. Replicated as-is.
  *  - the reference's sort comparator returns 1 on ties (arbitrary
  *    order); we tie-break by feature id, which is observably identical
  *    (equal-coordinate features always land in the same cluster and
  *    LCA is set-valued).
  */
object DomainArchitecture {

  /** One protein-domain feature: `geneId` the owning gene/protein,
    * `root` its domain-hierarchy root (the reference's `hroot[ipr]`),
    * `ipr` the feature's ontology id, `[start, end)` its span.
    */
  case class Feature(geneId: Long, root: Long, ipr: Long, start: Long, end: Long)

  /** One architecture cluster: seed-ordered span, member count, and the
    * members' least common ancestor in the domain hierarchy.
    */
  case class Cluster(
      gene_id: Long, root: Long, c_start: Long, c_end: Long,
      n_members: Long, lca_ipr: Long)

  /** Pairwise LCA of binary-heap labels (node k's parent is k/2):
    * climb the deeper side, then both, until they meet. Pure
    * arithmetic — no ontology LUT needed when ids are heap-shaped.
    */
  def heapLca(a0: Long, b0: Long): Long = {
    var a = a0
    var b = b0
    while (a != b) { if (a > b) a >>= 1 else b >>= 1 }
    a
  }

  /** Set LCA over heap labels (LCA is associative-commutative on
    * sets, so the fold order is immaterial).
    */
  def heapSetLca(ids: Seq[Long]): Long = ids.reduce(heapLca)

  /** The reference's path-walk LCA (`domain_architect.js:180-193`):
    * fold over the ids; for each pair compare root-paths from index 1
    * while equal and keep the last common element. `paths(x)` is the
    * reference's `pathFromRoot[x]` (root first, x last) — typically a
    * broadcast LUT at scale.
    */
  def pathSetLca(paths: Long => Seq[Long])(ids: Seq[Long]): Long =
    ids.reduce { (x, y) =>
      val p1 = paths(x)
      val p2 = paths(y)
      val n = math.min(p1.length, p2.length)
      var i = 1
      while (i < n && p1(i) == p2(i)) i += 1
      p1(i - 1)
    }

  /** Root-path of a heap label: 1, …, k/4, k/2, k. */
  def heapPath(k: Long): Seq[Long] = {
    var cur = k
    var acc = List.empty[Long]
    while (cur >= 1) { acc = cur :: acc; cur >>= 1 }
    acc
  }

  /** The architecture sweep. One output row per emitted cluster. */
  def clusters(
      features: Dataset[Feature],
      minOverlap: Double = 0.2,
      lcaOf: Seq[Long] => Long = heapSetLca): Dataset[Cluster] = {
    import features.sparkSession.implicits._
    features
      .groupByKey(f => (f.geneId, f.root))
      .flatMapGroups { (key: (Long, Long), it: Iterator[Feature]) =>
        val (gene, root) = key
        val fs = it.toArray.sortBy(f => (f.start, f.end, f.ipr))
        val out = mutable.ArrayBuffer.empty[Cluster]
        var cs = fs(0).start
        var ce = fs(0).end
        var members = mutable.ArrayBuffer(fs(0).ipr)
        def emit(): Unit =
          out += Cluster(gene, root, cs, ce, members.length.toLong,
            lcaOf(members.toSeq))
        var done = false
        var i = 1
        while (i < fs.length) {
          val f = fs(i)
          done = true
          if (f.start < ce) {
            if (f.end < ce) { members += f.ipr; done = false }
            else {
              val ov = (ce - f.start).toDouble
              if (ov / (f.end - f.start) >= minOverlap ||
                ov / (ce - cs) >= minOverlap) {
                members += f.ipr
                ce = f.end
                done = false
              }
            }
          }
          if (done) {
            emit()
            cs = f.start
            ce = f.end
            members = mutable.ArrayBuffer(f.ipr)
          }
          i += 1
        }
        // reference `domain_architect.js:165`: the final cluster is kept
        // only when the group's last feature merged into it (or the
        // group has a single feature — the loop never ran)
        if (!done) emit()
        out
      }
  }
}
