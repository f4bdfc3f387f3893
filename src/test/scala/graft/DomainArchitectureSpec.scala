package graft

import graft.ops.DomainArchitecture
import graft.ops.DomainArchitecture.{Cluster, Feature}

/** Pins the reference sweep semantics (`search/domain_architect.js:
  * 119-203`) documented in [[graft.ops.DomainArchitecture]]: the
  * inclusive-20% merge rule against both the incoming feature and the
  * cluster span, unconditional containment merge, new-cluster seeding on
  * failed overlap, the trailing-seed drop, and both LCA variants.
  */
class DomainArchitectureSpec extends SparkSpec {
  import spark.implicits._

  private def run(fs: Seq[(Long, Long, Long)]): Seq[Cluster] =
    // single gene/root; (ipr, start, end) triples
    DomainArchitecture.clusters(
      fs.map { case (ipr, s, e) => Feature(1L, 0L, ipr, s, e) }.toDS())
      .collect().sortBy(c => (c.c_start, c.c_end)).toSeq

  test("overlap at exactly 20% of the incoming feature merges; 19.9% does not") {
    // cluster [0,1000); incoming [800,1800): overlap 200/1000 = 0.2 → merge
    val merged = run(Seq((8L, 0L, 1000L), (9L, 800L, 1800L), (10L, 3000L, 3100L)))
    assert(merged.map(c => (c.c_start, c.c_end, c.n_members)) ===
      Seq((0L, 1800L, 2L))) // trailing seed (3000) dropped
    // incoming [801,1801): overlap 199/1000 = 0.199 → seeds a new cluster
    val split = run(Seq((8L, 0L, 1000L), (9L, 801L, 1801L), (10L, 3000L, 3100L)))
    assert(split.map(c => (c.c_start, c.c_end, c.n_members)) ===
      Seq((0L, 1000L, 1L), (801L, 1801L, 1L)))
  }

  test("overlap at 20% of the cluster span merges even when tiny vs the feature") {
    // cluster [0,10); incoming [8,208): overlap 2 → 2/200=0.01 vs feature,
    // 2/10=0.2 vs cluster span → merges and extends to 208
    val out = run(Seq((4L, 0L, 10L), (5L, 8L, 208L)))
    assert(out.map(c => (c.c_start, c.c_end, c.n_members)) === Seq((0L, 208L, 2L)))
    // [8.2% of span analog] incoming [9,229): overlap 1 → 1/220, 1/10=0.1 → split
    val out2 = run(Seq((4L, 0L, 10L), (5L, 9L, 229L), (6L, 500L, 501L)))
    assert(out2.map(c => (c.c_start, c.c_end)) === Seq((0L, 10L), (9L, 229L)))
  }

  test("strict containment merges unconditionally and leaves the cluster end unchanged") {
    // [50,60) inside [0,1000): far below 20% of the span, still merges
    val out = run(Seq((4L, 0L, 1000L), (5L, 50L, 60L), (6L, 999L, 5000L)))
    // third feature: overlap 1/4001 and 1/1000 → seeds; then trailing drop
    assert(out.map(c => (c.c_start, c.c_end, c.n_members)) === Seq((0L, 1000L, 2L)))
  }

  test("trailing-seed drop: last cluster kept iff its last feature merged or the group is a singleton") {
    // two disjoint features: the second seeds at the end → dropped
    assert(run(Seq((4L, 0L, 10L), (5L, 100L, 110L)))
      .map(c => (c.c_start, c.c_end)) === Seq((0L, 10L)))
    // single feature: loop never runs → kept
    assert(run(Seq((4L, 0L, 10L))).map(c => (c.c_start, c.c_end)) === Seq((0L, 10L)))
    // last feature merges → final multi-member cluster kept
    assert(run(Seq((4L, 0L, 10L), (5L, 100L, 110L), (6L, 105L, 115L)))
      .map(c => (c.c_start, c.c_end, c.n_members)) === Seq((0L, 10L, 1L), (100L, 115L, 2L)))
  }

  test("clusters are per (gene, root): same spans under different roots never merge") {
    val out = DomainArchitecture.clusters(Seq(
      Feature(1L, 0L, 4L, 0L, 100L),
      Feature(1L, 1L, 5L, 50L, 150L)).toDS()).collect()
    assert(out.length === 2)
    assert(out.map(_.n_members).toSet === Set(1L))
  }

  test("cluster lca: heap fold matches the reference path-walk fold") {
    assert(DomainArchitecture.heapSetLca(Seq(4L, 5L)) === 2L)
    assert(DomainArchitecture.heapSetLca(Seq(4L, 6L)) === 1L)
    assert(DomainArchitecture.heapSetLca(Seq(8L, 9L, 5L)) === 2L)
    assert(DomainArchitecture.heapSetLca(Seq(13L)) === 13L)
    // ancestor in the set: LCA is the ancestor itself
    assert(DomainArchitecture.heapSetLca(Seq(4L, 8L, 9L)) === 4L)
    val viaPaths = DomainArchitecture.pathSetLca(DomainArchitecture.heapPath) _
    for (ids <- Seq(Seq(4L, 5L), Seq(4L, 6L), Seq(8L, 9L, 5L), Seq(4L, 8L, 9L),
        Seq(1023L, 512L), Seq(77L, 78L, 79L)))
      assert(viaPaths(ids) === DomainArchitecture.heapSetLca(ids), s"ids=$ids")
  }

  test("lca lands in the emitted clusters") {
    val out = run(Seq((8L, 0L, 100L), (9L, 50L, 150L)))
    assert(out.map(_.lca_ipr) === Seq(4L))
  }
}
