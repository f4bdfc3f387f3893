package graft

import graft.ops.Components

/** Connected components over pair graphs: chains (the shape that
  * punishes O(diameter) propagation), stars, multiple components,
  * duplicate/reversed input edges, and the canonical-keep verdict.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.components(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  /** Force the distributed alternating-star fixpoint (the small graphs
    * here would otherwise take the driver-local union-find shortcut).
    */
  private def runDistributed(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.components(pairs.toDF("id_a", "id_b"), localSolveMaxEdges = 0)
      .as[(Long, Long)].collect().toMap

  test("driver-local shortcut is bit-identical to the distributed fixpoint") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 3) {
      val pairs = Seq.fill(120)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2)
      assert(run(pairs) === runDistributed(pairs), s"trial $trial")
    }
    // chain + star shapes through BOTH paths
    val chain = (1L until 40L).map(i => (i, i + 1))
    assert(run(chain) === runDistributed(chain))
  }

  test("long chain collapses to its minimum") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size === 40)
    assert(got.values.toSet === Set(1L))
  }

  test("multiple components, reversed and duplicate edges") {
    val got = run(Seq(
      (5L, 3L), (3L, 5L), (5L, 3L), // one component {3,5}, noisy input
      (10L, 11L), (12L, 11L), // {10,11,12}
      (100L, 90L))) // {90,100}
    assert(got === Map(
      3L -> 3L, 5L -> 3L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      90L -> 90L, 100L -> 90L))
  }

  test("star and bridge shapes") {
    // star around 50 bridged to a chain via (50, 7)
    val star = Seq((50L, 60L), (50L, 70L), (50L, 80L))
    val bridge = Seq((7L, 50L), (7L, 6L), (6L, 5L))
    val got = run(star ++ bridge)
    assert(got.values.toSet === Set(5L))
  }

  test("empty pair set yields empty components") {
    assert(run(Seq.empty).isEmpty)
  }

  test("canonicalize marks exactly one keeper per cluster") {
    val got = Components.canonicalize(
      Seq((1L, 2L), (2L, 3L), (9L, 8L)).toDF("id_a", "id_b"))
      .as[(Long, Long, Boolean)].collect()
    val keepers = got.filter(_._3).map(_._1).toSet
    assert(keepers === Set(1L, 8L))
    assert(got.filter(!_._3).map(_._1).toSet === Set(2L, 3L, 9L))
  }

  test("random graphs match a BFS oracle") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 3) {
      val n = 30
      val pairs = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val got = run(pairs)
      // BFS oracle
      val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      def comp(start: Long): Set[Long] = {
        var seen = Set(start)
        var frontier = Set(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) diff seen
          seen ++= frontier
        }
        seen
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val want = nodes.map(x => x -> comp(x).min).toMap
      assert(got === want, s"trial $trial")
    }
  }
}
