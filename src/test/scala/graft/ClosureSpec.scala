package graft

import graft.ops.Closure

class ClosureSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reachability oracle over an edge list. */
  private def reachOracle(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val parents = edges.groupBy(_._1).map { case (c, es) => c -> es.map(_._2).toSet }
    def ancestors(n: Long): Set[Long] = {
      val direct = parents.getOrElse(n, Set.empty)
      direct ++ direct.flatMap(ancestors)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.flatMap(n => ancestors(n).map(n -> _)).toSet
  }

  test("closure on a chain") {
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L))
    val got = Closure.transitiveClosure(edges.toDF("child", "parent"))
      .as[(Long, Long)].collect().toSet
    assert(got == reachOracle(edges))
  }

  test("closure on a random multi-parent DAG matches reachability oracle") {
    val rng = new scala.util.Random(13)
    // edges always point from a higher id to a lower id -> acyclic
    val edges = (2L to 120L).flatMap { c =>
      Seq.fill(1 + rng.nextInt(2))((c, rng.nextLong(c - 1) + 1)).distinct
    }
    val got = Closure.transitiveClosure(edges.toDF("child", "parent"))
      .as[(Long, Long)].collect().toSet
    assert(got == reachOracle(edges))
  }

  test("subtreeSum aggregates descendants plus self") {
    //     1
    //    / \
    //   2   3
    //  /
    // 4
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L)).toDF("child", "parent")
    val facts = Seq((1L, 1.0), (2L, 10.0), (3L, 100.0), (4L, 1000.0))
      .toDF("node", "v")
    val closure = Closure.transitiveClosure(edges)
    val got = Closure.subtreeSum(closure, facts, "v", "s")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1111.0, 2L -> 1010.0, 3L -> 100.0, 4L -> 1000.0))
  }
}
