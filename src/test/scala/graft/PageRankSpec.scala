package graft

import org.apache.spark.sql.functions._

import graft.ops.PageRank

/** Integer PageRank: must equal a local reference implementation of
  * the same scaled-integer recurrence on every graph and partitioning
  * — the exactness claim IS the operator's contract.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def local(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000L, damp: Int = 85): Map[Long, Long] = {
    val inSpine = nodes.toSet
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * (100L - damp) / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contribs = edges
        .filter(e => inSpine.contains(e._1)) // non-spine srcs contribute 0
        .groupBy(_._2)
        .view.mapValues(_.map { case (s, _) =>
          r(s) * damp / (100L * deg(s))
        }.sum).toMap
      r = nodes.map(n => n -> (base + contribs.getOrElse(n, 0L))).toMap
    }
    r
  }

  private def run(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      parts: Int): Map[Long, Long] =
    PageRank.pageRank(
      spark.createDataset(nodes).repartition(parts).toDF("node"),
      edges.toDF("src", "dst").repartition(parts),
      "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star graph hand case: hub absorbs the spokes' mass; dangling " +
      "spokes keep only the base") {
    // spokes 1..4 each point at hub 0; hub has no out-edges (dangling)
    val nodes = Seq(0L, 1L, 2L, 3L, 4L)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
    val got = run(nodes, edges, iters = 1, parts = 2)
    val base = 150000000L
    val spokeContrib = 1000000000L * 85L / 100L // deg 1
    assert(got(0L) === base + 4L * spokeContrib)
    Seq(1L, 2L, 3L, 4L).foreach(s => assert(got(s) === base))
    assert(got === local(nodes, edges, 1))
  }

  test("randomized graphs: equals the local recurrence across seeds, " +
      "iteration counts, and partitionings") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 20 + rnd.nextInt(60)
      val nodes = (0L until n.toLong).toSeq
      val edges = Seq.fill(n * 3)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      for (iters <- Seq(1, 3, 5)) {
        val expected = local(nodes, edges, iters)
        val got = run(nodes, edges, iters, parts = 1 + rnd.nextInt(5))
        assert(got === expected, s"seed=$seed iters=$iters")
      }
    }
  }

  test("isolated nodes sit at exactly the base mass; edges from " +
      "outside the spine contribute nothing") {
    val nodes = Seq(1L, 2L, 3L)
    // 99 is not in the spine: its edge into 1 must be inert
    val edges = Seq((1L, 2L), (99L, 1L))
    val got = run(nodes, edges, iters = 3, parts = 2)
    assert(got === local(nodes, edges, 3))
    assert(got(3L) === 150000000L) // isolated: base only
  }

  test("overflow-unsafe scale is refused; bad parameters are refused") {
    val nodes = (0L until 1000L).toDF("node")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.pageRank(nodes, edges, "src", "dst", 3,
        scale = Long.MaxValue / 50000L)
    }
    intercept[IllegalArgumentException] {
      PageRank.pageRank(nodes, edges, "src", "dst", 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.pageRank(nodes, edges, "src", "dst", 3, damp = 100)
    }
  }

  test("deterministic: two runs produce identical mass vectors") {
    val rnd = new scala.util.Random(11)
    val nodes = (0L until 50L).toSeq
    val edges = Seq.fill(200)(
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).distinct
    assert(run(nodes, edges, 4, 3) === run(nodes, edges, 4, 5))
  }
}
