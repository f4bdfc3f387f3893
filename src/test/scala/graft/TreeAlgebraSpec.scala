package graft

import org.apache.spark.sql.functions._
import graft.ops.TreeAlgebra
import graft.ops.TreeAlgebra.{TreeNode, TreeStats}

class TreeAlgebraSpec extends SparkSpec {
  import spark.implicits._

  test("treeStats: size, depth, representative with tie to lowest id") {
    //  tree 1:  1 -> {2, 3}, 3 -> {4}; scores: node 2 and 4 tie at 9.0
    val nodes = Seq(
      TreeNode(1L, 1L, -1L, 1.0),
      TreeNode(1L, 2L, 1L, 9.0),
      TreeNode(1L, 3L, 1L, 2.0),
      TreeNode(1L, 4L, 3L, 9.0),
      // tree 2: single root
      TreeNode(2L, 10L, -1L, 5.0)).toDS()
    val got = TreeAlgebra.treeStats(nodes).collect().map(s => s.tree_id -> s).toMap
    assert(got(1L) == TreeStats(1L, 4L, 2L, 2L, 9.0))
    assert(got(2L) == TreeStats(2L, 1L, 0L, 10L, 5.0))
  }

  test("heapSubtreeRoot maps ids to their level-3 ancestor") {
    val ids = Seq(8L, 15L, 16L, 31L, 1000L, 123456L).toDF("id")
    val got = ids.select(col("id"), TreeAlgebra.heapSubtreeRoot(col("id"), 3))
      .as[(Long, Long)].collect().toMap
    def oracle(k: Long): Long = { var c = k; while (c > 15) c /= 2; c }
    got.foreach { case (k, v) => assert(v == oracle(k), s"id $k") }
  }

  test("heapSubtreeRoot is null below the level") {
    val got = Seq(7L).toDF("id")
      .select(TreeAlgebra.heapSubtreeRoot(col("id"), 3)).collect()(0)
    assert(got.isNullAt(0))
  }

  test("lcaFromPaths: longest common prefix tail") {
    val df = Seq(
      (Seq(1L, 2L, 5L), Seq(1L, 2L, 7L)),   // lca 2
      (Seq(1L, 2L), Seq(1L, 2L, 7L)),       // one path is a prefix -> 2
      (Seq(3L), Seq(4L)),                   // disjoint -> null
      (Seq(1L, 2L, 5L), Seq(1L, 2L, 5L)))   // identical -> 5
      .toDF("a", "b")
    val got = df.select(TreeAlgebra.lcaFromPaths(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) == 2L)
    assert(got(1).getLong(0) == 2L)
    assert(got(2).isNullAt(0))
    assert(got(3).getLong(0) == 5L)
  }
}
