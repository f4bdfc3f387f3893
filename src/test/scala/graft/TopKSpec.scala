package graft

import graft.ops.TopK
import graft.ops.TopK.Scored

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator keeps k best with deterministic ties, any partitioning") {
    val rows = Seq(
      (1, Scored(10L, 5.0)), (1, Scored(11L, 9.0)), (1, Scored(12L, 9.0)),
      (1, Scored(13L, 1.0)), (1, Scored(14L, 7.0)),
      (2, Scored(20L, 2.0)))
    for (parts <- Seq(1, 3, 7)) {
      val got = rows.toDS().repartition(parts)
        .groupByKey(_._1).mapValues(_._2)
        .agg(TopK.topK(3).toColumn.name("top"))
        .collect().toMap
      assert(got(1) == Vector(Scored(11L, 9.0), Scored(12L, 9.0), Scored(14L, 7.0)),
        s"parts=$parts")
      assert(got(2) == Vector(Scored(20L, 2.0)))
    }
  }

  test("merge of partial buffers preserves order and the k bound") {
    val a = Vector(Scored(1, 9.0), Scored(2, 5.0))
    val b = Vector(Scored(3, 7.0), Scored(4, 6.0), Scored(5, 1.0))
    val agg = TopK.topK(3)
    val merged = agg.merge(a, b)
    assert(merged == Vector(Scored(1, 9.0), Scored(3, 7.0), Scored(4, 6.0)))
  }

  test("reduce below k just inserts in order") {
    val agg = TopK.topK(5)
    val r = Seq(Scored(1, 1.0), Scored(2, 3.0), Scored(3, 2.0))
      .foldLeft(agg.zero)(agg.reduce)
    assert(r == Vector(Scored(2, 3.0), Scored(3, 2.0), Scored(1, 1.0)))
  }
}
