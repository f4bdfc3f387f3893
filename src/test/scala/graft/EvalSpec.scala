package graft

import graft.ops.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Long)]): (Option[Long], Long, Long, Long) = {
    val r = Eval.binaryAuc(rows.toDF("score", "pos"), "score", "pos").head()
    (if (r.isNullAt(0)) None else Some(r.getLong(0)),
      r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Local tie-averaged Mann-Whitney AUC — the textbook definition the
    * distributed plan must reproduce.
    */
  private def localAuc(rows: Seq[(Long, Long)]): Double = {
    val sorted = rows.sortBy(_._1)
    val avgRank = sorted.map(_._1).zipWithIndex
      .groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
    val rPos = sorted.filter(_._2 == 1L).map(r => avgRank(r._1)).sum
    val np = rows.count(_._2 == 1L).toDouble
    val nn = rows.size - np
    (rPos - np * (np + 1) / 2) / (np * nn)
  }

  test("tied scores take the average rank (hand case: AUC 0.875)") {
    // scores 1,2,2,3 labels 0,0,1,1: positive ranks 2.5 + 4 = 6.5,
    // U = 3.5, AUC = 3.5/4
    val (ppm, np, nn, rs2) = auc(Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L)))
    assert((ppm, np, nn) == (Some(875000L), 2L, 2L))
    assert(rs2 == 13L) // 2*R+ = 2*6.5
  }

  test("perfect separation gives 1.0; perfect inversion gives 0.0") {
    assert(auc(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))._1
      == Some(1000000L))
    assert(auc(Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)))._1
      == Some(0L))
  }

  test("single-class input yields null AUC (undefined), counts intact") {
    val (ppm, np, nn, _) = auc(Seq((1L, 1L), (2L, 1L)))
    assert(ppm.isEmpty && np == 2L && nn == 0L)
  }

  test("distributed rank-sum matches the local textbook AUC on a " +
      "heavily-tied random corpus") {
    val rng = new scala.util.Random(17)
    val rows = Seq.fill(4000)(
      (rng.nextInt(50).toLong, if (rng.nextBoolean()) 1L else 0L))
    val (ppm, _, _, _) = auc(rows)
    assert(ppm == Some(math.floor(localAuc(rows) * 1e6).toLong))
  }

  test("AUC is invariant under fixed-point rescaling of scores") {
    val rng = new scala.util.Random(23)
    val rows = Seq.fill(500)(
      (rng.nextInt(30).toLong, rng.nextInt(2).toLong))
    val scaled = rows.map { case (s, p) => (s * 10000L, p) }
    assert(auc(rows)._1 == auc(scaled)._1)
  }
}
