package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jdbc

class JdbcSpec extends AnyFunSuite {

  test("id batches: dedup, sort, cut at batchSize") {
    val preds = Jdbc.idBatchPredicates("root_id", Seq(5L, 3L, 5L, 1L, 2L, 4L), 2)
    assert(preds == Seq(
      "root_id IN (1,2)",
      "root_id IN (3,4)",
      "root_id IN (5)"))
  }

  test("id batches: empty ids produce no predicates") {
    assert(Jdbc.idBatchPredicates("id", Nil, 100).isEmpty)
  }

  test("id batches: every id appears in exactly one predicate") {
    val ids = (1L to 1001L).map(i => (i * 7919) % 1000)
    val preds = Jdbc.idBatchPredicates("id", ids, 100)
    val recovered = preds.flatMap(p =>
      p.stripPrefix("id IN (").stripSuffix(")").split(",").map(_.toLong))
    assert(recovered.toSet == ids.toSet)
    assert(recovered.length == ids.distinct.length)
    assert(preds.forall(p => p.count(_ == ',') < 100))
  }
}
