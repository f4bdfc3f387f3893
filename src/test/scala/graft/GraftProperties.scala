package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.ops.{Closure, RangeJoin}

/** Property-based checks against brute-force oracles (SURVEY §5.2):
  * random inputs, exhaustive reference computation, exact comparison.
  * Sample counts are small — every evaluation runs Spark jobs.
  */
object GraftProperties extends Properties("graft") {
  import SharedSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private val genPoints: Gen[List[Long]] =
    Gen.listOfN(60, Gen.chooseNum(-500L, 500L))

  private val genIntervals: Gen[List[(Long, Long)]] =
    Gen.listOfN(25, for {
      lo <- Gen.chooseNum(-500L, 500L)
      len <- Gen.chooseNum(0L, 200L)
    } yield (lo, lo + len))

  property("rangeJoin == nested loop oracle") =
    forAll(genPoints, genIntervals, Gen.oneOf(1L, 37L, 128L, 10000L)) {
      (ps, ivs, binWidth) =>
        val pDf = ps.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
        val iDf = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("iid", "lo", "hi")
        val got = RangeJoin.pointInInterval(pDf, "x", iDf, "lo", "hi", binWidth)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val want = (for {
          (x, pi) <- ps.zipWithIndex
          ((lo, hi), ii) <- ivs.zipWithIndex
          if x >= lo && x <= hi
        } yield (pi.toLong, ii.toLong)).toSet
        Prop(got == want) :| s"got=${got.size} want=${want.size}"
    }

  private val genDagEdges: Gen[List[(Long, Long)]] =
    Gen.chooseNum(2, 40).flatMap { n =>
      Gen.sequence[List[List[(Long, Long)]], List[(Long, Long)]](
        (2L to n.toLong).toList.map { c =>
          Gen.chooseNum(1, 2).flatMap(k =>
            Gen.listOfN(k, Gen.chooseNum(1L, c - 1).map(p => (c, p))))
        }).map(_.flatten.distinct)
    }

  property("closure == reachability oracle") = forAll(genDagEdges) { edges =>
    (edges.nonEmpty) ==> {
      val got = Closure.transitiveClosure(edges.toDF("child", "parent"))
        .as[(Long, Long)].collect().toSet
      val parents = edges.groupBy(_._1).map { case (c, es) => c -> es.map(_._2).toSet }
      def anc(n: Long): Set[Long] = {
        val d = parents.getOrElse(n, Set.empty)
        d ++ d.flatMap(anc)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.flatMap(n => anc(n).map(n -> _)).toSet
      Prop(got == want) :| s"got=${got.size} want=${want.size}"
    }
  }

  property("binning partitions the domain: each point matches its own bin exactly once") =
    forAll(genPoints, Gen.oneOf(1L, 7L, 100L)) { (ps, w) =>
      val df = ps.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      // join every point against the full covering set of intervals
      // built from the same binning: [k*w, (k+1)*w - 1]
      val bins = ps.map(x => Math.floorDiv(x, w)).distinct
        .map(k => (k, k * w, k * w + w - 1))
      val iDf = bins.toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(df, "x", iDf, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect()
      Prop(got.length == ps.length &&
        got.toMap.forall { case (pid, k) => Math.floorDiv(ps(pid.toInt), w) == k })
    }
}
