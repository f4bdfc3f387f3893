package graft

import org.apache.spark.sql.functions._
import graft.functions.SetSimilarity

class SetSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jac(a: Seq[String], b: Seq[String], t: Double): Double =
    Seq((a.sorted, b.sorted)).toDF("a", "b")
      .select(SetSimilarity.jaccardSorted(col("a"), col("b"), t))
      .head().getDouble(0)

  test("exact jaccard above threshold, -1 below") {
    assert(jac(Seq("a", "b", "c"), Seq("a", "b", "c"), 0.5) == 1.0)
    assert(jac(Seq("a", "b", "c", "d"), Seq("a", "b", "c", "x"), 0.5) == 0.6)
    assert(jac(Seq("a", "b"), Seq("x", "y"), 0.5) == -1.0)
    assert(jac(Seq("a", "b", "c", "d"), Seq("a", "x", "y", "z"), 0.5) == -1.0)
  }

  test("empty arrays: undefined similarity reports below-threshold") {
    // 0/0 is undefined — two sub-shingle-length docs must NOT read as
    // perfect duplicates (the SQL oracle's NaN fails its filter too)
    assert(jac(Nil, Nil, 0.5) == -1.0)
    assert(jac(Seq("a"), Nil, 0.5) == -1.0)
    assert(jac(Nil, Seq("a"), 0.5) == -1.0)
  }

  test("matches HOF-based exact jaccard on random sorted sets above threshold") {
    val rng = new scala.util.Random(11)
    val vocab = ('a' to 'z').map(_.toString)
    val pairs = Seq.fill(200) {
      val base = rng.shuffle(vocab).take(5 + rng.nextInt(15)).toSet
      val mut = base.filter(_ => rng.nextBoolean()) ++
        rng.shuffle(vocab).take(rng.nextInt(4))
      (base.toSeq.sorted, mut.toSeq.sorted)
    }
    val df = pairs.toDF("a", "b")
    val inter = size(array_intersect(col("a"), col("b"))).cast("double")
    val union = size(array_union(col("a"), col("b"))).cast("double")
    val rows = df.select(
      SetSimilarity.jaccardSorted(col("a"), col("b"), 0.3),
      when(union > 0, inter / union).otherwise(1.0)).as[(Double, Double)].collect()
    rows.foreach { case (fast, ref) =>
      if (ref >= 0.3) assert(math.abs(fast - ref) < 1e-12, s"fast=$fast ref=$ref")
      else assert(fast == -1.0, s"fast=$fast ref=$ref should be pruned")
    }
  }
}
