package graft

import org.apache.spark.sql.functions._

import graft.functions.{Shingling, TextAnalytics}
import graft.ops.Dedup

/** Parity of the native shingle/MinHash kernels with the HOF
  * formulations they replace — the native versions must be
  * bit-identical drop-ins (DocStreams' static index and the LSH
  * buckets both depend on signatures agreeing across code paths).
  * The randomized parity property lives in [[GraftProperties]].
  */
class ShinglingSpec extends SparkSpec {
  import spark.implicits._

  private def hofSortedShingles(toks: org.apache.spark.sql.Column, n: Int) =
    sort_array(TextAnalytics.shinglesOf(toks, n))

  private def hofMinHash(sh: org.apache.spark.sql.Column, k: Int) =
    array((0 until k).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)

  test("native tokens matches filter(split) on crafted cases") {
    val texts = Seq("a  b   c", "", "   ", " x", "x ", "héllo  wörld",
      "a\tb", "one two  three")
    val df = texts.toDF("text").select(
      Shingling.tokens(col("text")).as("native"),
      filter(split(col("text"), " "), t => t =!= lit("")).as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"row=$r")
    }
  }

  test("sortedShingles matches the HOF formulation on crafted cases") {
    val texts = Seq(
      "a b c d e",
      "a a a a",
      "b a b a b",
      "x",
      "",
      "one two three two one",
      "zz aa zz aa mm")
    for (n <- Seq(1, 2, 3, 5, 6)) {
      val df = texts.toDF("text")
        .select(TextAnalytics.tokens(col("text")).as("toks"))
        .select(
          Shingling.sortedShingles(col("toks"), n).as("native"),
          hofSortedShingles(col("toks"), n).as("hof"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n row=$r")
      }
    }
  }

  test("minHashSignature matches the xxhash64 HOF formulation") {
    val texts = Seq("a b c d e f g", "q w e r t y", "a a a", "single")
    for (k <- Seq(1, 8, 32)) {
      val df = texts.toDF("text")
        .select(TextAnalytics.tokens(col("text")).as("toks"))
        .select(Shingling.sortedShingles(col("toks"), 2).as("sh"))
        .select(
          Dedup.minHashSignature(col("sh"), k).as("native"),
          hofMinHash(col("sh"), k).as("hof"))
      df.collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k row=$r")
      }
    }
  }

  test("minHashSignature on an empty shingle set is all nulls (HOF parity)") {
    val df = Seq(Seq.empty[String]).toDF("sh")
      .select(
        Dedup.minHashSignature(col("sh"), 4).as("native"),
        hofMinHash(col("sh"), 4).as("hof"))
    val r = df.head()
    assert(r.getSeq[Any](0) == Seq(null, null, null, null))
    assert(r.getSeq[Any](0) == r.getSeq[Any](1))
  }

  test("native kernels stay inside whole-stage codegen") {
    // spark.range source: a local Seq collapses into a LocalRelation at
    // optimize time and never reaches the codegen planner
    val plan = spark.range(10).select(concat_ws(" ",
        lit("a"), col("id").cast("string"), lit("b c")).as("text"))
      .select(TextAnalytics.tokens(col("text")).as("toks"))
      .select(Shingling.sortedShingles(col("toks"), 2).as("sh"))
      .select(Dedup.minHashSignature(col("sh"), 8).as("sig"))
      .queryExecution.executedPlan
    // the Project carrying all three kernels must sit INSIDE a
    // WholeStageCodegen stage (printed as the `*(n)` prefix)
    val inCodegen = plan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.exists {
          case p: org.apache.spark.sql.execution.ProjectExec =>
            p.projectList.toString.contains("minhashsig")
          case _ => false
        }
      case _ => false
    }
    assert(inCodegen, s"expected the kernel Project inside codegen:\n$plan")
  }
}
