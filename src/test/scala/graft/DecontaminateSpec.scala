package graft

import org.apache.spark.sql.functions._

import graft.ops.Decontaminate

/** Benchmark n-gram decontamination: crafted corpus with known overlap
  * structure, checked against hand-computed expectations (one row per
  * training doc, zero-hit docs included).
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("ngramOverlap flags exactly the docs sharing a benchmark n-gram") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")).toDF("id", "text")
    val train = Seq(
      // shares "quick brown fox" with bench 100
      (1L, "a quick brown fox appeared"),
      // shares nothing (no common 3-gram)
      (2L, "the dog sleeps all day long"),
      // verbatim copy of bench 101 -> every 3-gram hits
      (3L, "pack my box with five dozen liquor jugs"),
      // too short for any 3-gram
      (4L, "hi there")).toDF("id", "text")

    val out = Decontaminate.ngramOverlap(train, bench, "text", "id", n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap

    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // doc 1: 3 distinct 3-grams, exactly "quick brown fox" hits
    assert(out(1L) == (3L, 1L, 0.3333, true))
    // doc 2: 4 distinct 3-grams, none in the benchmark
    assert(out(2L) == (4L, 0L, 0.0, false))
    // doc 3: all 6 grams hit (verbatim benchmark copy)
    assert(out(3L) == (6L, 6L, 1.0, true))
    // doc 4: no 3-grams at all -> clean by definition
    assert(out(4L) == (0L, 0L, 0.0, false))
  }

  test("overlap counts distinct grams once however often they repeat") {
    val bench = Seq((9L, "x y x y x y")).toDF("id", "text")
    // "x y" 3-grams: "x y x", "y x y" both appear repeatedly in bench;
    // the training doc's distinct grams each count once
    val train = Seq((1L, "x y x y")).toDF("id", "text")
    val r = Decontaminate.ngramOverlap(train, bench, "text", "id", n = 3)
      .head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getDouble(3) == 1.0)
  }
}
