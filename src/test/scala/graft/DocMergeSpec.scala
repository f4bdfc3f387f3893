package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.DocMerge

class DocMergeSpec extends SparkSpec {
  import spark.implicits._

  test("deepMerge: arrays concat-distinct, scalars right-wins, missing LUT rows pass through") {
    val docs = Seq(
      (1L, Seq("a", "b"), "old-name", 10L),
      (2L, Seq("x"), "keep-me", 20L))
      .toDF("id", "synonyms", "name", "rank")
    val lut = Seq(
      (1L, Seq("b", "c"), "new-name"))
      .toDF("id", "synonyms", "name")
    val got = DocMerge.deepMerge(docs, lut, "id")
      .orderBy("id")
      .as[(Long, Seq[String], String, Long)].collect()
    assert(got(0) == ((1L, Seq("a", "b", "c"), "new-name", 10L)))
    assert(got(1) == ((2L, Seq("x"), "keep-me", 20L)))
  }

  test("deepMerge: nested structs merge field-wise") {
    val docs = Seq((1L, ("r1", 100L, "d1"))).toDF("id", "loc")
      .select(col("id"), col("loc").cast("struct<region:string,start:bigint,desc:string>"))
    val lut = Seq((1L, (null.asInstanceOf[String], 999L))).toDF("id", "loc")
      .select(col("id"), col("loc").cast("struct<region:string,start:bigint>"))
    val got = DocMerge.deepMerge(docs, lut, "id").select("loc.*")
      .as[(String, Long, String)].head()
    assert(got == (("r1", 999L, "d1"))) // start overridden, region kept, desc untouched
  }

  test("deepMerge: right-only columns are appended") {
    val docs = Seq((1L, "n")).toDF("id", "name")
    val lut = Seq((1L, 3.14)).toDF("id", "score")
    val got = DocMerge.deepMerge(docs, lut, "id").columns.toSeq
    assert(got == Seq("id", "name", "score"))
  }

  test("deepMerge: case-insensitive fallback probes the upper-cased key") {
    val docs = Seq(("gene1", "old"), ("GENE2", "keep"), ("gene3", "x"))
      .toDF("id", "name")
    val lut = Seq(("gene1", "exact-hit"), ("GENE3", "upper-hit"))
      .toDF("id", "name")
    val got = DocMerge
      .deepMerge(docs, lut, "id", caseInsensitiveFallback = true)
      .as[(String, String)].collect().toMap
    assert(got("gene1") == "exact-hit")   // exact match wins
    assert(got("GENE2") == "keep")        // no match either way
    assert(got("gene3") == "upper-hit")   // found via upper(key)
  }

  test("deepMerge fallback: case-colliding LUT keys resolve deterministically") {
    val docs = Seq(("GENE9", "old")).toDF("id", "name")
    val lut = Seq(("gene9", "lower"), ("Gene9", "mixed")).toDF("id", "name")
    val got = DocMerge
      .deepMerge(docs, lut, "id", caseInsensitiveFallback = true)
      .as[(String, String)].collect().toMap
    assert(got("GENE9") == "mixed") // smallest original key ("Gene9" < "gene9")
  }

  test("deepMerge fallback is per-row: an exact hit's null fields never backfill from the ci row") {
    // doc "gene1" hits LUT row ("gene1", name=null, score=7); a DIFFERENT
    // LUT row ("GENE1", "other", 9) matches case-insensitively. The
    // reference probes exact-key ELSE upper-key (doc_merger.js:23-24):
    // the exact row wins wholesale, its null name must stay null-merged
    // (keep the doc's own name), not borrow "other" from GENE1.
    val docs = Seq(("gene1", "doc-name", 0L)).toDF("id", "name", "score")
    val lut = Seq(
      ("gene1", null.asInstanceOf[String], 7L),
      ("GENE1", "other", 9L)).toDF("id", "name", "score")
    val got = DocMerge
      .deepMerge(docs, lut, "id", caseInsensitiveFallback = true)
      .as[(String, String, Long)].head()
    assert(got == (("gene1", "doc-name", 7L)), s"got $got")
  }

  test("pruneEmpty: empty strings, arrays, and all-null structs collapse to null") {
    val df = Seq(
      ("", Seq.empty[String], ("", Seq.empty[String])),
      ("x", Seq("a", ""), ("y", Seq("z"))))
      .toDF("s", "arr", "st")
    val got = DocMerge.pruneEmpty(df).collect()
    assert(got(0) == Row(null, null, null))
    assert(got(1) == Row("x", Seq("a"), Row("y", Seq("z"))))
  }

  test("toCanonicalJson drops pruned fields from the serialized doc") {
    val df = Seq(("g1", "", Seq.empty[String], 5L)).toDF("id", "desc", "syn", "n")
    val json = DocMerge.toCanonicalJson(df).as[String].head()
    assert(json == """{"id":"g1","n":5}""")
  }
}
