package graft

import org.apache.spark.sql.functions._
import graft.functions.Shingling

/** Pins the 64- vs 128-bit gram-key switch ([[Shingling.gramKey]]):
  * keys are opaque labels for joins/aggregations, so on a
  * collision-free corpus BOTH widths must produce byte-identical
  * results — the flag exists only to push the collision probability
  * past the 10¹¹-gram decade, never to change an answer.
  */
class GramKeySpec extends SparkSpec {
  import spark.implicits._

  test("gramKey wide: 32 lowercase-hex-free chars, distinct grams stay distinct, " +
      "narrow lane is the wide prefix") {
    val grams = (0 until 500).map(i => s"tok$i a b").toDF("g")
    val rows = grams.select(
      col("g"),
      Shingling.gramKey(col("g"), wide = false).as("narrow"),
      Shingling.gramKey(col("g"), wide = true).as("wide"))
      .as[(String, Long, String)].collect()
    assert(rows.map(_._3).distinct.length == rows.length)
    rows.foreach { case (_, narrow, wide) =>
      assert(wide.length == 32, s"wide key '$wide'")
      // first lane of the wide key IS the narrow key, zero-padded hex
      assert(java.lang.Long.parseUnsignedLong(wide.take(16), 16) == narrow)
    }
  }

  test("selfHitSpans: 64- and 128-bit gram keys agree (q83's exactness " +
      "claim is key-width invariant off the collision decade)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val narrow = graft.ops.Decontaminate
      .selfHitSpans(docs, "text", "doc_id", 4).collect().toSet
    val wide = graft.ops.Decontaminate
      .selfHitSpans(docs, "text", "doc_id", 4, wideGramKeys = true)
      .collect().toSet
    assert(narrow.nonEmpty, "no duplicated substrings at sf0.001 — corpus regenerated?")
    assert(wide == narrow,
      s"missing=${(narrow diff wide).take(3)} extra=${(wide diff narrow).take(3)}")
  }

  test("q63 TF-IDF APSS: 64- and 128-bit dims give the same pairs and sims") {
    val narrow = graft.queries.Queries
      .apssTfidf(spark, "/root/testdata/sf0.001", wideGramKeys = false)
      .as[(Long, Long, Double)].collect().toSet
    val wide = graft.queries.Queries
      .apssTfidf(spark, "/root/testdata/sf0.001", wideGramKeys = true)
      .as[(Long, Long, Double)].collect().toSet
    assert(narrow.nonEmpty, "no APSS pairs at sf0.001 — corpus regenerated?")
    assert(wide == narrow,
      s"missing=${narrow diff wide} extra=${wide diff narrow}")
  }
}
