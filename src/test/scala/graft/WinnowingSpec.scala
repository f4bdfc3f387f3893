package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalytics
import graft.ops.Dedup

/** The relational winnowing kernel vs the per-row HOF semantic spec,
  * and the pair screen over planted duplicates.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def randDoc(seed: Long, len: Int): String = {
    // seeded PRNG per doc: docs with different seeds are independent
    // (a LINEAR i-mix makes every doc a rotation of one cycle — all
    // fingerprints then exceed any maxDf and the screen goes empty)
    val r = new scala.util.Random(seed)
    (0 until len).map(_ => s"t${r.nextInt(50)}").mkString(" ")
  }

  test("winnowedFingerprintTable == the per-row HOF kernel " +
      "(randomized docs, incl. short-doc exclusion)") {
    for ((k, w) <- Seq((3, 4), (2, 2), (4, 5))) {
      // lengths straddle the k+w-1 short-doc threshold
      val docs = (0L until 40L)
        .map(i => (i, randDoc(i, (i % 12).toInt)))
        .toDF("doc_id", "text")
      val fromTable = Dedup
        .winnowedFingerprintTable(docs, "text", "doc_id", k, w)
        .groupBy("id").agg(sort_array(collect_set("fp")).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val fromHof = docs
        .select(col("doc_id"),
          TextAnalytics.winnowedFingerprints(
            TextAnalytics.tokens(col("text")), k, w).as("fps"))
        .where(col("fps").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fromTable === fromHof, s"k=$k w=$w")
    }
  }

  test("winnowingPairs finds planted near-copies and only them; " +
      "maxDf elides ubiquitous fingerprints") {
    val base = (0L until 30L).map(i => (i, randDoc(i * 97 + 5, 20)))
    // plant copies of docs 0..4 with one appended token
    val planted = (0L until 5L).map(i => (1000L + i, base(i.toInt)._2 + " zz"))
    val docs = (base ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(
        docs, "text", "doc_id", k = 3, w = 4, maxDf = 20L, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(i => assert(pairs.contains((i, 1000L + i)), s"i=$i"))
    // with maxDf = 2 every fingerprint in more than two docs elides;
    // a doc and its planted copy still share df-2 private fps
    val strict = Dedup.winnowingPairs(
        docs, "text", "doc_id", 3, 4, maxDf = 2L, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(i => assert(strict.contains((i, 1000L + i)), s"i=$i"))
    intercept[IllegalArgumentException] {
      Dedup.winnowingPairs(docs, "text", "doc_id", 3, 4, 1L, 1L)
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowingPairs(docs, "text", "doc_id", 3, 1, 2L, 1L)
    }
  }
}
