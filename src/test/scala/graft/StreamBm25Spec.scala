package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamBm25

/** Streaming BM25 serving: on bounded input the accumulated per-batch
  * answers must equal the one-shot batch scorer regardless of how the
  * query stream is sliced.
  */
class StreamBm25Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed query batches against the pinned index equal batch " +
      "bm25TopK across slicings") {
    val wide = graft.core.Tables.documentsWide(spark, sf)
    val queries = wide.where(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"),
        slice(graft.functions.TextAnalytics.tokens(col("text")), 1, 5)
          .as("terms"))
    val want = graft.ops.Bm25.bm25TopK(
      wide, queries, "text", "doc_id", "query_id", "terms", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(want.nonEmpty)
    for (slices <- Seq(1, 3)) {
      val got = StreamBm25.bm25StreamAvailableNow(spark, sf, 10, slices)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got === want, s"slices=$slices")
    }
  }
}
