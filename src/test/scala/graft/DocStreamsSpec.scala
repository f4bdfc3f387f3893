package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.DocStreams

class DocStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(29)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private def doc(n: Int): String =
    Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")

  // corpus of 30 docs; stream docs 100/101 mutate corpus docs 0/1
  // lightly (near-dups), 102 is independent noise
  private lazy val corpusDocs: Seq[(Long, String)] =
    (0L until 30L).map(i => (i, doc(40)))
  private lazy val streamDocs: Seq[(Long, String)] = Seq(
    (100L, corpusDocs(0)._2.split(" ").updated(3, "MUTX").mkString(" ")),
    (101L, corpusDocs(1)._2.split(" ").updated(7, "MUTY").mkString(" ")),
    (102L, doc(40)))

  test("streaming near-dup against a static index matches the batch cross-join oracle") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = corpusDocs.toDF("doc_id", "text")
    val index = DocStreams.minHashIndex(
      corpus, "text", "doc_id", shingleN = 2, bands = 8, rowsPerBand = 2)

    // batch oracle: the same bucket-join + verify run as a plain join
    val streamAsBatch = streamDocs.toDF("doc_id", "text")
    val wantPairs = {
      val l = DocStreams.minHashIndex(
        streamAsBatch, "text", "doc_id", shingleN = 2, bands = 8, rowsPerBand = 2)
        .select(col("bb"), col("corpus_id").as("id"), col("corpus_sh").as("sh"))
      l.join(index, Seq("bb"))
        .withColumn("jaccard",
          graft.functions.SetSimilarity.jaccardSorted(col("sh"), col("corpus_sh"), 0.5))
        .where(col("jaccard") >= 0.5)
        .select("id", "corpus_id").distinct()
        .as[(Long, Long)].collect().toSet
    }
    assert(wantPairs.contains((100L, 0L)) && wantPairs.contains((101L, 1L)),
      s"planted near-dups not recovered by the bucket join: $wantPairs")

    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val q = DocStreams.nearDupStream(
      stream, index, "text", "doc_id", "ts",
      threshold = 0.5, shingleN = 2, bands = 8, rowsPerBand = 2)
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      input.addData(streamDocs.map { case (i, t) => (i, t, new Timestamp(1000L)) }: _*)
      q.processAllAvailable()
      // append-mode watermark dedup holds rows until the watermark
      // passes — push it forward to flush
      input.addData((999L, "flush flush", new Timestamp(100000L * 1000L)))
      q.processAllAvailable()
      val got = spark.table("neardup")
        .select("doc_id", "corpus_id").as[(Long, Long)].collect()
      assert(got.toSet == wantPairs,
        s"missed=${wantPairs diff got.toSet} extra=${got.toSet diff wantPairs}")
      // multi-band collisions emitted exactly once per pair
      assert(got.length == got.toSet.size, "duplicate pair emissions")
    } finally q.stop()
  }

  test("late batches still match the static index; sub-threshold docs emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = corpusDocs.toDF("doc_id", "text")
    val index = DocStreams.minHashIndex(
      corpus, "text", "doc_id", shingleN = 2, bands = 8, rowsPerBand = 2)
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = DocStreams.nearDupStream(
      input.toDF().toDF("doc_id", "text", "ts"), index, "text", "doc_id", "ts",
      threshold = 0.5, shingleN = 2, bands = 8, rowsPerBand = 2)
      .writeStream.format("memory").queryName("neardup2").outputMode("append").start()
    try {
      // batch 1: pure noise — nothing should ever emit for it
      input.addData((200L, doc(40), new Timestamp(1000L)))
      q.processAllAvailable()
      // batch 2 (much later event time): a near-dup of corpus doc 2 —
      // the static side is not windowed, so late batches match fine
      val mut = corpusDocs(2)._2.split(" ").updated(5, "MUTZ").mkString(" ")
      input.addData((201L, mut, new Timestamp(7200L * 1000L)))
      q.processAllAvailable()
      input.addData((999L, "flush flush", new Timestamp(1000000L * 1000L)))
      q.processAllAvailable()
      val got = spark.table("neardup2")
        .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(got.contains((201L, 2L)), s"late match missing: $got")
      assert(!got.exists(_._1 == 200L), s"noise doc matched: $got")
    } finally q.stop()
  }
}
