package graft

import org.apache.spark.sql.functions._

import graft.ops.{Apss, Decontaminate, Dedup, SimilarityGuard}

/** The pre-flight candidate-volume guard (round-7 finding, engine
  * behavior since round 9): exact similarity joins REFUSE the
  * closed-vocabulary / high-df regime where prefix filtering cannot
  * prune, and run untouched on Heaps-law corpora where it can.
  */
class SimilarityGuardSpec extends SparkSpec {
  import spark.implicits._

  /** Closed vocabulary: every doc is a permutation of the same 8
    * tokens, so every prefix gram is shared by many docs and candidate
    * volume is quadratic in the corpus — the audit regime in
    * miniature.
    */
  private def closedVocabDocs(n: Int) = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to n).map { i =>
      (i.toLong, rnd.shuffle(vocab).mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
  }

  /** Heaps-law shape: each doc is dominated by its own unique tokens,
    * so gram dfs stay ~1 and the prefix join's volume stays linear.
    * One planted near-duplicate pair to assert the exact join still
    * finds what it should.
    */
  private def heapsDocs(n: Int) = {
    val base = (1 to n).map { i =>
      (i.toLong, (1 to 20).map(j => s"t${i}_$j").mkString(" "), "en")
    }
    val dup = (n + 1).toLong -> base.head._2 // near-dup of doc 1 (identical text)
    (base :+ ((dup._1, dup._2, "en"))).toDF("doc_id", "text", "lang")
  }

  test("volume predictors count join rows exactly") {
    val prefixes = Seq(
      ("k1", 1L), ("k1", 2L), ("k1", 3L), ("k1", 4L), // df 4 -> C(4,2)=6
      ("k2", 5L), ("k2", 6L),                         // df 2 -> 1
      ("k3", 7L)                                      // df 1 -> 0
    ).toDF("htok", "id")
    assert(SimilarityGuard.selfJoinVolume(prefixes, Seq("htok")) === 7L)

    val a = Seq(("k1", 1L), ("k1", 2L), ("k2", 3L)).toDF("htok", "id")
    val b = Seq(("k1", 10L), ("k1", 11L), ("k1", 12L), ("k3", 13L)).toDF("htok", "id")
    // k1: 2*3 = 6; k2/k3 unmatched -> 0
    assert(SimilarityGuard.crossJoinVolume(a, b, Seq("htok")) === 6L)

    // empty prefix table must predict 0, not NPE on a null sum
    assert(SimilarityGuard.selfJoinVolume(prefixes.limit(0), Seq("htok")) === 0L)
  }

  test("auto cap scales with the corpus; explicit cap is hard") {
    // below the floor the floor rules; past it the per-doc budget does
    assert(SimilarityGuard.autoCap(100L) === SimilarityGuard.DefaultFloor)
    val big = 500L * 1000
    assert(SimilarityGuard.autoCap(big) ===
      (SimilarityGuard.DefaultPerDocCandidates * big).toLong)
    // the 100x audit's measured linear point: q22 predicted 406M rows
    // on 500k docs (812/doc) — auto must ALLOW what an absolute
    // default refused
    assert(SimilarityGuard.autoCap(big) > 406L * 1000 * 1000)
    assert(SimilarityGuard.resolveCap(SimilarityGuard.Auto, big) ===
      SimilarityGuard.autoCap(big))
    assert(SimilarityGuard.resolveCap(123L, big) === 123L)
  }

  test("ngramJaccardPairs refuses the closed-vocab regime and names the re-route") {
    val docs = closedVocabDocs(60)
    val e = intercept[SimilarityGuard.CandidateVolumeExceeded] {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang",
        shingleN = 2, threshold = 0.5, maxCandidates = 100L).count()
    }
    assert(e.predicted > e.cap && e.cap === 100L)
    assert(e.getMessage.contains("minHashLsh"))
  }

  test("the refused corpus routes to the LSH screen, which runs") {
    // same corpus, signature-collision-driven candidates: launches and
    // completes (permutations of one vocab are true near-dups at low
    // threshold, so output is non-trivial)
    val got = Dedup.minHashLsh(closedVocabDocs(60), "text", "doc_id",
      shingleN = 2, bands = 8, rowsPerBand = 2, threshold = 0.2)
    assert(got.count() > 0)
  }

  test("Heaps-law corpus runs green under the default cap and finds the planted pair") {
    val pairs = Dedup.ngramJaccardPairs(heapsDocs(200), "text", "doc_id", "lang",
      shingleN = 2, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 201L)))
  }

  test("jaccardScreen refuses a closed-vocab train x bench blow-up") {
    val train = closedVocabDocs(50)
    val bench = closedVocabDocs(20)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"), col("lang"))
    val e = intercept[SimilarityGuard.CandidateVolumeExceeded] {
      Decontaminate.jaccardScreen(train, bench, "text", "doc_id",
        shingleN = 2, threshold = 0.5, maxCandidates = 50L).count()
    }
    assert(e.predicted > 50L)
    assert(e.getMessage.contains("minHashScreen"))
  }

  test("guarded launches surface predicted-vs-actual candidate telemetry " +
      "as observed metrics; APSS sits at exact equality") {
    // sparse vectors with shared dims so the posting join has real work
    val rnd = new scala.util.Random(23)
    val vecs = (1 to 120).map { i =>
      (i.toLong, Seq.fill(4)(1 + rnd.nextInt(40)).distinct
        .map(d => (d, 0.5 + rnd.nextDouble())))
    }.toDF("id", "terms")
      .select(col("id"),
        transform(col("terms"), t =>
          struct(t.getField("_1").as("dim"), t.getField("_2").as("w"))).as("terms"))
    val res = Apss.cosinePairs(vecs, "id", "terms", threshold = 0.9)
    res.collect()
    val metrics = res.queryExecution.observedMetrics
      .filter(_._1.startsWith("graft.similarity.Apss.candidatesOf#"))
    assert(metrics.nonEmpty,
      s"no telemetry node in ${res.queryExecution.observedMetrics.keys}")
    val row = metrics.values.head
    val actual = row.getAs[Long]("actual_candidates")
    val predicted = row.getAs[Long]("predicted_candidates")
    // the APSS self-join has no post-key prune before the metric, so
    // the predictor must be EXACT — drift here is a predictor bug
    assert(actual === predicted,
      s"predictor drift: actual=$actual predicted=$predicted")
    assert(predicted > 0L, "degenerate test corpus: no shared dims at all")

    // the pruned joins (PPJoin positional filters) must stay <= predicted
    val pairs = Dedup.ngramJaccardPairs(heapsDocs(100), "text", "doc_id",
      "lang", shingleN = 2, threshold = 0.8)
    pairs.collect()
    val m2 = pairs.queryExecution.observedMetrics
      .filter(_._1.startsWith("graft.similarity.Dedup.ngramJaccardPairs#"))
    assert(m2.nonEmpty)
    val r2 = m2.values.head
    assert(r2.getAs[Long]("actual_candidates") <=
      r2.getAs[Long]("predicted_candidates"))
  }

  test("Apss refuses when every vector posts the same hot dims") {
    val vecs = (1 to 40).map { i =>
      (i.toLong, (1 to 8).map(d => (d, 1.0 + (i % 3) * 0.1)))
    }.toDF("id", "terms")
      .select(col("id"),
        transform(col("terms"), t =>
          struct(t.getField("_1").as("dim"), t.getField("_2").as("w"))).as("terms"))
    val e = intercept[SimilarityGuard.CandidateVolumeExceeded] {
      Apss.cosinePairs(vecs, "id", "terms", threshold = 0.1,
        maxCandidates = 200L).count()
    }
    assert(e.predicted > 200L)
  }
}
