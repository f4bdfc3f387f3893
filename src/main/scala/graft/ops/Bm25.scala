package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{FixedLog, TextAnalytics}

/** BM25 relevance ranking over the corpus — the query-side consumer
  * of the [[InvertedIndex]] artifact: per query, the top-k documents
  * by the Okapi BM25 score with the standard defaults as EXACT
  * rationals (k1 = 6/5, b = 3/4). This is the "query the corpus" half
  * the reference delegates to its document store's text index
  * (`search/indexCommands.txt:33-48` — the `$text`/relevance access
  * path); here it is a term-keyed join against the posting
  * aggregation, never a score sort over the full corpus.
  *
  * EVERY arithmetic step is integer, so the score is bit-identical
  * across engines and partitionings and replayable in SQL:
  *
  *  - idf(t) = ln((N+1)/(df+0.5)) = ln(2N+2) − ln(2df+1): both
  *    arguments are INTEGERS, so the transcendental step goes through
  *    [[FixedLog.iln1m]] (pure-integer fixed-point log, 20-step
  *    recursive-CTE-replayable): `idf_1m ≈ 10⁶·idf ≥ 0`.
  *  - length normalization: `l_ppm = (10⁶·dl·N) div totTokens`
  *    (= 10⁶·dl/avgdl), `denom_ppm = 10⁶·tf + 3·10⁵ + (9·l_ppm) div 10`
  *    (= 10⁶·(tf + k1(1−b) + k1·b·dl/avgdl) with k1(1−b) = 3/10 and
  *    k1·b = 9/10 exact).
  *  - `tfpart_ppm = (22·10⁵·tf·10⁶) div denom_ppm` (= 10⁶·tf(k1+1)/denom,
  *    k1+1 = 11/5 → 22/10 folded into the numerator).
  *  - score = Σ_t idf_1m·tfpart_ppm — exact integer, units 10⁻¹².
  *
  * The computation is split SERVING-STYLE: [[buildIndex]] makes the
  * scoring tables once (one token pass — dl derives from tf, no
  * second corpus scan — plus one small stats job and the overflow
  * guards), [[scoreTopK]] answers a query batch against them (keyed
  * join + typed [[TopK.TopKAggregator]] — at most k rows per (map
  * partition, query) on the wire). [[bm25TopK]] composes the two for
  * one-shot use; the streaming gate (q112) builds the index once and
  * scores query micro-batches against it. Overflow is refused by
  * name, not wrapped: the l_ppm product bounds N·max(dl), the tfpart
  * numerator bounds max(tf), and the Double-exact TopK transport
  * bounds the per-query term count at [[MaxQueryTerms]] (scores stay
  * ≤ 2⁵³).
  */
object Bm25 {

  /** Scores are carried through the typed top-k as Double (exact for
    * longs ≤ 2^53); a query with more terms than this could push the
    * summed score past that, so wider queries are refused.
    */
  val MaxQueryTerms = 128

  /** The prepared scoring tables: per-(doc, term) tf with the doc
    * length attached, and per-term integer idf. Both frames read from
    * a lazily-staged tf table (materialized once, index-sized), so
    * serving many batches replays index-sized state, never the corpus
    * lineage. `staged` exposes the internal cut points (tf, dl) so a
    * caller that pins the DERIVED frames itself (the streaming gate
    * eagerly checkpoints tfDl/idf for the stream's lifetime) can
    * release the inner two instead of holding four index-sized copies.
    */
  final case class Index(
      tfDl: DataFrame, idf: DataFrame, staged: Seq[DataFrame] = Nil) {
    /** Release the internal staged tables. Call only once tfDl/idf are
      * themselves materialized (or no longer needed): the staged
      * lineage is truncated and cannot recompute.
      */
    def releaseStaged(): Unit = staged.foreach(
      org.apache.spark.sql.classic.GraftColumnBridge.unpersistLocalCheckpoint)
  }

  /** One corpus pass + one small stats job → the scoring tables,
    * overflow-guarded by name.
    */
  def buildIndex(
      docs: DataFrame,
      textCol: String,
      idCol: String): Index =
    buildIndexFromTf(docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalytics.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf")))

  /** The index arithmetic from an existing `(doc_id, term, tf)` term-
    * frequency table — the seam that lets the scoring tables derive
    * from a STORED posting artifact (q114 feeds it
    * [[InvertedIndex]]-decoded postings: tf = positions per entry, dl
    * and df re-aggregated from the postings themselves — the corpus
    * text is never touched) as well as from a fresh tokenize pass.
    */
  def buildIndexFromTf(tf: DataFrame): Index = {
    // The tf table feeds FOUR consumers (the stats job below, both
    // sides of the length-normalization join, and the df aggregation);
    // without a cut point each consumer replays tf's whole upstream
    // lineage — for q127 that lineage is the full incremental-index
    // maintenance DAG, and the un-checkpointed plan re-executed it per
    // consumer (122 parquet scans in one plan). The staged cut IS the
    // stored index being materialized once; everything downstream is
    // index-sized. Released at the query boundary by the harness's
    // StagingScope.drain (or early by Index.releaseStaged).
    val tfC = graft.core.StagingScope.stage(tf)
    val dl = graft.core.StagingScope.stage(
      tfC.groupBy("doc_id").agg(sum("tf").as("dl")))

    val st = dl.agg(count(lit(1)), coalesce(sum("dl"), lit(0L)),
      coalesce(max("dl"), lit(0L))).head()
    val n = st.getLong(0)
    val totTok = st.getLong(1)
    val maxDl = st.getLong(2)
    require(n > 0 && totTok > 0, "bm25: empty corpus")
    require(maxDl <= Long.MaxValue / 1000000L / math.max(n, 1L),
      s"bm25: 10^6 * max(dl)=$maxDl * N=$n overflows the length-" +
        "normalization product — shard the corpus or rescale")
    require(maxDl <= Long.MaxValue / 2200000L / 1000000L,
      s"bm25: max(dl)=$maxDl overflows the tf-saturation numerator")

    val tfDl = tfC.join(dl, Seq("doc_id"))
      .withColumn("l_ppm", expr(s"(1000000L * dl * ${n}L) div ${totTok}L"))
      .withColumn("tfpart_ppm", expr(
        "(2200000L * tf * 1000000L) div " +
          "(1000000L * tf + 300000L + (9L * l_ppm) div 10L)"))
      .select("doc_id", "term", "tfpart_ppm")
    val idf = tfC.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        (lit(FixedLog.iln1mImpl(2L * n + 2L)) -
          FixedLog.iln1m(lit(2L) * col("df") + lit(1L))).as("idf_1m"))
    Index(tfDl, idf, Seq(tfC, dl))
  }

  /** Score a query batch against a prepared index: top-k docs per
    * query as `(query_id, rank, doc_id, score)`, rank 1-based by
    * (score desc, doc_id asc); duplicate query terms count once.
    *
    * The query-width overflow guard is IN-PLAN (a `raise_error`-guarded
    * column over the batch-local term count, the [[InvertedIndex]]
    * id-range pattern), not a driver pre-flight job: serving stays
    * single-job per batch — no extra driver-blocking stats pass on the
    * hot path.
    */
  def scoreTopK(
      index: Index,
      queries: DataFrame,
      qidCol: String,
      qTermsCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // width guard before the explode: size() of the de-duplicated term
    // array is per-row (no window/shuffle over the batch needed)
    val qt = queries.select(col(qidCol).cast("long").as("query_id"),
        array_distinct(col(qTermsCol)).as("__terms"))
      .withColumn("__terms",
        when(size(col("__terms")) <= MaxQueryTerms, col("__terms"))
          .otherwise(raise_error(concat(
            lit("bm25: a query has "), size(col("__terms")).cast("string"),
            lit(s" distinct terms (> $MaxQueryTerms) — the summed score " +
              "could exceed the 2^53 exact-Double bound of the top-k " +
              "transport; split the query")))
            .cast("array<string>")))
      .select(col("query_id"), explode(col("__terms")).as("term"))

    // the bounded top-k runs as the NATIVE [[TopK.TopKScoredAgg]]
    // expression (same at-most-k-rows-per-(map partition, query)
    // transport; Double scores stay exact under the [[MaxQueryTerms]]
    // 2^53 guard) — the previous typed-Aggregator form walled the
    // serving plan with DeserializeToObject/SerializeFromObject pairs
    // that block whole-stage codegen and rebuild every scored row as a
    // Scala tuple
    qt.join(index.tfDl, Seq("term"))
      .join(index.idf, Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("idf_1m") * col("tfpart_ppm")).as("score"))
      .groupBy("query_id")
      .agg(TopK.topKScored(
        col("doc_id"), col("score").cast("double"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"), col("col.score").cast("long").as("score"))
  }

  /** One-shot compose: build the index and answer one query batch. */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      textCol: String,
      idCol: String,
      qidCol: String,
      qTermsCol: String,
      k: Int): DataFrame =
    scoreTopK(buildIndex(docs, textCol, idCol), queries, qidCol, qTermsCol, k)
}
