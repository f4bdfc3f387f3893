package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalytics

/** SHARDED inverted index — the retrieval-side artifact (term →
  * posting list with positions) a corpus pipeline materializes for
  * BM25/phrase search over its training data. The classic failure at
  * corpus scale is the unsharded posting row: a stopword's list is
  * corpus-sized, so "one row per term" OOMs the task that builds it.
  * Here the posting space is sharded by `doc_id div shardSpan` —
  * group key (term, shard) — so NO output row ever aggregates more
  * than `shardSpan` documents, whatever the term's document
  * frequency; a reader streams a term's shards in doc-id order (the
  * shard id is the doc-id prefix, so shard order IS doc order).
  *
  * Optionally `maxDocFreq` drops terms whose GLOBAL document
  * frequency exceeds the cap (stopword elision — the standard way to
  * keep index size proportional to useful postings); the df table is
  * one extra narrow aggregation.
  *
  * Output, one row per (term, shard):
  * `(term, shard, df_shard, tf_shard, postings_md5)` — counts plus an
  * md5 digest of the canonical posting serialization
  * `zeropad12(doc_id):pos,pos,...` joined by `;` in doc-id order
  * (zero-padding makes lexical order equal numeric order, so any SQL
  * engine replays the digest byte-for-byte). The digest stands in for
  * the nested array-of-structs so the artifact is flat, hashable, and
  * engine-portable; a production sink would keep the arrays.
  */
object InvertedIndex {

  /** Doc ids must sit in [0, 10^12): `lpad(id, 12)` TRUNCATES (not
    * pads) longer strings on both Spark and DuckDB, so two ids ≥ 10^12
    * would collide in the canonical serialization, and a negative id's
    * '-' breaks lexical-order-equals-doc-order. Out-of-range ids fail
    * the scan loudly (codegen `raise_error`, no extra pass) instead of
    * corrupting the digest.
    */
  val MaxDocId: Long = 1000000000000L

  def postingShards(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shardSpan: Long,
      maxDocFreq: Option[Long] = None): DataFrame = {
    require(shardSpan >= 1, s"shardSpan must be >= 1, got $shardSpan")
    maxDocFreq.foreach(m => require(m >= 1, s"maxDocFreq must be >= 1, got $m"))
    val rawId = col(idCol).cast("long")
    val checkedId = when(rawId >= 0L && rawId < MaxDocId, rawId)
      .otherwise(raise_error(concat(
        lit("postingShards: doc id out of the zero-pad range [0, 1e12): "),
        rawId.cast("string"))).cast("long"))
    val tp = docs.select(
      checkedId.as("doc_id"),
      posexplode(TextAnalytics.tokens(col(textCol))).as(Seq("pos", "term")))
    val scoped = maxDocFreq match {
      case None => tp
      case Some(m) =>
        val df = tp.select("term", "doc_id").distinct()
          .groupBy("term").agg(count(lit(1)).as("__df"))
          .where(col("__df") <= m)
          .select("term")
        tp.join(df, Seq("term"), "left_semi")
    }
    val perDoc = scoped
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("ps"))
      .select(col("term"),
        expr(s"doc_id div ${shardSpan}L").as("shard"),
        size(col("ps")).cast("long").as("tf"),
        concat(
          lpad(col("doc_id").cast("string"), 12, "0"), lit(":"),
          concat_ws(",", transform(col("ps"), _.cast("string")))).as("s"))
    perDoc
      .groupBy("term", "shard")
      .agg(
        count(lit(1)).as("df_shard"),
        sum(col("tf")).as("tf_shard"),
        md5(concat_ws(";", sort_array(collect_list(col("s")))))
          .as("postings_md5"))
  }

  /** COMPRESSED posting shards — the same sharded index with the
    * posting payload delta+varint encoded instead of ASCII-serialized
    * (the 10¹¹-gram decade is storage-bound; decimal strings waste
    * ~4× against one-byte deltas). Canonical integer stream per
    * (term, shard), docs in id order:
    *
    *   for each doc: [doc_id − prev (first: doc_id − shard·span),
    *                  n_positions, pos₀, pos deltas…]
    *
    * every value non-negative by the sort invariants, then LEB128
    * ([[graft.functions.Varint]]). The byte stream is pure integer
    * arithmetic, so the ORACLE REBUILDS THE EXACT BYTES (shifts +
    * printf hex) and the compressed artifact is hash-gated like the
    * ASCII form — compression without giving up the gate. Output
    * adds both payload sizes, so the ratio is measurable at any SF
    * straight from the gated rows.
    *
    * Returns `(term, shard, df_shard, tf_shard, varint_md5,
    * varint_bytes, raw_bytes)`; `varint_md5` is md5 over the
    * lowercase hex of the bytes (both engines build the identical
    * hex), `raw_bytes` is the ASCII canonical serialization's size
    * for the same postings.
    */
  /** Positional PHRASE search — the query-side consumer the positions
    * in the posting lists exist for (BM25/q103 consumes tf; this
    * consumes adjacency): documents containing the exact token
    * sequence `phrase`, with the match count. Plan: ONE token-position
    * pass (not one per phrase term — the r15 review's scan-path
    * finding), filtered to the phrase's distinct terms, then the
    * OFFSET-CERTIFICATE aggregation: each occurrence of term t at
    * position q emits a certificate `(doc, start = q − i, i)` for
    * every phrase offset i with `phrase(i) == t` (a broadcast join
    * against the ≤16-row offset table), and a `(doc, start)` group
    * holding all k DISTINCT offsets is exactly an alignment where
    * every phrase slot matched. One keyed shuffle on (doc, start),
    * never a position-range or pair join; repeated words and
    * overlapping occurrences fall out naturally (standard
    * positional-index semantics).
    */
  def phraseMatches(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      phrase: Seq[String]): DataFrame = {
    val tp = docs.select(
      col(idCol).cast("long").as("doc_id"),
      posexplode(TextAnalytics.tokens(col(textCol))).as(Seq("pos", "term")))
    phraseFromPositions(tp, phrase)
  }

  /** Multi-phrase DICTIONARY matching — every phrase of a phrase
    * TABLE matched against the corpus in ONE tokenize pass: the
    * offset-certificate plan with the ≤16-row broadcast offset table
    * replaced by a keyed join against the exploded dictionary
    * `(term, phrase_id, off, plen)`. This is the shape a pipeline
    * needs when the dictionary is itself data-scale (100k banned
    * phrases, an entity gazetteer): phrases arrive as a DataFrame, the
    * term join SHUFFLES on its key (never broadcasts an unbounded
    * dictionary — Spark may still auto-broadcast a small one), and no
    * driver loop runs per phrase. A `(phrase_id, doc, start)` group
    * holding all `plen` distinct offsets is a match.
    *
    * `phrases` is `(phrase_id, terms array<string>)`; empty or
    * over-long (> 64 tokens) phrases refuse in-plan by name. Output:
    * `(phrase_id, doc_id, n_matches)`, one row per matching pair.
    */
  def phraseTableMatches(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      phrases: DataFrame): DataFrame = {
    val offs = phrases.select(
        col("phrase_id").cast("long").as("phrase_id"),
        when(size(col("terms")).between(1, 64), col("terms"))
          .otherwise(raise_error(concat(
            lit("phraseTableMatches: phrase "),
            col("phrase_id").cast("string"),
            lit(" has "), size(col("terms")).cast("string"),
            lit(" tokens — must be 1..64"))).cast("array<string>"))
          .as("terms"))
      .select(col("phrase_id"), size(col("terms")).cast("long").as("plen"),
        posexplode(col("terms")).as(Seq("off", "term")))
    val tp = docs.select(
      col(idCol).cast("long").as("doc_id"),
      posexplode(TextAnalytics.tokens(col(textCol))).as(Seq("pos", "term")))
    tp.join(offs, Seq("term"))
      .select(col("phrase_id"), col("doc_id"),
        (col("pos").cast("long") - col("off")).as("start"),
        col("off"), col("plen"))
      .groupBy("phrase_id", "doc_id", "start")
      .agg(countDistinct(col("off")).as("__k"), max(col("plen")).as("__plen"))
      .where(col("__k") === col("__plen"))
      .groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_matches"))
  }

  /** The offset-certificate plan over a `(doc_id, term, pos)` position
    * table — shared by the corpus-scan and artifact-served phrase
    * paths so the two cannot drift.
    */
  private def phraseFromPositions(tp: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.size <= 16,
      s"phrase must have 1..16 tokens, got ${phrase.size}")
    val spark = tp.sparkSession
    import spark.implicits._
    val offsets = phrase.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("term", "off")
    tp.where(col("term").isin(phrase.distinct: _*))
      .join(broadcast(offsets), Seq("term"))
      .select(col("doc_id"),
        (col("pos").cast("long") - col("off")).as("start"), col("off"))
      .groupBy("doc_id", "start")
      .agg(countDistinct(col("off")).as("__k"))
      .where(col("__k") === phrase.size.toLong)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"))
  }

  /** PROXIMITY search — `w1 NEAR/window w2`: documents where the two
    * words co-occur within `window` token positions, with the exact
    * pair count. The naive plan is a per-doc position cross join;
    * here positions BAND into `window`-sized buckets (the
    * [[RangeJoin]] idea applied to token offsets): each w1 position
    * probes its own and both adjacent buckets, w2 positions carry
    * exactly one bucket, so the join is a keyed equi-join on
    * (doc_id, bucket), each true pair matches in exactly one bucket
    * (no dedup pass), and candidate volume is bounded by pairs within
    * 2·window — never |w1 positions|×|w2 positions|.
    */
  def proximityMatches(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      w1: String,
      w2: String,
      window: Long): DataFrame = {
    val tp = docs.select(
      col(idCol).cast("long").as("doc_id"),
      posexplode(TextAnalytics.tokens(col(textCol))).as(Seq("pos", "term")))
    proximityFromPositions(tp, w1, w2, window)
  }

  /** The banding join over a `(doc_id, term, pos)` position table —
    * shared by the corpus-scan and artifact-served proximity paths so
    * the two plans cannot drift.
    */
  private def proximityFromPositions(
      tp: DataFrame,
      w1: String,
      w2: String,
      window: Long): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(w1 != w2, "proximity of a word with itself is not defined " +
      "here (every position pairs with itself); use phraseMatches for " +
      "repeats")
    val probes = tp.where(col("term") === w1)
      .select(col("doc_id"), col("pos").cast("long").as("p1"))
      .select(col("doc_id"), col("p1"),
        explode(expr(s"array(p1 div ${window}L - 1L, p1 div ${window}L, " +
          s"p1 div ${window}L + 1L)")).as("b"))
    val targets = tp.where(col("term") === w2)
      .select(col("doc_id"), col("pos").cast("long").as("p2"),
        expr(s"cast(pos as bigint) div ${window}L").as("b"))
    probes.join(targets, Seq("doc_id", "b"))
      .where(abs(col("p1") - col("p2")) <= window)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Proximity search SERVED FROM THE COMPRESSED INDEX — the read-side
    * twin of [[phraseMatchesFromPostings]], closing the retrieval
    * family's last scan-only path: only the two query terms' shards
    * are decoded (term pushdown before the decode —
    * [[graft.functions.Varint.postingsDecode]] re-absolutes doc ids
    * from the shard base and positions from their deltas), then the
    * SAME banding equi-join as [[proximityMatches]] (shared kernel).
    * On any corpus this must equal the corpus-scan plan row-for-row —
    * q120 gates it against q115's oracle verbatim, the round-trip
    * proof that the artifact alone serves phrase (q111), proximity
    * (q120), and BM25 (q114).
    */
  def proximityMatchesFromPostings(
      index: DataFrame,
      shardSpan: Long,
      w1: String,
      w2: String,
      window: Long): DataFrame = {
    val tp = index
      .where(col("term").isin(w1, w2))
      .select(col("term"),
        explode(graft.functions.Varint.postingsDecode(
          col("bin"), col("shard") * lit(shardSpan))).as("e"))
      .select(col("e.doc_id").as("doc_id"), col("term"),
        explode(col("e.ps")).as("pos"))
    proximityFromPositions(tp, w1, w2, window)
  }

  def postingShardsCompressed(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shardSpan: Long,
      maxDocFreq: Option[Long] = None): DataFrame =
    compressedView(postingShardsBinary(docs, textCol, idCol, shardSpan, maxDocFreq))

  /** The flat digest view of a binary posting artifact — blobs md5'd
    * over their lowercase hex (both engines build the identical hex)
    * so the artifact is hash-gateable; sizes ride along so the
    * compression ratio is measurable straight from the gated rows.
    */
  def compressedView(index: DataFrame): DataFrame =
    index.select(col("term"), col("shard"), col("df_shard"), col("tf_shard"),
      md5(lower(hex(col("bin")))).as("varint_md5"),
      length(col("bin")).cast("long").as("varint_bytes"),
      col("raw_bytes"))

  /** INCREMENTAL maintenance of the stored posting artifact — the
    * nightly-production op an evolving 100 TB corpus needs: given the
    * v1 artifact and both corpus versions, rebuild ONLY the (term,
    * shard) groups a changed document touches and carry every other
    * row of the artifact byte-identical. The reference rebuilds its
    * serving indexes from scratch on every load
    * (`search/indexCommands.txt:33-48`); this is the capability that
    * makes the refresh churn-proportional instead of corpus-sized.
    *
    * Locality argument (why carrying is sound): a (term, shard) group
    * is a pure function of the postings of `term` in the documents of
    * `shard` — doc ids, per-doc positions, and the delta/varint byte
    * stream are all LOCAL to the group (the doc-delta chain starts at
    * the shard base, never crosses shards). So full(v2) can differ
    * from full(v1) at (t, s) only if some churn document in shard s
    * contains t in its OLD or NEW token list — exactly the dirty-pair
    * set computed below from the [[SnapshotDiff]] statuses. Dirty
    * pairs rebuild from the v2 documents of their shards (a term that
    * vanished simply produces no row; a new term produces a new row);
    * clean pairs carry.
    *
    * Plan shape, all keyed: one full-outer id join (the diff), churn
    * docs tokenize twice (old + new versions — churn-sized), the
    * dirty-shard semi-join restricts the re-tokenize to churn-touched
    * shards, and the carry is an anti-join of the (index-sized, never
    * corpus-sized) v1 artifact against the dirty pairs. Cost scales
    * with churn × shardSpan locality, not corpus size; `shardSpan`
    * trades read locality against rebuild amplification (a 1-doc
    * change re-tokenizes its whole shard).
    *
    * No `maxDocFreq` variant: the df cap is a GLOBAL property — one
    * added document can push a term over the cap and delete its
    * postings from EVERY shard, so a capped index is not locally
    * maintainable without carrying the global df table; callers who
    * cap must rebuild (or maintain df separately and re-derive the
    * elision set).
    */
  def incrementalShardsBinary(
      priorIndex: DataFrame,
      oldDocs: DataFrame,
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      shardSpan: Long): DataFrame = {
    require(shardSpan >= 1, s"shardSpan must be >= 1, got $shardSpan")
    // churn-sized; four consumers below (two status filters, and the
    // dirty table feeds three joins) would otherwise each replay the
    // full two-corpus diff lineage
    val delta = graft.core.StagingScope.stage(
      SnapshotDiff.diff(oldDocs, newDocs, idCol, Seq(textCol)))
    def termShards(docs: DataFrame, statuses: Seq[String]) = {
      val churn = delta.where(col("status").isin(statuses: _*)).select("id")
      docs.join(churn, docs(idCol) === churn("id"), "left_semi")
        .select(col(idCol).cast("long").as("doc_id"),
          explode(TextAnalytics.tokens(col(textCol))).as("term"))
        .select(col("term"), expr(s"doc_id div ${shardSpan}L").as("shard"))
    }
    // dirty pairs: terms of the old versions of removed∪changed docs
    // (postings that must shrink or vanish) ∪ terms of the new
    // versions of added∪changed docs (postings that must grow)
    val dirty = graft.core.StagingScope.stage(
      termShards(oldDocs, Seq("removed", "changed"))
      .unionByName(termShards(newDocs, Seq("added", "changed")))
      .distinct())
      // (term, shard)-pair-sized; consumed by three joins below
    val dirtyShards = dirty.select("shard").distinct()
    val rebuilt = postingShardsBinary(
      newDocs.join(dirtyShards,
        expr(s"cast($idCol as bigint) div ${shardSpan}L") === dirtyShards("shard"),
        "left_semi"),
      textCol, idCol, shardSpan)
      .join(dirty, Seq("term", "shard"), "left_semi")
    val carried = priorIndex.join(dirty, Seq("term", "shard"), "left_anti")
    carried.unionByName(rebuilt)
  }

  /** The compressed index ARTIFACT itself — `(term, shard, df_shard,
    * tf_shard, bin, raw_bytes)` with `bin` the LEB128 posting payload
    * a production sink would store. [[postingShardsCompressed]] is
    * the flat digest view of this frame (the driver gate hashes
    * strings, not blobs); [[phraseMatchesFromPostings]] is the
    * read-side proof that the artifact alone answers queries.
    */
  def postingShardsBinary(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shardSpan: Long,
      maxDocFreq: Option[Long] = None): DataFrame = {
    require(shardSpan >= 1, s"shardSpan must be >= 1, got $shardSpan")
    maxDocFreq.foreach(m => require(m >= 1, s"maxDocFreq must be >= 1, got $m"))
    val scoped = maxDocFreq match {
      case None => perDocEntries(docs, textCol, idCol)
      case Some(m) =>
        val tp = perDocEntries(docs, textCol, idCol)
        val df = tp.select("term", "doc_id")
          .groupBy("term").agg(count(lit(1)).as("__df"))
          .where(col("__df") <= m)
          .select("term")
        tp.join(df, Seq("term"), "left_semi")
    }
    encodeShards(scoped, shardSpan)
  }

  /** One tokenize pass → the canonical per-(term, doc) posting
    * entries `(term, doc_id, ps)` (positions sorted ascending) — the
    * input contract of [[encodeShards]].
    */
  private def perDocEntries(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val rawId = col(idCol).cast("long")
    val checkedId = when(rawId >= 0L && rawId < MaxDocId, rawId)
      .otherwise(raise_error(concat(
        lit("postingShards: doc id out of the zero-pad range [0, 1e12): "),
        rawId.cast("string"))).cast("long"))
    docs.select(
        checkedId.as("doc_id"),
        posexplode(TextAnalytics.tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("ps"))
  }

  /** The canonical LEB128 shard encode over a `(term, doc_id, ps)`
    * entry table — extracted so the from-scratch build and the
    * artifact-only append ([[appendToShardsBinary]]) produce
    * byte-identical groups from the same entries, whatever the
    * entries' provenance (fresh tokenize or decoded payload).
    */
  private def encodeShards(entries: DataFrame, shardSpan: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term", "shard").orderBy("doc_id")
    val perDoc = entries
      .withColumn("shard", expr(s"doc_id div ${shardSpan}L"))
      .withColumn("prev", lag("doc_id", 1).over(w))
      .withColumn("chunk", expr(
        s"""concat(
              array(coalesce(doc_id - prev, doc_id - shard * ${shardSpan}L),
                    cast(size(ps) as bigint), ps[0]),
              transform(slice(ps, 2, size(ps) - 1),
                        (p, i) -> p - ps[i]))"""))
      .withColumn("raw_len", octet_length(concat(
        lpad(col("doc_id").cast("string"), 12, "0"), lit(":"),
        concat_ws(",", transform(col("ps"), _.cast("string"))))))
    perDoc
      .groupBy("term", "shard")
      .agg(
        count(lit(1)).as("df_shard"),
        sum(size(col("ps")).cast("long")).as("tf_shard"),
        graft.functions.Varint.encode(
          flatten(transform(
            sort_array(collect_list(struct(col("doc_id"), col("chunk")))),
            s => s("chunk")))).as("bin"),
        // ';' separators between docs in the ASCII form: df_shard - 1
        (sum(col("raw_len").cast("long")) + count(lit(1)) - 1L)
          .as("raw_bytes"))
  }

  /** APPEND-ONLY maintenance from the artifact ALONE — the streaming-
    * ingest shape: fold a batch of NEW documents into the stored index
    * without ever touching the already-indexed corpus. Where
    * [[incrementalShardsBinary]] re-tokenizes the dirty shards' v2
    * documents (and so needs the document store), this path DECODES
    * the dirty groups' existing payloads back to posting entries
    * ([[graft.functions.Varint.postingsDecode]]), unions the new
    * batch's entries, and re-encodes through the same
    * [[encodeShards]] kernel — so an ingest pipeline carries only the
    * index artifact between batches, never the accumulated corpus.
    *
    * Cost is churn-proportional: the batch tokenizes once; only
    * (term, shard) groups the batch touches decode and re-encode
    * (keyed semi/anti joins on the index's own key); every other row
    * carries byte-identical.
    *
    * Append-only is a CONTRACT, refused in-plan when violated: a
    * batch doc already present in a decoded group (same doc_id under
    * the same (term, shard)) raises by name instead of silently
    * double-counting — re-ingesting an edited document is an
    * incremental-maintenance job ([[incrementalShardsBinary]]), not
    * an append. (A re-ingested doc shares at least one term with its
    * old version — byte-identical text certainly — so the collision
    * is detectable inside dirty groups; a doc with WHOLLY new terms
    * is indistinguishable from a new doc at the artifact level.)
    */
  def appendToShardsBinary(
      priorIndex: DataFrame,
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      shardSpan: Long): DataFrame = {
    require(shardSpan >= 1, s"shardSpan must be >= 1, got $shardSpan")
    // batch-sized; feeds both the dirty-group derivation and the merge
    // union — one tokenize pass of the batch instead of two
    val newEntries = graft.core.StagingScope.stage(
      perDocEntries(newDocs, textCol, idCol)
      .withColumn("shard", expr(s"doc_id div ${shardSpan}L")))
    val dirty = graft.core.StagingScope.stage(
      newEntries.select("term", "shard").distinct()
      .join(priorIndex.select("term", "shard"), Seq("term", "shard"),
        "left_semi"))
      // (term, shard)-pair-sized; consumed by the decode semi-join AND
      // the carry anti-join
    val priorDirtyEntries = priorIndex
      .join(dirty, Seq("term", "shard"), "left_semi")
      .select(col("term"), col("shard"),
        explode(graft.functions.Varint.postingsDecode(
          col("bin"), col("shard") * lit(shardSpan))).as("e"))
      .select(col("term"), col("shard"),
        col("e.doc_id").as("doc_id"), col("e.ps").as("ps"))
    // each side carries one row per (term, doc): two rows in a group
    // mean the batch re-ingested an already-indexed doc — refuse
    val merged = priorDirtyEntries
      .unionByName(newEntries.select("term", "shard", "doc_id", "ps"))
      .groupBy("term", "shard", "doc_id")
      .agg(count(lit(1)).as("__n"), first(col("ps")).as("__ps"))
      .select(col("term"), col("doc_id"),
        when(col("__n") === 1, col("__ps"))
          .otherwise(raise_error(concat(
            lit("appendToShards: doc "), col("doc_id").cast("string"),
            lit(" is already indexed for term '"), col("term"),
            lit("' — append-only ingest cannot re-ingest; use " +
              "incrementalShardsBinary"))).cast("array<bigint>"))
          .as("ps"))
    val carried = priorIndex.join(dirty, Seq("term", "shard"), "left_anti")
    carried.unionByName(encodeShards(merged, shardSpan))
  }

  /** Phrase search SERVED FROM THE COMPRESSED INDEX — the read-side
    * round-trip proof for [[postingShardsBinary]]: positions are
    * reconstructed by decoding the LEB128 payload
    * ([[graft.functions.Varint.postingsDecode]] — doc ids re-absoluted
    * from the shard base, positions from their deltas), then the same
    * offset-certificate aggregation as [[phraseMatches]] (shared
    * kernel).
    * Only the phrase terms' shards are decoded (term pushdown before
    * the decode), so query cost is posting-sized whatever the corpus.
    * On any corpus this must equal [[phraseMatches]] row-for-row —
    * q111 gates it against q110's oracle verbatim.
    */
  def phraseMatchesFromPostings(
      index: DataFrame,
      shardSpan: Long,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty,
      s"phrase must have 1..16 tokens, got ${phrase.size}")
    val tp = index
      .where(col("term").isin(phrase.distinct: _*))
      .select(col("term"),
        explode(graft.functions.Varint.postingsDecode(
          col("bin"), col("shard") * lit(shardSpan))).as("e"))
      .select(col("e.doc_id").as("doc_id"), col("term"),
        explode(col("e.ps")).as("pos"))
    phraseFromPositions(tp, phrase)
  }
}
