package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`Array[Float]`). Two tiers:
  *
  *  - `cosineTopK`: exact brute force — broadcast the (small) query set
  *    against the full corpus, score with codegen'd higher-order
  *    functions (`zip_with` + `aggregate`), rank with a window. The
  *    corpus side streams: no shuffle of the big table at all (queries
  *    are broadcast; the window partitions by query id over the scored
  *    pairs, which is |corpus| x |queries| rows — fine when queries are
  *    bounded).
  *  - `lshCosineTopK`: the scale path — random-hyperplane LSH buckets
  *    both sides, candidates meet in an equi-join on (table, bucket),
  *    exact cosine re-ranks. Hyperplanes come from a fixed seed so runs
  *    are reproducible across executors and rounds.
  */
object Similarity {

  /** Cosine similarity of two double-array columns — the native fused
    * single-pass kernel ([[graft.functions.SetSimilarity.CosineSim]]);
    * the HOF formulation it replaced walked the arrays three times.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.SetSimilarity.cosineNative(a, b)

  /** The HOF formulation, kept as the reference implementation the
    * native kernel is tested against.
    */
  def cosineHof(a: Column, b: Column): Column = {
    // mismatched lengths: zip_with null-pads the shorter side, nulling
    // the dot product — coalesce to 0.0 so mismatches score 0 exactly
    // like the native kernel (parity is unit-tested)
    val dot = coalesce(
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x),
      lit(0.0))
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, x) => s + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s, x) => s + x))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k: for every row of `queries`, the `k` nearest rows of
    * `corpus` by cosine (self-matches excluded), rank ties broken by
    * neighbor id. Returns (query_id, rank, neighbor_id, sim).
    */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  /** Deterministic random hyperplanes (fixed seed) for sign-bit LSH. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit bucket id: bit p set iff the vector is on the positive
    * side of hyperplane p. Vectors in the same bucket are likely within
    * a small angle — the standard SRP-LSH for cosine.
    */
  def srpBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        val planeLit = array(p.toIndexedSeq.map(lit(_)): _*)
        val dot = aggregate(zip_with(vec, planeLit, (x, y) => x * y), lit(0.0), (s, x) => s + x)
        when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ bitwiseOR _)

  /** A built IVF-Flat index: the coarse quantizer (centroid id + L2
    * centroid per cell) and the cell-assigned corpus, persisted so any
    * number of probes reuse one build. At cluster scale `assigned`
    * would be a table partitioned by `cell` — the relational form of
    * the inverted lists.
    */
  final case class IvfIndex(
      centroids: Array[(Int, Array[Double])],
      assigned: DataFrame) {

    /** Probe: each query ranks the broadcast centroids (sorting
      * `nLists` structs on the SMALL query side only), explodes into
      * its `nProbe` cells, and meets its cells' corpus rows in an
      * equi-join on cell id (hash join, never a cross product); exact
      * cosine re-ranks. Cost per query ≈ |corpus|·nProbe/nLists.
      */
    def probe(
        queries: DataFrame,
        idCol: String,
        vecCol: String,
        k: Int,
        nProbe: Int = 4): DataFrame = {
      val q = queries.select(
        col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
        .withColumn("cell",
          explode(transform(
            slice(sort_array(centroidDists(col("qv"), centroids)), 1, nProbe),
            s => s.getField("cid"))))
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      assigned.join(broadcast(q), Seq("cell"))
        .where(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", cosine(col("qv"), col("cv")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 4).as("sim"))
    }

    /** The corpus duplicated into each row's `nProbe` NEAREST cells
      * (nProbe=1 degenerates to [[assigned]]'s single-cell view): the
      * multi-probe candidate assignment [[graft.ops.Dedup
      * .semanticNearDup]] scopes pairs with — a near-dup pair sitting
      * ON a cell boundary co-occurs in one of the two nearest cells
      * far more often than in the single nearest. Recomputed from the
      * persisted assignment (one O(nLists·dim) pass per row, no extra
      * shuffle); rows inflate nProbe-fold, so downstream pair volume
      * guards must run on THIS table, not on [[assigned]].
      */
    def multiAssigned(nProbe: Int): DataFrame =
      assigned.select(
        explode(transform(
          slice(sort_array(centroidDists(col("cv"), centroids)), 1, nProbe),
          s => s.getField("cid"))).as("cell"),
        col("neighbor_id"), col("cv"))

    def release(): Unit = { assigned.unpersist(); () }
  }

  /** (distance², centroid id) structs for every cell — the broadcast
    * centroid literals evaluated against one vector column.
    */
  private def centroidDists(
      vec: Column, centroids: Array[(Int, Array[Double])]): Column =
    array(centroids.map { case (i, c) =>
      val cLit = array(c.map(lit(_)).toIndexedSeq: _*)
      struct(
        aggregate(zip_with(vec, cLit, (x, y) => (x - y) * (x - y)),
          lit(0.0), (s, x) => s + x).as("d"),
        lit(i).as("cid"))
    }.toIndexedSeq: _*)

  /** Build the IVF index: fit the coarse quantizer on a SAMPLE of the
    * corpus (a quantizer needs only the density shape — fitting on
    * 100 TB would be absurd), then assign every corpus row to its
    * nearest centroid with a single `array_min` over the (dist, cid)
    * structs — one O(nLists·dim) pass per row, no per-row sort. The
    * assigned corpus is persisted: build once, probe many.
    */
  def ivfBuild(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int = 16,
      sampleFraction: Double = 1.0,
      seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val base = if (sampleFraction < 1.0) corpus.sample(sampleFraction, seed) else corpus
    val train = base.select(array_to_vector(asDouble(col(vecCol))).as("features"))
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(10).fit(train)
    val centroids: Array[(Int, Array[Double])] =
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val assigned = corpus.select(
      col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cell",
        array_min(centroidDists(col("cv"), centroids)).getField("cid"))
      .persist()
    IvfIndex(centroids, assigned)
  }

  /** One-call IVF ANN for the catalog: builds (or reuses — indexes are
    * cached per (table-plan, id, vec, nLists) within the session) and
    * probes. The lifecycle API is [[ivfBuild]]/[[IvfIndex.probe]].
    *
    * The cache is LRU-bounded at [[IvfCacheCap]] entries; an evicted
    * index's persisted assignment is released immediately, so a
    * long-lived session probing many distinct corpora never accumulates
    * persisted DataFrames (a prior unbounded map leaked them).
    */
  def ivfCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    ivfIndexFor(corpus, idCol, vecCol, nLists, seed)
      .probe(queries, idCol, vecCol, k, nProbe)
  }

  /** Build-or-reuse the IVF index for `corpus` from the session-scoped
    * LRU cache (shared with [[ivfCosineTopK]]; release-on-evict) — so
    * every consumer of the quantizer (ANN probe, semantic dedup) pays
    * the k-means fit and the persisted assignment once per corpus.
    */
  def ivfIndexFor(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      seed: Long = 42L): IvfIndex = {
    val key = (corpus.queryExecution.logical.semanticHash(), idCol, vecCol, nLists, seed)
    ivfCache.synchronized {
      val hit = ivfCache.get(key)
      if (hit != null) hit
      else {
        val built = ivfBuild(corpus, idCol, vecCol, nLists, seed = seed)
        ivfCache.put(key, built)
        built
      }
    }
  }

  /** Max distinct IVF indexes the one-call wrapper keeps persisted. */
  val IvfCacheCap = 4

  private type IvfKey = (Int, String, String, Int, Long)
  private val ivfCache =
    new java.util.LinkedHashMap[IvfKey, IvfIndex](16, 0.75f, true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[IvfKey, IvfIndex]): Boolean = {
        val evict = size() > IvfCacheCap
        if (evict) eldest.getValue.release()
        evict
      }
    }

  /** Visible for tests: number of live cached indexes. */
  private[graft] def ivfCacheSize: Int = ivfCache.synchronized(ivfCache.size())

  /** ANN top-k: `numTables` independent SRP bucketings; candidates are
    * corpus rows sharing any (table, bucket) with the query, re-ranked
    * by exact cosine. Shuffle cost is the (table, bucket) equi-join —
    * never the cross product — so recall/cost trades off via
    * (bitsPerTable, numTables) exactly like a production IVF/LSH index.
    */
  def lshCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      bitsPerTable: Int = 8,
      numTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val tables = (0 until numTables).map { t =>
      t -> hyperplanes(dim, bitsPerTable, seed + t)
    }
    def withBuckets(df: DataFrame, id: String, vecOut: String): DataFrame = {
      val v = asDouble(col(vecCol))
      df.select(
        col(idCol).as(id),
        v.as(vecOut),
        explode(array(tables.map { case (t, planes) =>
          struct(lit(t).as("tbl"), srpBucket(v, planes).as("bucket"))
        }: _*)).as("tb"))
    }
    val c = withBuckets(corpus, "neighbor_id", "cv")
    val q = withBuckets(queries, "query_id", "qv")
    val cand = c
      .join(q, Seq("tb"))
      .where(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }
}
