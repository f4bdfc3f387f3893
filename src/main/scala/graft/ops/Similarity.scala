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
        val planeLit = array(p.map(lit(_)): _*)
        val dot = aggregate(zip_with(vec, planeLit, (x, y) => x * y), lit(0.0), (s, x) => s + x)
        when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ bitwiseOR _)

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nLists` cells; each query probes its `nProbe` nearest
    * centroids and exact-reranks only those cells — the classic
    * IVF-Flat index expressed relationally: the "inverted lists" are
    * just the corpus DataFrame keyed by cluster id, so the probe is an
    * equi-join on cluster id (hash join, never a cross product). Recall
    * rises with nProbe; cost is |corpus|·nProbe/nLists per query.
    * Centroids are fit with spark.ml KMeans (fixed seed) on the corpus
    * (or a sample at scale) and broadcast for assignment.
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
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    val train = corpus.select(array_to_vector(asDouble(col(vecCol))).as("features"))
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(10).fit(train)
    val centroids: Array[(Int, Array[Double])] =
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }

    // nearest-centroid assignment / probing as column expressions over
    // the broadcast centroid literals (L2, matching KMeans objective)
    def dist2(vec: Column, c: Array[Double]): Column = {
      val cLit = array(c.map(lit(_)).toIndexedSeq: _*)
      aggregate(zip_with(vec, cLit, (x, y) => (x - y) * (x - y)), lit(0.0), (s, x) => s + x)
    }
    def centroidRank(vec: Column): Column =
      sort_array(array(centroids.map { case (i, c) =>
        struct(dist2(vec, c).as("d"), lit(i).as("cid"))
      }.toIndexedSeq: _*))

    val c = corpus.select(
      col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", element_at(centroidRank(col("cv")), 1).getField("cid"))
    val q = queries.select(
      col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("cell",
        explode(transform(
          slice(centroidRank(col("qv")), 1, nProbe), s => s.getField("cid"))))

    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(q, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

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
