package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** All-Pairs Similarity Search over SPARSE vectors: the exact
  * cosine-threshold self-join with PREFIX FILTERING (after Bayardo,
  * Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007),
  * restated for a symmetric distributed join — the embedding analog of
  * [[Dedup.ngramJaccardPairs]]'s PPJoin plan.
  *
  * Pruning rule (provably exact): normalize each vector, let
  * `maxw(d)` = the corpus-wide max |weight| on dimension d. Each vector
  * independently DROPS its smallest-bound dims greedily while the
  * running sum of |w_i|·maxw(i) stays < t/2, and POSTS the rest to a
  * (dim → id) inverted index. If a pair shares no posted dim, every
  * common dim was dropped by one side or the other, so
  * `dot ≤ Σ_dropped(a) |a_i|·maxw(i) + Σ_dropped(b) |b_i|·maxw(i)
  * < t/2 + t/2 = t` — no qualifying pair is missed. (The t/2 split is
  * what makes the rule symmetric; Bayardo's full-t bound relies on a
  * sequential index-then-probe order that does not parallelize.)
  *
  * Candidates are the posted-dim equi-join — every shuffle is keyed by
  * dim then by id, nothing quadratic materializes — verified by the
  * exact sparse dot product. On DENSE unit vectors this degenerates
  * (every vector posts nearly every dim — see
  * [[Dedup.embeddingNearDupExact]]'s scaladoc); it prunes exactly where
  * real sparse data lives: TF-IDF bags, sparsified/top-m embeddings,
  * one-hot features.
  */
object Apss {

  /** Exact cosine ≥ `threshold` pairs over a sparse vector column
    * `termsCol: array<struct<dim: int, w: double-castable>>` (dims
    * unique per row; vectors need not be pre-normalized). Returns
    * (id_a, id_b, sim) with id_a < id_b, sim rounded to 4 decimals.
    */
  def cosinePairs(
      vecs: DataFrame,
      idCol: String,
      termsCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0, "prefix filtering needs a positive threshold")
    // normalize: cosine over raw weights == dot over unit vectors; the
    // norm is computed IN the projection (one narrow pass, no self-join)
    val normed = vecs.select(col(idCol).as("id"), col(termsCol).as("terms"))
      .withColumn("nrm",
        sqrt(aggregate(col("terms"), lit(0.0),
          (s, t) => s + t.getField("w").cast("double") * t.getField("w").cast("double"))))
      .where(col("nrm") > 0)
      .select(col("id"),
        transform(col("terms"), t => struct(
          t.getField("dim").as("dim"),
          (t.getField("w").cast("double") / col("nrm")).as("wn"))).as("terms"))

    // corpus-wide max |weight| per dim, collapsed to ONE broadcast map
    // row — so the per-vector posting decision below runs as narrow
    // array expressions with no window and no per-vector shuffle
    val maxwMap = normed
      .select(explode(col("terms")).as("t"))
      .groupBy(col("t.dim").as("dim")).agg(max(abs(col("t.wn"))).as("maxw"))
      .agg(map_from_entries(collect_list(struct(col("dim"), col("maxw")))).as("mw"))

    // greedy drop, per row: ascending by the bound contribution
    // |wn|·maxw(dim) (ties to the lower dim), drop while the running
    // sum INCLUDING the current term stays < t/2; POST everything from
    // the crossing term on. One aggregate over a bounded array.
    val half = threshold / 2
    val perVec = normed.join(broadcast(maxwMap))
      .select(
        col("id"),
        map_from_entries(col("terms")).as("m"),
        aggregate(
          array_sort(transform(col("terms"), t => struct(
            (abs(t.getField("wn")) * element_at(col("mw"), t.getField("dim")))
              .as("contrib"),
            t.getField("dim").as("dim")))),
          struct(lit(0.0).as("cum"),
            array().cast("array<int>").as("dims")),
          (acc, x) => {
            val cum = acc.getField("cum") + x.getField("contrib")
            struct(
              cum.as("cum"),
              when(cum >= half,
                array_append(acc.getField("dims"), x.getField("dim")))
                .otherwise(acc.getField("dims")).as("dims"))
          },
          acc => acc.getField("dims")).as("posted"))

    // candidate pairs meet on a shared posted dim — the ONLY wide key
    // in candidate generation is the dim itself
    val posted = perVec.select(col("id"), explode(col("posted")).as("dim"))
    val candidates = posted.as("pa")
      .join(posted.as("pb"), col("pa.dim") === col("pb.dim"))
      .where(col("pa.id") < col("pb.id"))
      .select(col("pa.id").as("id_a"), col("pb.id").as("id_b"))
      .distinct()

    // exact verify: sparse dot via map lookup (per-candidate O(nnz(a))).
    // perVec's lineage is replayed per consumer (cheap: scan + narrow
    // ops + one tiny broadcast); at corpus scale persist/checkpoint the
    // perVec index once and probe it many times, like [[Similarity
    // .ivfBuild]].
    candidates
      .join(perVec.select(col("id").as("id_a"), col("m").as("ma")), "id_a")
      .join(perVec.select(col("id").as("id_b"), col("m").as("mb")), "id_b")
      .withColumn("sim",
        aggregate(map_entries(col("ma")), lit(0.0),
          (s, e) => s + e.getField("value") *
            coalesce(element_at(col("mb"), e.getField("key")), lit(0.0))))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** Deterministic top-`m`-by-magnitude sparsification of a dense
    * `array<float/double>` column into the sparse `(dim, w)` form
    * [[cosinePairs]] consumes — dims are 1-based, ties break on the
    * lower dim. The standard cheap sparsifier for embedding near-dup
    * at corpus scale (per-row, no shuffle).
    */
  def sparsifyTopM(vec: Column, m: Int): Column = {
    val indexed = zip_with(
      vec.cast("array<double>"),
      // sequence(1, 0) would count DOWN — empty arrays need the guard
      when(size(vec) > 0, sequence(lit(1), size(vec))).otherwise(array()),
      (w, i) => struct(
        (-abs(w)).as("negabs"), i.as("dim"), w.as("w")))
    transform(
      slice(array_sort(indexed), 1, m),
      t => struct(t.getField("dim").as("dim"), t.getField("w").as("w")))
  }
}
