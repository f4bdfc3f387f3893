package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics

/** Document deduplication at pretraining-corpus scale: exact, MinHash+LSH
  * near-dup, SimHash, and n-gram Jaccard. All hash functions are Spark's
  * native codegen'd `xxhash64`/`hash`/`md5` — deterministic across runs
  * and executors, no UDFs — so every stage is shuffle-bounded by design:
  * exact dedup is one groupBy on the content hash; MinHash-LSH shuffles
  * once on (band, bucket) instead of ever forming the O(n^2) pair space.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the lowest id as the
    * canonical representative. One shuffle on a 128-bit key — works
    * unchanged at 100 TB (the hash groupBy is the classic exact-dedup
    * plan; no row content travels beyond the hash + id).
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** k-permutation MinHash signature over n-token shingles. Each
    * "permutation" i is xxhash64 seeded by i (mixed in as a literal
    * column); the signature element is the min hash over the shingle
    * set. Pure column expressions — evaluated row-local, no shuffle.
    */
  def minHashSignature(text: Column, shingleN: Int, numHashes: Int): Column = {
    val sh = TextAnalytics.shingles(text, shingleN)
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)
  }

  /** MinHash-LSH candidate pairs: signatures are cut into `bands` bands
    * of `rowsPerBand` hashes; docs sharing any (band, band-hash) bucket
    * become a candidate pair, then candidates are verified with the
    * exact Jaccard over shingle sets. The only shuffles are the bucket
    * groupBy-style self-join and the final distinct — the all-pairs
    * space is never materialized, which is what makes this viable on
    * billions of documents.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minHashLsh(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = docs.select(
      col(idCol).as("id"),
      TextAnalytics.shingles(col(textCol), shingleN).as("sh"),
      minHashSignature(col(textCol), shingleN, numHashes).as("sig"))

    val buckets = sigs.select(
      col("id"),
      col("sh"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
      }: _*)).as("bb"))

    val a = buckets.select(col("bb").as("bb"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = buckets.select(col("bb").as("bb"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a
      .join(b, Seq("bb"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** All-pairs n-gram Jaccard within a blocking key (reference-style
    * "per (map, region) interval set" blocking, here e.g. per language):
    * the self-join is equi on the block key so Catalyst hash-joins and
    * the quadratic blow-up is bounded per block — the practical shape
    * for "compare within shard" near-dup sweeps.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      shingleN: Int,
      threshold: Double): DataFrame = {
    val sh = docs.select(
      col(blockCol).as("block"),
      col(idCol).as("id"),
      TextAnalytics.shingles(col(textCol), shingleN).as("sh"))
    val a = sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash fingerprint per document: every token votes +1/-1 on
    * each of the 64 bits of its xxhash64; positive sums set the bit.
    * Implemented explode -> 64 conditional sums -> bit assembly, i.e.
    * one shuffle on the doc id with map-side partial aggregation.
    */
  def simHash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = docs.select(
      col(idCol).as("id"),
      explode(TextAnalytics.tokens(col(textCol))).as("tok"))
    val h = tok.withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"b$b")
    }
    val summed = h.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    summed.select(col("id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: block on 16-bit fingerprint chunks (two
    * near-identical docs differing in <= 3 bits must agree on at least
    * one of the 4 chunks), then verify with exact Hamming distance.
    */
  def simHashPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunks = fps.select(
      col("id"),
      col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          col("simhash").bitwiseAND(lit(0xFFFFL << (c * 16))).as("val"))
      }: _*)).as("ck"))
    val a = chunks.select(col("ck"), col("id").as("id_a"), col("simhash").as("fp_a"))
    val b = chunks.select(col("ck"), col("id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("ck"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
