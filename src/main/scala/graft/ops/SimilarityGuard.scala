package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight candidate-volume guard for the EXACT similarity joins
  * ([[Dedup.ngramJaccardPairs]], [[Decontaminate.jaccardScreen]], the
  * [[Apss]] entries).
  *
  * Why: prefix/posting filtering bounds candidate volume only when the
  * rare end of the vocabulary stays rare as the corpus grows (Heaps'-
  * law growth — true of natural corpora). On a CLOSED vocabulary the
  * candidate stage scales as Σ df² over the prefix grams — the 100×
  * scale audit (NOTES_r7) measured ~10⁹ candidates for ~8k true pairs,
  * and no exact plan avoids touching every co-occurring pair. Through
  * round 8 that finding was documentation only: the engine would still
  * launch the doomed join. The reference's analog is a hard size bound
  * pushed into the candidate query itself (`search/dump_homologs.js:20`
  * caps the id range a single dump walks); ours is computed from the
  * data: the prefix/posting tables the joins are built from already
  * carry exactly the per-gram document frequencies needed to PREDICT
  * the candidate volume with one cheap aggregation, so the engine can
  * refuse a quadratic-regime launch up front — minutes of cluster time
  * and a clear message instead of a disk-filling shuffle.
  *
  * The caps are per-call-site overridable; `Long.MaxValue` opts out.
  * The refusal names the measured volume and the documented re-route
  * (the LSH screens, whose candidate volume is driven by signature
  * collisions ∝ true similarity, not gram frequency).
  */
object SimilarityGuard {

  /** Refusal carries the numbers so an operator can decide to re-route
    * or consciously raise the cap.
    */
  final class CandidateVolumeExceeded(
      val predicted: Long,
      val cap: Long,
      site: String,
      reroute: String)
    extends RuntimeException(
      s"$site: predicted exact-join candidate volume $predicted exceeds cap $cap. " +
        s"This corpus is in the closed-vocabulary / high-df regime where prefix " +
        s"filtering cannot prune (candidates scale as sum(df^2), independent of " +
        s"true-pair count). $reroute, or raise maxCandidates explicitly if the " +
        s"volume is intended.")

  /** Default cap: generous for any corpus where prefix filtering works
    * (the sf0.1 bench's df-heavy synthetic corpus predicts ~3 orders
    * of magnitude below it — see GuardProbe in tools), refused well
    * before the 100× audit's measured ~10⁹-candidate blow-up.
    */
  val DefaultMaxCandidates: Long = 200L * 1000 * 1000

  /** Predicted candidate volume of a SELF equi-join on `keys`:
    * Σ over key of df·(df−1)/2 — the join rows surviving the
    * id_a &lt; id_b half-plane (a pair meeting on k shared keys counts
    * k times: this is the WORK the candidate stage performs, which is
    * what must stay bounded). One aggregation over the (already
    * materialized) prefix table — O(|prefixes|), vs the join it
    * guards being O(result).
    */
  def selfJoinVolume(prefixes: DataFrame, keys: Seq[String]): Long =
    prefixes.groupBy(keys.map(col): _*).agg(count(lit(1)).as("df"))
      // DIV, not "/": Spark's "/" on longs is double division, and the
      // caller reads a Long
      .agg(coalesce(sum(expr("df * (df - 1) DIV 2")), lit(0L)))
      .head().getLong(0)

  /** Predicted candidate volume of a CROSS equi-join on `keys`:
    * Σ over key of df_a·df_b.
    */
  def crossJoinVolume(a: DataFrame, b: DataFrame, keys: Seq[String]): Long = {
    def dfs(t: DataFrame, name: String) =
      t.groupBy(keys.map(col): _*).agg(count(lit(1)).as(name))
    dfs(a, "dfa").join(dfs(b, "dfb"), keys)
      .agg(coalesce(sum(col("dfa") * col("dfb")), lit(0L)))
      .head().getLong(0)
  }

  def check(predicted: Long, cap: Long, site: String, reroute: String): Unit =
    if (predicted > cap)
      throw new CandidateVolumeExceeded(predicted, cap, site, reroute)
}
