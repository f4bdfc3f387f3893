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
  * The default cap is AUTO: `max(floor, perDoc · corpusSize)` — scale-
  * free, so a launch whose per-document amplification is constant (the
  * linear regime prefix filtering is designed for) passes at any
  * corpus size, while a closed vocabulary's per-doc volume grows with
  * the corpus and refuses past the budget. An explicit positive
  * `maxCandidates` is a hard cap; `Long.MaxValue` opts out. The
  * refusal names the measured volume and the documented re-route (the
  * LSH screens, whose candidate volume is driven by signature
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

  /** Sentinel for the default `maxCandidates` parameter: resolve the
    * cap from corpus size ([[autoCap]]). An explicit positive value is
    * a hard cap.
    */
  val Auto: Long = 0L

  /** Auto-mode per-document candidate budget. Calibrated on the
    * driver's df-heavy synthetic corpus — the heaviest gated workload
    * (q63's TF-IDF posting join) runs ~12k join rows per doc at ANY
    * scale of that corpus, and the 100× audit's exact screens hold
    * per-doc volume constant (tagged copies keep dfs disjoint), so
    * 20k/doc passes every same-workload-bigger launch while a closed
    * vocabulary (per-doc volume ∝ corpus size) still crosses it and
    * refuses once the corpus outgrows the floor.
    */
  val DefaultPerDocCandidates: Double = 20000.0

  /** Auto-mode floor: corpora small enough that even a quadratic
    * candidate stage is cheap never refuse — the guard exists to stop
    * cluster-scale blow-ups, not unit tests.
    */
  val DefaultFloor: Long = 50L * 1000 * 1000

  /** The auto cap: scale-free in corpus size, so a workload whose
    * per-doc amplification is constant (the linear regime prefix
    * filtering is designed for) passes at ANY scale — the round-9
    * 100× audit measured q22 at 406M predicted rows on 500k docs
    * (812/doc, identical to its sf0.1 ratio) and the earlier absolute
    * default wrongly refused it. Quadratic regimes grow per-doc volume
    * with the corpus and cross the per-doc budget instead.
    */
  def autoCap(nDocs: Long): Long =
    math.max(DefaultFloor, (DefaultPerDocCandidates * nDocs).toLong)

  def resolveCap(maxCandidates: Long, nDocs: => Long): Long =
    if (maxCandidates > 0) maxCandidates else autoCap(nDocs)

  /** Predicted candidate volume of a SELF equi-join on `keys`:
    * Σ over key of df·(df−1)/2 — the join rows surviving the
    * id_a &lt; id_b half-plane (a pair meeting on k shared keys counts
    * k times: this is the WORK the candidate stage performs, which is
    * what must stay bounded). One aggregation over the (already
    * materialized) prefix table — O(|prefixes|), vs the join it
    * guards being O(result).
    */
  /** Saturating double→Long: volumes near/over 2⁶³ mean "refuse" — a
    * silent Long wrap would flip `predicted > cap` to false in exactly
    * the catastrophic regime the guard exists for. Doubles lose ULP
    * precision above 2⁵³, irrelevant for a threshold comparison.
    */
  private def toVolume(d: Double): Long =
    if (d >= Long.MaxValue.toDouble) Long.MaxValue else d.toLong

  def selfJoinVolume(prefixes: DataFrame, keys: Seq[String]): Long =
    toVolume(prefixes.groupBy(keys.map(col): _*).agg(count(lit(1)).as("df"))
      // double arithmetic: df ~1e9 makes df² overflow Long per-key
      .agg(coalesce(sum(expr("CAST(df AS DOUBLE) * (df - 1) / 2")), lit(0.0)))
      .head().getDouble(0))

  /** Predicted candidate volume of a CROSS equi-join on `keys`:
    * Σ over key of df_a·df_b.
    */
  def crossJoinVolume(a: DataFrame, b: DataFrame, keys: Seq[String]): Long = {
    def dfs(t: DataFrame, name: String) =
      t.groupBy(keys.map(col): _*).agg(count(lit(1)).as(name))
    toVolume(dfs(a, "dfa").join(dfs(b, "dfb"), keys)
      .agg(coalesce(sum(col("dfa").cast("double") * col("dfb")), lit(0.0)))
      .head().getDouble(0))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Monotonic launch counter: CollectMetrics names must be unique
    * within one query plan, and a composed pipeline (q72) embeds
    * several guarded launches.
    */
  private val launchSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Production telemetry for every guarded launch: wrap the candidate
    * stream in a `Dataset.observe` (CollectMetrics) node named
    * `graft.similarity.<site>#<k>` carrying the ACTUAL candidate rows
    * next to the volume the guard PREDICTED. The pre-flight check
    * refuses obvious blow-ups; this makes the predictor's calibration
    * observable in flight — an operator (or a QueryExecutionListener)
    * watching actual/predicted drift toward 1 sees the df regime
    * shifting before the first refusal, with no extra job, shuffle, or
    * action (the metric aggregates ride the existing partition pass).
    * `actual` counts rows AFTER the join's fused static prunes
    * (positional filters, id ordering), so actual ≤ predicted always;
    * APSS/SemDeDup launches carry no post-key prune and sit at
    * equality (property-pinned in SimilarityGuardSpec).
    */
  def observed(candidates: DataFrame, site: String, predicted: Long): DataFrame =
    candidates.observe(
      s"graft.similarity.$site#${launchSeq.incrementAndGet()}",
      count(lit(1)).as("actual_candidates"),
      max(lit(predicted)).as("predicted_candidates"))

  def check(predicted: Long, cap: Long, site: String, reroute: String): Unit = {
    // allowed launches log their headroom at INFO: at cluster scale an
    // operator watching the ratio creep toward 1 sees the df regime
    // shifting BEFORE the first refusal
    log.info(s"$site: predicted candidate volume $predicted / cap $cap " +
      f"(${predicted.toDouble / cap}%.3f of budget)")
    if (predicted > cap)
      throw new CandidateVolumeExceeded(predicted, cap, site, reroute)
  }
}
