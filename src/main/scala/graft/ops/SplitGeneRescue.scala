package graft.ops

import org.apache.spark.sql.Dataset

/** Split-gene rescue — the reference's gene_split homology filter
  * (`search/dump_homologs.js:7-12,66-84,176-205`): a candidate split
  * pair survives only when the two fragments barely overlap in the MSA
  * AND sit close together on the same strand with almost nothing
  * between them.
  *
  * Spark restatement: gene order is a per-(dnafrag, strand) ranking
  * (the reference's `gene_idx`/`gene_ranges` arrays built from one
  * sorted scan); pairs and genes COGROUP on that key, so each task
  * holds exactly one chromosome-strand's gene array — bounded, like
  * the reference's in-memory per-key arrays — while chromosomes spread
  * across the cluster. One shuffle per side, no broadcast of the whole
  * genome.
  *
  * Faithfulness notes (pinned in SplitGeneRescueSpec):
  *  - thresholds ARE the reference constants: ppos strictly below 10
  *    on BOTH sides; no-overlap (both ppos 0) allows
  *    `maxNbNoOverlap + 2` genes in the walk and ≤ 1 Mb start distance;
  *    small overlap allows `maxNbSmallOverlap + 2` and ≤ 500 kb on both
  *    start AND end distances.
  *  - `count_genes_between` walks UP from the lower-indexed gene while
  *    gene ends are ≤ the higher gene's end — the walk STOPS at the
  *    first overshooting gene but happily counts genes PAST the higher
  *    one (`dump_homologs.js:79-82`). Replicated as-is.
  *  - genes on different fragments/strands (or unknown ids) tally
  *    10000 (`dump_homologs.js:67`), failing every gate.
  */
object SplitGeneRescue {

  /** One positioned gene: `frag`/`strand` locate it, `start`/`end` are
    * its dnafrag coordinates.
    */
  case class Gene(frag: Long, strand: Long, geneId: Long, start: Long, end: Long)

  /** One candidate split pair keyed by the first gene's location;
    * `genePpos`/`otherPpos` are the MSA percent-positives of each side.
    */
  case class Pair(
      pairId: Long, frag: Long, strand: Long,
      geneId: Long, otherId: Long, genePpos: Double, otherPpos: Double)

  /** The rescue decision with its evidence. */
  case class Decision(
      pair_id: Long, gene_id: Long, other_id: Long,
      n_between: Long, rescued: Boolean)

  def rescue(
      genes: Dataset[Gene],
      pairs: Dataset[Pair],
      maxDistNoOverlap: Long = 1000000L,
      maxNbNoOverlap: Long = 1L,
      maxDistSmallOverlap: Long = 500000L,
      smallOverlapPct: Double = 10.0,
      maxNbSmallOverlap: Long = 0L): Dataset[Decision] = {
    import genes.sparkSession.implicits._
    genes
      .groupByKey(g => (g.frag, g.strand))
      .cogroup(pairs.groupByKey(p => (p.frag, p.strand))) { (_, gIt, pIt) =>
        val ranked = gIt.toArray.sortBy(g => (g.start, g.end, g.geneId))
        val idx: Map[Long, Int] =
          ranked.iterator.zipWithIndex.map { case (g, i) => g.geneId -> i }.toMap
        pIt.map { p =>
          val (tally, coords) = (idx.get(p.geneId), idx.get(p.otherId)) match {
            case (Some(a), Some(b)) =>
              val lo = math.min(a, b)
              val hi = math.max(a, b)
              val endpoint = ranked(hi).end
              var i = lo
              var t = 0L
              while (i < ranked.length && ranked(i).end <= endpoint) {
                t += 1
                i += 1
              }
              (t, Some((ranked(idx(p.geneId)), ranked(idx(p.otherId)))))
            case _ => (10000L, None)
          }
          val rescued = coords.exists { case (g, o) =>
            p.genePpos < smallOverlapPct && p.otherPpos < smallOverlapPct && {
              if (p.genePpos == 0 && p.otherPpos == 0)
                tally <= maxNbNoOverlap + 2 &&
                  math.abs(g.start - o.start) <= maxDistNoOverlap
              else
                tally <= maxNbSmallOverlap + 2 &&
                  math.abs(g.start - o.start) <= maxDistSmallOverlap &&
                  math.abs(g.end - o.end) <= maxDistSmallOverlap
            }
          }
          Decision(p.pairId, p.geneId, p.otherId, tally, rescued)
        }
      }
  }
}
