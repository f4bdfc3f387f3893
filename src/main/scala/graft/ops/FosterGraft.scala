package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Foster grafting — the reference's taxonomy repair for genomes whose
  * NCBI taxon id is missing from the pruned tree
  * (`ontologies/filter_taxonomy2.js:141-199`): a missing desired id
  * that looks like a synthesized genome id (`/([0-9]*)0[0-9][0-9]$/`,
  * i.e. its hundreds digit is 0) names its SIBLING (the captured
  * prefix = id div 1000); the missing genome is grafted as a foster
  * child of that sibling's parent — cloning the parent's lineage, then
  * appending itself — and its gene count rolls up into every lineage
  * ancestor.
  *
  * Spark restatement: the taxonomy is a dimension (≤ a few 100k rows)
  * and is BROADCAST into every join; the desired-genome side streams.
  * The rollup is an explode-ancestors + aggregate, the distributed form
  * of the reference's `nGenes[a] += nGenes[id]` loop.
  *
  * Faithfulness notes (pinned in FosterGraftSpec):
  *  - sibling derivation requires the hundreds digit to be zero, else
  *    the id has "no matches" and nothing is grafted. The reference
  *    then accidentally reuses the PREVIOUS loop iteration's foster
  *    parent (`fosterParent` is a shared mutable var) — we drop the
  *    node instead (the evident intent; documented deviation).
  *  - the graft clones the foster PARENT's node: `is_a` = foster
  *    parent, ancestors = parent's ancestors ++ [own id], rank becomes
  *    species (`filter_taxonomy2.js:170-177`).
  *  - gene-count rollup targets the PARENT's lineage (the clone's
  *    ancestors BEFORE the self-append, `filter_taxonomy2.js:183-186`),
  *    so a fostered genome's count surfaces in every desired ancestor.
  *
  * @param taxonomy columns (id, parent, ancestors: array<long>
  *                 root-first INCLUDING self, name)
  * @param desired  columns (id, display_name, n_genes)
  * @return one row per desired id resolvable in the (possibly grafted)
  *         taxonomy: id, is_a, ancestors, name, fostered, num_genes
  */
object FosterGraft {

  def graft(taxonomy: DataFrame, desired: DataFrame): DataFrame = {
    // the dimension feeds FOUR broadcast sides below, and each
    // broadcast build is a distinct projection (no exchange reuse), so
    // an un-staged taxonomy replays its scan + lineage-array build per
    // side — materialize it once, dimension-sized. The desired side is
    // the one that streams at scale and is deliberately NOT staged.
    val tax = broadcast(_root_.graft.core.StagingScope.stage(taxonomy))
    val present = desired.join(tax, Seq("id"))
      .select(col("id"), col("parent").as("is_a"), col("ancestors"),
        col("name"), lit(false).as("fostered"), col("n_genes"))

    // missing ids: derive the sibling, hop to its parent, clone lineage
    // — consumed TWICE below (the fostered rows and the lineage
    // rollup); staged so the anti-join + two sibling hops run once.
    // Size is the fostered-genome set: a repair queue, not a corpus.
    val missing = _root_.graft.core.StagingScope.stage(
      desired.join(tax.select(col("id")), Seq("id"), "left_anti")
      .withColumn("sib",
        when(expr("(id div 100) % 10") === 0, expr("id div 1000")))
      .join(tax.select(col("id").as("sib"), col("parent").as("fp")), Seq("sib"))
      .join(tax.select(col("id").as("fp"), col("ancestors").as("fp_ancestors")), Seq("fp")))
    val fostered = missing.select(
      col("id"), col("fp").as("is_a"),
      concat(col("fp_ancestors"), array(col("id"))).as("ancestors"),
      col("display_name").as("name"), lit(true).as("fostered"), col("n_genes"))

    // rollup: each fostered genome adds its count to the foster
    // parent's whole lineage (NOT to itself — the reference rolls up
    // before appending self)
    val adds = missing
      .select(explode(col("fp_ancestors")).as("id"), col("n_genes"))
      .groupBy("id")
      .agg(sum("n_genes").as("foster_genes"))

    present.unionByName(fostered)
      .join(adds, Seq("id"), "left")
      .withColumn("num_genes",
        col("n_genes") + coalesce(col("foster_genes"), lit(0L)))
      .drop("n_genes", "foster_genes")
  }
}
