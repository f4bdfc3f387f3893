package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{DomainArchitecture, GeneTreeRep}

/** The reference's MAIN genes pipeline (SURVEY §3.1 — `search/
  * decorate.js` orchestrating `genetree_adder` + `domain_architect`)
  * composed end-to-end from this engine's operators over the test star
  * schema: one decorated document per gene, carrying
  *
  *  - the gene-tree representative decoration (T3/T4/T5 —
  *    [[GeneTreeRep.leafAttrs]] over the part-derived forest, exactly
  *    q44's construction), and
  *  - the domain-architecture summary (T12/T13/T15 —
  *    [[DomainArchitecture.clusters]] over lineitem-derived features
  *    keyed by part, then the roots string + cluster count per gene),
  *
  * joined on the gene id and serialized canonically.
  *
  * Scale shape: the tree stage shuffles once on tree id, the domain
  * stage once on (gene, root), the final assembly joins co-keyed on
  * the gene id — no broadcast of anything unbounded, no driver-side
  * loops; every stage is the same plan at 1000× the rows.
  */
object GenesPipeline {

  /** One decorated gene doc: tree decoration + domain summary. */
  def run(spark: SparkSession, dir: String): DataFrame = {
    // ---- stage 1: gene-tree representative decoration (q44's forest)
    import spark.implicits._
    val w = Window.partitionBy("treeId").orderBy("pk")
    val ranked = Tables.part(spark, dir)
      // DIV keying: bounded tree size, corpus-proportional tree count
      // (q44's scaffold note — a scaled corpus adds trees, real gene
      // families don't deepen with corpus size)
      .select(col("p_partkey").as("pk"),
        expr("p_partkey DIV 40").cast("long").as("treeId"))
      .withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("treeId")))
    val leaves = ranked.select(
      col("treeId"),
      (col("r") * 2).cast("long").as("id"),
      when(col("n") === 1, lit(-1L))
        .otherwise((least(col("r"), col("n") - 1) * 2 + 1).cast("long")).as("parent"),
      ((col("pk") % 5) * lit(0.25) + lit(0.25)).as("dist"),
      when(col("pk") % 17 === 0, lit(3702001L))
        .when(col("pk") % 5 === 0, lit(3702L))
        .otherwise(lit(4577L)).as("taxonId"),
      when(col("pk") % 3 === 0, concat(lit("AT"), col("pk")))
        .otherwise(concat(lit("G"), col("pk"))).as("geneId"),
      ((col("pk") % 9) * lit(25.0) - lit(110.0)).as("score"),
      lit(0.0).as("dupConf"))
    val internals = ranked.where(col("r") <= col("n") - 1).select(
      col("treeId"),
      (col("r") * 2 + 1).cast("long").as("id"),
      when(col("r") === 1, lit(-1L)).otherwise((col("r") * 2 - 1).cast("long")).as("parent"),
      ((col("r") % 3) * lit(0.5)).as("dist"),
      (lit(1000L) + col("r")).as("taxonId"),
      lit(null).cast("string").as("geneId"),
      lit(0.0).as("score"),
      when(col("r") % 4 === 0, lit(0.9)).otherwise(lit(0.2)).as("dupConf"))
    val treeDeco = GeneTreeRep
      .leafAttrs(leaves.unionByName(internals).as[GeneTreeRep.Node])
      .toDF()

    // ---- stage 2: domain architecture per gene (features keyed by part)
    val feats = Tables.lineitem(spark, dir).select(
      col("l_partkey").cast("long").as("geneId"),
      (col("l_linenumber") % 2).cast("long").as("root"),
      (col("l_suppkey") + 1).cast("long").as("ipr"),
      ((col("l_orderkey") % 40) * 25).cast("long").as("start"),
      ((col("l_orderkey") % 40) * 25 + 10 + (col("l_suppkey") % 30) * 10)
        .cast("long").as("end"))
      .as[DomainArchitecture.Feature]
    val clusters = DomainArchitecture.clusters(feats).toDF()
    val domainDeco = clusters.groupBy(col("gene_id").as("pk"))
      .agg(
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("c_start"), col("c_end"), col("root")))),
          x => x.getField("root").cast("string"))).as("domain_roots"),
        count(lit(1)).as("n_domain_clusters"))
      .select(
        when(col("pk") % 3 === 0, concat(lit("AT"), col("pk")))
          .otherwise(concat(lit("G"), col("pk"))).as("gene_id"),
        col("domain_roots"), col("n_domain_clusters"))

    // ---- stage 3: assembly + canonical serialization
    treeDeco
      .join(domainDeco, Seq("gene_id"), "left")
      .select(
        col("gene_id"),
        col("tree_id"),
        col("rep_score"),
        col("model_id"),
        col("closest_id"),
        concat_ws(",", transform(col("duplications"), x => x.cast("string")))
          .as("duplications"),
        coalesce(col("domain_roots"), lit("")).as("domain_roots"),
        coalesce(col("n_domain_clusters"), lit(0L)).as("n_domain_clusters"))
      .withColumn("doc_digest", md5(concat_ws("|",
        col("gene_id"), col("tree_id"),
        coalesce(col("rep_score").cast("string"), lit("")),
        coalesce(col("model_id"), lit("")),
        coalesce(col("closest_id"), lit("")),
        col("duplications"), col("domain_roots"),
        col("n_domain_clusters"))))
  }
}
