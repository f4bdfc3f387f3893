package graft

import org.apache.spark.sql.functions._
import graft.pipelines.GenesPipeline

/** The composed genes pipeline (SURVEY §3.1): coverage, emission
  * invariants, cross-stage join integrity, and run-to-run determinism
  * of the canonical digests on the real test tables.
  */
class GenesPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = GenesPipeline.run(spark, "/root/testdata/sf0.001").cache()

  test("one document per gene (part), no duplicates") {
    val nParts = graft.core.Tables.part(spark, "/root/testdata/sf0.001").count()
    assert(out.count() === nParts)
    assert(out.select("gene_id").distinct().count() === nParts)
  }

  test("emission invariants: represented genes carry model/closest per the rules") {
    // rep assigned → model_id or closest_id present (self-rep carries
    // model, overridden leaves carry closest)
    val bad = out.where(col("rep_score").isNotNull &&
      col("model_id").isNull && col("closest_id").isNull).count()
    assert(bad === 0)
    // no rep → neither decoration
    val bad2 = out.where(col("rep_score").isNull &&
      (col("model_id").isNotNull || col("closest_id").isNotNull)).count()
    assert(bad2 === 0)
    // both decorated and undecorated genes exist in the corpus
    assert(out.where(col("rep_score").isNotNull).count() > 0)
    assert(out.where(col("rep_score").isNull).count() > 0)
  }

  test("domain stage joins: every gene appearing in lineitem has clusters") {
    val genesWithItems = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey").cast("long")).distinct().count()
    val decorated = out.where(col("n_domain_clusters") > 0).count()
    assert(decorated === genesWithItems)
    // roots string arity matches the cluster count
    val mismatched = out.where(col("n_domain_clusters") > 0 &&
      size(split(col("domain_roots"), " ")) =!= col("n_domain_clusters")).count()
    assert(mismatched === 0)
  }

  test("canonical digests are bit-stable across independent runs") {
    val a = out.select("gene_id", "doc_digest").as[(String, String)].collect().toMap
    val b = GenesPipeline.run(spark, "/root/testdata/sf0.001")
      .select("gene_id", "doc_digest").as[(String, String)].collect().toMap
    assert(a === b)
  }
}
