package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Closure
import graft.sources.StanzaReader

/** End-to-end ontology ingest (SURVEY §3.3): OBO stanza file → term
  * docs with materialized ancestor closures and subtree gene-count
  * rollups — the engine's restatement of `ontologies/populate.js` →
  * `obo2json.pl` → mongoimport, as one DataFrame program:
  *
  *   stanzas (S7) → terms + is_a edges → transitive closure (T9) →
  *   ancestors arrays + descendant counts (A8) → canonical term docs.
  *
  * Scale: the stanza read is split-safe (lineSep framing), the closure
  * is the log-depth fixpoint, and both decorations are joins against
  * the closure table — nothing recursive at query time.
  */
object OntologyPipeline {

  /** One row per `[Term]`: id, name, synonyms, is_obsolete, sorted
    * ancestor array, number of descendants.
    */
  def terms(spark: SparkSession, oboPath: String): DataFrame = {
    val stanzas = StanzaReader.read(spark, oboPath)
    val base = stanzas.select(
      col("id"),
      StanzaReader.firstOf(col("kv"), "name").as("name"),
      StanzaReader.valuesOf(col("kv"), "synonym").as("synonyms"),
      coalesce(StanzaReader.firstOf(col("kv"), "is_obsolete") === "true", lit(false))
        .as("is_obsolete"))
    val closure = Closure.transitiveClosure(StanzaReader.edges(stanzas))

    val ancestors = closure
      .groupBy(col("node").as("id"))
      .agg(sort_array(collect_list(col("ancestor"))).as("ancestors"))
    val descendants = closure
      .groupBy(col("ancestor").as("id"))
      .agg(count(lit(1)).as("n_descendants"))

    base
      .join(ancestors, Seq("id"), "left")
      .join(descendants, Seq("id"), "left")
      .select(
        col("id"),
        col("name"),
        col("synonyms"),
        col("is_obsolete"),
        coalesce(col("ancestors"), array().cast("array<string>")).as("ancestors"),
        coalesce(col("n_descendants"), lit(0L)).as("n_descendants"))
  }

  /** Canonical JSON export (nulls/empties pruned), one doc per term. */
  def json(spark: SparkSession, oboPath: String): DataFrame = {
    val t = terms(spark, oboPath)
    graft.ops.DocMerge.pruneEmpty(t).select(
      col("id"),
      to_json(
        struct(t.columns.filter(_ != "id").map(col).toIndexedSeq: _*),
        java.util.Collections.singletonMap("ignoreNullFields", "true")).as("doc"))
  }
}
