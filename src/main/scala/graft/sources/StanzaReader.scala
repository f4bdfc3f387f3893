package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for stanza-structured text (the OBO ontology shape parsed by
  * the reference's Perl `ontologies/obo2json.pl:8-94`): records are
  * blank-line-separated stanzas of `key: value` lines; some keys may
  * repeat (multivalued — the reference whitelists them at :8-23).
  *
  * Spark-first design: `spark.read.option("lineSep", "\n\n")` makes the
  * STANZA the record unit at the source, so splits never cut a stanza
  * and parsing is a per-row column expression (codegen'd split +
  * higher-order functions, no UDF, no driver-side parse) — this scales
  * to ontologies of any size and stays a narrow pipeline stage.
  */
object StanzaReader {

  /** Read stanzas of `stanzaType` (e.g. "Term") from `path`. Output
    * columns: `id` (from the id key, with the reference's int coercion
    * available via [[idToInt]]), `kv` — array of (key, value) structs in
    * file order (multivalued keys preserved).
    */
  def read(spark: SparkSession, path: String, stanzaType: String = "Term"): DataFrame = {
    val header = lit(s"[$stanzaType]")
    spark.read.option("lineSep", "\n\n").text(path)
      .select(filter(split(col("value"), "\n"), l => l =!= "").as("lines"))
      .where(size(col("lines")) > 0 && element_at(col("lines"), 1) === header)
      .select(
        transform(
          slice(col("lines"), lit(2), size(col("lines")) - 1),
          l => struct(
            trim(substring_index(l, ":", 1)).as("key"),
            trim(regexp_replace(l, "^[^:]*:", "")).as("value"))).as("kv"))
      .select(
        try_element_at(filter(col("kv"), e => e.getField("key") === "id"), lit(1))
          .getField("value").as("id"),
        col("kv"))
  }

  /** Values for one (possibly multivalued) key, in file order. */
  def valuesOf(kv: org.apache.spark.sql.Column, key: String): org.apache.spark.sql.Column =
    transform(
      filter(kv, e => e.getField("key") === key),
      e => e.getField("value"))

  /** First value of a key, null when absent. */
  def firstOf(kv: org.apache.spark.sql.Column, key: String): org.apache.spark.sql.Column =
    try_element_at(valuesOf(kv, key), lit(1))

  /** The reference's id normalization (`ontologies/obo2json.pl:48-56`,
    * `search/ancestor_adder.js:46`): `GO:0001234` -> 1234 (int from the
    * digits after the prefix).
    */
  def idToInt(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    nullif(regexp_extract(id, "^[A-Za-z_]+:0*(\\d+)$", 1), lit("")).cast("long")

  /** Parse `is_a: TARGET ! comment` relationship values into target ids
    * (comment after `!` stripped) — the edge list that feeds
    * [[graft.ops.Closure.transitiveClosure]].
    */
  def edges(df: DataFrame, relKey: String = "is_a"): DataFrame =
    df.select(
      col("id").as("child"),
      explode(valuesOf(col("kv"), relKey)).as("raw"))
      .select(col("child"), trim(substring_index(col("raw"), "!", 1)).as("parent"))
}
