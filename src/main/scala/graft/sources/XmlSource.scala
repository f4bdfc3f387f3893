package graft.sources

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6 — XML ingestion. The reference parses InterPro's `interpro.xml`
  * and Reactome exports with an in-process XML-to-JS parser
  * (`ontologies/parseInterpro.js:50-70`,
  * `reactome/extract_docs_from_reactome.js:17`). Two Spark paths:
  *
  *  - [[read]]: Spark 4's built-in `xml` data source — the DISTRIBUTED
  *    path for row-oriented XML at scale (splittable by rowTag, schema
  *    inference, predicate pushdown downstream of the scan).
  *  - [[interpro]]: a dependency-free driver-side parse (scala-xml ships
  *    with Spark) → `createDataFrame`. Ontology files are dimension-
  *    sized (MBs) — parsing them on the driver and broadcasting the
  *    result is the right cluster shape; streaming 100 TB through this
  *    path would be wrong, and that path is [[read]].
  */
object XmlSource {

  /** Distributed XML scan: one row per `rowTag` element, attributes
    * surfaced with the `_` prefix (the data source's default).
    */
  def read(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read.format("xml").option("rowTag", rowTag).load(path)

  private val digits: Regex = "\\d+".r

  /** InterPro entries in the reference's document shape
    * (`parseInterpro.js:55-62`): numeric `_id` extracted from the
    * `IPR…` accession, the accession itself, the `short_name` attr as
    * the name, the `type` attr, the `<name>` child as the description,
    * and the `<parent_list>` refs.
    */
  def interpro(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val root = scala.xml.XML.loadFile(path)
    (root \ "interpro").map { ip =>
      val acc = ip \@ "id"
      (
        digits.findFirstIn(acc).map(_.toLong).getOrElse(-1L),
        acc,
        ip \@ "short_name",
        ip \@ "type",
        (ip \ "name").text,
        (ip \ "parent_list" \ "rel_ref").map(_ \@ "ipr_ref"))
    }.toDF("_id", "id", "name", "type", "description", "parents")
  }
}
