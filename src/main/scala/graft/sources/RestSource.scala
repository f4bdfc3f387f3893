package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 — REST lookup-table sources. The reference decorates gene docs
  * from web services at pipeline start (`search/thalemine.js:9-25`,
  * `search/rapdb.js:7-45`): one GET, parse the body into a LUT, then
  * broadcast-join it against the gene stream. Same shape here: the
  * fetch happens ONCE on the driver (these are dimension-sized
  * payloads), the parse is a DataFrame, and callers broadcast-join it —
  * the scan side never touches the network.
  *
  * [[Fetcher]] abstracts the transport so the parse logic is testable
  * offline: [[HttpFetcher]] is the production implementation (unused in
  * this egress-free environment), [[FileFetcher]] serves checked-in
  * fixtures.
  */
object RestSource {

  trait Fetcher extends Serializable {
    def fetch(url: String): String
  }

  /** Production transport: a blocking GET via java.net.http (JDK 11+,
    * no extra dependency). Environment-bound — exercised only where
    * egress exists; all parse logic is covered through [[FileFetcher]].
    */
  final class HttpFetcher extends Fetcher {
    override def fetch(url: String): String = {
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
      client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    }
  }

  /** Fixture transport: resolves a URL to `<base>/<last path segment>`. */
  final class FileFetcher(base: Path) extends Fetcher {
    override def fetch(url: String): String = {
      val name = url.split('?').head.split('/').filter(_.nonEmpty).last
      Files.readString(base.resolve(name))
    }
  }

  /** The thalemine gene LUT (`search/thalemine.js:13-22`): a TSV body,
    * first column keys the table, later duplicates overwrite earlier
    * ones exactly like the reference's `lut[cols[0]] = …` assignment.
    */
  def thalemineLut(spark: SparkSession, fetcher: Fetcher, url: String): DataFrame = {
    import spark.implicits._
    val rows = fetcher.fetch(url)
      .split("\n", -1).toIndexedSeq
      .filter(_.nonEmpty)
      .map { line =>
        val cols = line.split("\t", -1)
        def at(i: Int) = if (i < cols.length) cols(i) else null
        (cols(0), at(1), at(2), at(3))
      }
    // last-wins dedup on the key, preserving the reference's overwrite
    val lut = rows.foldLeft(Map.empty[String, (String, String, String, String)]) {
      (m, r) => m.updated(r._1, r)
    }
    lut.values.toSeq
      .toDF("primary_id", "symbol", "curator_summary", "brief_description")
  }

  /** The RapDB curated-genes LUT (`search/rapdb.js:13-45`): a JSON
    * array body parsed by Spark's own JSON reader (root-level arrays
    * explode to one row per element — no extra JSON dependency), then
    * folded to the reference's shape: first gene_symbols token is the
    * name, the rest are distinct synonyms; the FIRST occurrence wins
    * per locus (`if (!lut.hasOwnProperty(…))`).
    */
  def rapdbCuratedGenes(spark: SparkSession, fetcher: Fetcher, url: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.json(Seq(fetcher.fetch(url)).toDS())
      // single-partition parse of one body: increasing ids preserve the
      // array's element order, pinning the reference's first-wins rule
      .withColumn("ord", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("locus").orderBy("ord")
    raw
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(
        col("locus"),
        element_at(split(col("gene_symbols"), ", "), 1).as("name"),
        array_distinct(slice(
          split(col("gene_symbols"), ", "), 2, 1000000)).as("synonyms"))
  }
}
