package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import graft.sources.{RestSource, XmlSource}

/** S6/S8 offline closures: the XML paths (distributed data source +
  * driver-side InterPro parse) and the REST LUT parses, all against
  * checked-in fixtures — no egress.
  */
class XmlRestSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Paths.get("src/test/resources/fixtures")

  test("S6: built-in xml data source reads rowTag elements with attributes") {
    val df = XmlSource.read(spark, fixtures.resolve("interpro.xml").toString, "interpro")
    assert(df.count() === 3)
    val byId = df.select(col("_id"), col("_short_name"), col("_type"))
      .as[(String, String, String)].collect().map(r => r._1 -> r).toMap
    assert(byId("IPR000001")._2 === "Kringle")
    assert(byId("IPR013806")._3 === "Homologous_superfamily")
  }

  test("S6: driver-side InterPro parse emits the reference document shape") {
    val rows = XmlSource.interpro(spark, fixtures.resolve("interpro.xml").toString)
      .orderBy("_id")
      .as[(Long, String, String, String, String, Seq[String])]
      .collect()
    assert(rows.map(_._1).toSeq === Seq(1L, 3L, 13806L))
    val (idNum, acc, name, typ, descr, parents) = rows.head
    assert((idNum, acc, name, typ, descr) ===
      ((1L, "IPR000001", "Kringle", "Domain", "Kringle domain")))
    assert(parents === Seq("IPR013806"))
    assert(rows(1)._6 === Seq.empty) // no parent_list element
    assert(rows(2)._6 === Seq("IPR000001", "IPR000003"))
  }

  test("S8: thalemine TSV LUT parses columns and keeps the last duplicate") {
    val df = RestSource.thalemineLut(spark, new RestSource.FileFetcher(fixtures),
      "https://example.org/thalemine/service/query/results?query=x")
    val byId = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byId.size === 2)
    assert(byId("AT1G01020").getString(1) === "ARV1")
    // duplicate key: the later row overwrites, like the reference LUT
    assert(byId("AT1G01010").getString(1) === "NAC001b")
    assert(byId("AT1G01010").getString(3) === "later row wins")
  }

  test("S8: rapdb JSON LUT explodes the array, first locus occurrence wins") {
    val df = RestSource.rapdbCuratedGenes(spark, new RestSource.FileFetcher(fixtures),
      "https://example.org/oryza/rapdb/curated_genes.json")
    val byLocus = df.as[(String, String, Seq[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(byLocus.size === 2)
    assert(byLocus("Os01g0100100")._2 === "RcgA") // not the duplicate
    assert(byLocus("Os01g0100100")._3 === Seq("RCG1", "rcg-a"))
    assert(byLocus("Os01g0100200")._3 === Seq.empty)
  }
}
