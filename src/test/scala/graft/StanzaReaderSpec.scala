package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.StanzaReader
import graft.ops.Closure

class StanzaReaderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oboFile: String = {
    val content =
      """format-version: 1.2
        |ontology: test
        |
        |[Term]
        |id: GO:0000001
        |name: root term
        |
        |[Term]
        |id: GO:0000002
        |name: child a
        |synonym: "alpha" EXACT []
        |synonym: "first" RELATED []
        |is_a: GO:0000001 ! root term
        |
        |[Term]
        |id: GO:0000003
        |name: grandchild
        |is_a: GO:0000002 ! child a
        |
        |[Typedef]
        |id: part_of
        |name: part of
        |""".stripMargin
    val f = Files.createTempFile("graft-test", ".obo")
    Files.writeString(f, content)
    f.toString
  }

  test("reads only stanzas of the requested type") {
    val df = StanzaReader.read(spark, oboFile)
    assert(df.count() == 3) // Typedef and the header block excluded
    assert(df.select("id").as[String].collect().toSet ==
      Set("GO:0000001", "GO:0000002", "GO:0000003"))
  }

  test("multivalued keys keep every value in file order") {
    val syns = StanzaReader.read(spark, oboFile)
      .where(col("id") === "GO:0000002")
      .select(StanzaReader.valuesOf(col("kv"), "synonym"))
      .head().getSeq[String](0)
    assert(syns == Seq("\"alpha\" EXACT []", "\"first\" RELATED []"))
  }

  test("firstOf returns null for absent keys") {
    val r = StanzaReader.read(spark, oboFile)
      .where(col("id") === "GO:0000001")
      .select(StanzaReader.firstOf(col("kv"), "synonym"))
      .head()
    assert(r.isNullAt(0))
  }

  test("id int coercion strips prefix and leading zeros") {
    val got = Seq("GO:0000123", "PO:0004", "bogus").toDF("id")
      .select(StanzaReader.idToInt(col("id"))).collect()
    assert(got(0).getLong(0) == 123L)
    assert(got(1).getLong(0) == 4L)
    assert(got(2).isNullAt(0))
  }

  test("edges + closure: ancestor sets from is_a chains") {
    val df = StanzaReader.read(spark, oboFile)
    val e = StanzaReader.edges(df)
    val closure = Closure.transitiveClosure(e)
      .as[(String, String)].collect().toSet
    assert(closure == Set(
      ("GO:0000002", "GO:0000001"),
      ("GO:0000003", "GO:0000002"),
      ("GO:0000003", "GO:0000001")))
  }
}
