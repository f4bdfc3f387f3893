package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipelines.OntologyPipeline

/** Golden end-to-end test of the ontology ingest pipeline (SURVEY
  * §3.3) over an inline OBO fixture with a multi-parent DAG.
  */
class OntologyPipelineSpec extends SparkSpec {
  import spark.implicits._

  //       T1
  //      /  \
  //    T2    T3
  //      \  /  \
  //       T4    T5 (obsolete)
  private lazy val obo: String = {
    val content =
      """format-version: 1.2
        |
        |[Term]
        |id: GO:0000001
        |name: root
        |
        |[Term]
        |id: GO:0000002
        |name: left child
        |synonym: "l2" EXACT []
        |is_a: GO:0000001 ! root
        |
        |[Term]
        |id: GO:0000003
        |name: right child
        |is_a: GO:0000001 ! root
        |
        |[Term]
        |id: GO:0000004
        |name: diamond bottom
        |is_a: GO:0000002 ! left child
        |is_a: GO:0000003 ! right child
        |
        |[Term]
        |id: GO:0000005
        |name: obsolete leaf
        |is_obsolete: true
        |is_a: GO:0000003 ! right child
        |""".stripMargin
    val f = Files.createTempFile("graft-onto", ".obo")
    Files.writeString(f, content)
    f.toString
  }

  test("terms: multi-parent ancestors are complete and deduplicated") {
    val got = OntologyPipeline.terms(spark, obo)
      .select("id", "ancestors")
      .as[(String, Seq[String])].collect().toMap
    assert(got("GO:0000001") == Seq.empty)
    assert(got("GO:0000004") ==
      Seq("GO:0000001", "GO:0000002", "GO:0000003")) // diamond: root once
    assert(got("GO:0000005") == Seq("GO:0000001", "GO:0000003"))
  }

  test("terms: descendant rollup counts the whole subtree") {
    val got = OntologyPipeline.terms(spark, obo)
      .select("id", "n_descendants")
      .as[(String, Long)].collect().toMap
    assert(got("GO:0000001") == 4L)
    assert(got("GO:0000003") == 2L) // T4 and T5
    assert(got("GO:0000004") == 0L)
  }

  test("golden: canonical JSON docs") {
    val got = OntologyPipeline.json(spark, obo)
      .orderBy("id").as[(String, String)].collect().toMap
    assert(got("GO:0000004") ==
      """{"name":"diamond bottom","is_obsolete":false,""" +
      """"ancestors":["GO:0000001","GO:0000002","GO:0000003"],""" +
      """"n_descendants":0}""")
    // empty synonyms and zero counts pruned; flag + synonym retained
    assert(got("GO:0000002") ==
      """{"name":"left child","synonyms":["\"l2\" EXACT []"],""" +
      """"is_obsolete":false,"ancestors":["GO:0000001"],"n_descendants":1}""")
    assert(got("GO:0000005").contains("\"is_obsolete\":true"))
  }
}
