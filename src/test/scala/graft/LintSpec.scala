package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level pins for recurring plan hazards that code review caught
  * twice and grep can catch forever. These are structural rules, not
  * style: each encodes a measured failure mode.
  */
class LintSpec extends AnyFunSuite {

  private def mainSources: Seq[(java.nio.file.Path, String)] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    scala.util.Using.resource(java.nio.file.Files.walk(root)) { w =>
      w.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .map(p => (p, java.nio.file.Files.readString(p)))
        .toList
    }
  }

  /** Lines with line-comments stripped; scaladoc and import lines
    * dropped (prose and `org.apache.spark.rdd.RDD` imports are not
    * call sites).
    */
  private def codeLines(src: String): Seq[(Int, String)] =
    src.linesIterator.zipWithIndex.map { case (l, i) =>
      (i + 1, l.replaceAll("//.*$", ""))
    }.filterNot { case (_, l) =>
      val t = l.trim
      t.startsWith("*") || t.startsWith("import ")
    }.toSeq

  test("no production path calls .rdd on a Dataset — a partition-count " +
      "probe via .rdd compiles a SECOND Row-deserializing physical plan " +
      "(measured on the 1000x audit); use queryExecution.toRdd") {
    // the bridge's whole job is LogicalRDD.rdd (checkpoint lifecycle);
    // dev tools may introspect however they like
    val allow = Set("GraftColumnBridge.scala")
    val rddRef = """\.rdd\b""".r
    val hits = for {
      (p, src) <- mainSources
      if !allow.contains(p.getFileName.toString)
      if !p.toString.contains("/tools/")
      (ln, line) <- codeLines(src)
      if rddRef.findFirstIn(line).isDefined
    } yield s"$p:$ln: ${line.trim}"
    assert(hits.isEmpty, "use queryExecution.toRdd instead:\n" + hits.mkString("\n"))
  }

  test("no ??? stubs anywhere in src/main") {
    val hits = for {
      (p, src) <- mainSources
      (ln, line) <- codeLines(src)
      if line.contains("???")
    } yield s"$p:$ln"
    assert(hits.isEmpty, hits.mkString("\n"))
  }

  test("no Scala assert gates in tools mains (compiled out under " +
      "-Xdisable-assertions; audit gates must use explicit errors)") {
    val assertCall = """(?<![.\w])assert\(""".r
    val hits = for {
      (p, src) <- mainSources
      if p.toString.contains("/tools/")
      (ln, line) <- codeLines(src)
      if assertCall.findFirstIn(line).isDefined
    } yield s"$p:$ln: ${line.trim}"
    assert(hits.isEmpty,
      "tools must gate with sys.error/require, not assert:\n" + hits.mkString("\n"))
  }

  test("evidence-gate completeness: bench headline + named exemptions " +
      "== the query catalog, and audit exemption sets name only " +
      "catalog queries — no query can silently skip an evidence gate") {
    val catalog = graft.queries.Queries.all.keySet
    val head = Bench.headline.toSet
    assert(Bench.headline.distinct.size == Bench.headline.size,
      "duplicate headline entries")
    val both = head & Bench.exempt.keySet
    assert(both.isEmpty, s"queries both headline and exempt: ${both.mkString(", ")}")
    val unplaced = catalog -- head -- Bench.exempt.keySet
    assert(unplaced.isEmpty,
      "catalog queries neither benched nor exempted-with-reason: " +
        unplaced.mkString(", "))
    val stale = (head ++ Bench.exempt.keySet) -- catalog
    assert(stale.isEmpty,
      s"bench lists name unknown queries: ${stale.mkString(", ")}")
    val staleAudit = (graft.queries.Queries.streamingQueries ++
      graft.queries.Queries.intendedCrossQueries) -- catalog
    assert(staleAudit.isEmpty,
      s"audit exemptions name unknown queries: ${staleAudit.mkString(", ")}")
  }

  test("every graft.* conf key literal in src/main is registered in " +
      "graft.Budgets (the conf-key registry)") {
    // conf keys end in a lowercase-initial segment; FQCN string
    // literals ("graft.functions.Genomics") end uppercase-initial
    val keyLit = """"(graft\.[a-z][a-zA-Z]*\.[a-z][a-zA-Z]*)"""".r
    val found = (for {
      (_, src) <- mainSources
      m <- keyLit.findAllMatchIn(src)
    } yield m.group(1)).toSet
    assert(found.nonEmpty, "expected at least one graft.* conf key")
    val unregistered = found -- graft.Budgets.keys
    assert(unregistered.isEmpty,
      s"conf keys missing from Budgets.keys: ${unregistered.mkString(", ")}")
    val stale = graft.Budgets.keys -- found
    assert(stale.isEmpty,
      s"Budgets.keys entries with no source site: ${stale.mkString(", ")}")
  }

  test("bench one-line contract: the embedded ab block can never carry " +
      "a raw newline (the only free-form field in the JSON line — a " +
      "pretty-printed ab_headline.json must not break tail-grep parsing)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ab-lint")
    val pretty = dir.resolve("ab.json")
    java.nio.file.Files.writeString(pretty,
      "{\r\n  \"base_ref\": \"abc\",\n  \"ratio\": 0.8\n}\n")
    val s = Bench.abBlock(pretty)
    assert(!s.contains("\n") && !s.contains("\r"),
      s"abBlock leaked a raw newline: ${s.take(120)}")
    assert(s.startsWith("{") && s.endsWith("}"))
    assert(Bench.abBlock(dir.resolve("missing.json")) == "null")
    java.nio.file.Files.writeString(pretty, "not json at all\n")
    assert(Bench.abBlock(pretty) == "null")
  }
}
