package graft

import org.apache.spark.sql.functions._
import graft.functions.Redaction

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: String*): Seq[(String, Int, Int, Int)] =
    texts.toDF("t").select(
      Redaction.redact(col("t")),
      Redaction.emailCount(col("t")),
      Redaction.ipv4Count(col("t")),
      Redaction.phoneCount(col("t")))
      .as[(String, Int, Int, Int)].collect().toSeq

  test("emails redact and count, including atom characters and multiples") {
    val Seq(a, b) = run(
      "mail me at a.b+c%d@foo-bar.co today",
      "x@y.io and z@w.org")
    assert(a == ("mail me at <EMAIL> today", 1, 0, 0))
    assert(b == ("<EMAIL> and <EMAIL>", 2, 0, 0))
  }

  test("IPv4 redacts word-bounded only") {
    val Seq(a, b, c) = run(
      "server 10.0.255.1 down",
      "version 1.2.3.4567 is not an address",
      "1.2.3.4")
    assert(a == ("server <IP> down", 0, 1, 0))
    assert(b == ("version 1.2.3.4567 is not an address", 0, 0, 0))
    assert(c == ("<IP>", 0, 1, 0))
  }

  test("phones redact with - or . separators, not bare digit runs") {
    val Seq(a, b, c) = run(
      "call 555-123-4567 now",
      "or 555.123.4567",
      "not 5551234567")
    assert(a == ("call <PHONE> now", 0, 0, 1))
    assert(b == ("or <PHONE>", 0, 0, 1))
    assert(c == ("not 5551234567", 0, 0, 0))
  }

  test("all three families scrub in one pass, counts from the original") {
    val Seq(a) = run(
      "doc7@example.com at 10.7.0.7 call 555-049-0007 end")
    assert(a == ("<EMAIL> at <IP> call <PHONE> end", 1, 1, 1))
  }

  test("no PII leaves text untouched with zero counts") {
    val Seq(a) = run("plain text with nothing to scrub")
    assert(a == ("plain text with nothing to scrub", 0, 0, 0))
  }

  test("q88 engine rows match the documents injection shape") {
    // miniature of the q88 gate: inject from doc_id, expect exactly one
    // of each family per row regardless of the carrier text
    val got = Seq((0L, "alpha beta"), (123L, "gamma"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), concat(
        col("text"),
        lit(" contact doc"), col("doc_id").cast("string"),
        lit("@example.com at 10."),
        (col("doc_id") % 256).cast("string"), lit(".0."),
        (col("doc_id") % 100).cast("string"), lit(" call 555-"),
        lpad((col("doc_id") * 7 % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
      .select(col("doc_id"),
        Redaction.emailCount(col("t")),
        Redaction.ipv4Count(col("t")),
        Redaction.phoneCount(col("t")),
        Redaction.redact(col("t")))
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(got.map(r => (r._2, r._3, r._4)).toSeq == Seq((1, 1, 1), (1, 1, 1)))
    assert(got(0)._5 == "alpha beta contact <EMAIL> at <IP> call <PHONE>")
    assert(got(1)._5 == "gamma contact <EMAIL> at <IP> call <PHONE>")
  }
}
