package graft

import org.apache.spark.sql.functions._
import graft.functions.TextNormalize

/** Form-sensitive literals are written with \u escapes, never raw
  * combining marks — a source-tool normalization pass would otherwise
  * silently turn "decomposed input" fixtures into no-ops.
  */
class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // decomposed (base + combining mark) and precomposed spellings
  private val cafeD = "cafe\u0301"
  private val cafeC = "caf\u00e9"
  private val uberD = "u\u0308ber"
  private val uberC = "\u00fcber"
  private val manD = "man\u0303ana"
  private val manC = "ma\u00f1ana"

  private def nfcOf(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(TextNormalize.nfc(col("t")))
      .as[String].head()

  test("decomposed accents compose: bytes shrink to the precomposed form") {
    assert(nfcOf(cafeD) == cafeC)
    assert(nfcOf(uberD) == uberC)
    assert(nfcOf(manD) == manC)
    // codepoint count contracts by one per composed pair
    val n = Seq(Tuple1(cafeD)).toDF("t")
      .select(length(TextNormalize.nfc(col("t"))), length(col("t")))
      .as[(Int, Int)].head()
    assert(n == ((4, 5)))
  }

  test("pure ASCII is the identity (fast path) and idempotence holds") {
    val ascii = "plain ascii text 123 !@#"
    assert(nfcOf(ascii) == ascii)
    assert(nfcOf(nfcOf(cafeD)) == cafeC)
  }

  test("already-precomposed non-ASCII text is unchanged") {
    val s = s"$cafeC $uberC $manC"
    assert(nfcOf(s) == s)
  }

  test("null text stays null (nullIntolerant)") {
    val got = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(TextNormalize.nfc(col("t"))).collect()
    assert(got(0).isNullAt(0))
  }

  test("kernel agrees with java.text.Normalizer on mixed content") {
    val samples = Seq(
      "å ring",               // a + combining ring -> U+00E5
      "Ȫ stacked",      // two stacked marks -> U+022A
      "ééé",      // run of decomposed pairs
      "ก้ thai",          // non-Latin, no composition
      s"mixed ascii $cafeC and $cafeD")
    val got = samples.toDF("t").select(TextNormalize.nfc(col("t")))
      .as[String].collect().toSeq
    val want = samples.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got == want)
  }

  test("cleanText composes NFC + whitespace collapse + trim + lower") {
    val got = Seq(Tuple1("  CAFE\u0301   Deluxe  X ")).toDF("t")
      .select(TextNormalize.cleanText(col("t"))).as[String].head()
    assert(got == s"$cafeC deluxe x")
  }
}
