package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus cleanup — the step every real
  * text pipeline runs BEFORE tokenization, dedup, and fingerprinting:
  * the same visible text arrives both precomposed (é as U+00E9) and
  * decomposed (e + U+0301), and every downstream equality — exact
  * dedup, MinHash grams, decontamination spans, vocabulary — silently
  * misses matches until the bytes are canonicalized. NFC is the
  * canonical composed form (what C4/Dolma-style pipelines and the
  * oracle's utf8proc `nfc_normalize` produce).
  *
  * Spark has no built-in normalizer, and a Scala UDF would box every
  * row out of codegen — so this is a native [[NfcNormalize]] codegen
  * expression around `java.text.Normalizer` with two fast paths sized
  * for the real distribution of corpus text:
  *
  *  - pure-ASCII rows (the overwhelming majority) return the INPUT
  *    UTF8String untouched after one branch-free byte scan — no
  *    String materialization at all (ASCII is closed under NFC);
  *  - non-ASCII rows that are already normalized (precomposed
  *    accents — most of the rest) pay `Normalizer.isNormalized`'s
  *    verification pass but skip the rewrite allocation.
  *
  * JDK-vs-utf8proc agreement: both implement the Unicode
  * normalization algorithm; the composition tables for the stable
  * Latin/Greek/Cyrillic repertoire are frozen by Unicode's
  * normalization stability policy, so the engines agree on any text
  * a training corpus plausibly contains (pinned cross-engine by
  * q90's oracle gate on injected decomposed sequences).
  */
object TextNormalize {

  def nfcImpl(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  case class NfcNormalize(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = StringType
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override protected def nullSafeEval(s: Any): Any =
      nfcImpl(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalize.nfcImpl($c)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** NFC-normalized text (codegen'd, per-row, shuffle-free). */
  def nfc(text: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(text)))

  /** The standard full cleanup composition: NFC, whitespace runs
    * collapsed to one space, trimmed, lowercased — all built-ins
    * around the native NFC kernel, so the whole pipeline stays inside
    * whole-stage codegen. `\s` is ASCII whitespace in both Java and
    * RE2, keeping the oracle replay exact.
    */
  def cleanText(text: Column): Column =
    lower(trim(regexp_replace(nfc(text), "\\s+", " ")))
}
