package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-point integer logarithm — the cross-engine-exact `ln` that
  * BM25-style relevance scoring needs. Float `ln` is engine-specific
  * in its last ulp, and a score gate that floors `1e6·ln(x)` can flip
  * an integer boundary between engines; this kernel never touches a
  * float: `ilog2q20` computes log₂ in Q20 fixed point by the classic
  * truncating repeated-squaring recurrence (30-bit mantissa, 20
  * fraction bits, every step pure 64-bit integer multiply/shift), and
  * [[iln1mImpl]] converts to ≈10⁶·ln via one integer multiply by
  * ⌊2²⁰·ln2·10⁶⌋/2²⁰-style scaling. The result is a WELL-DEFINED pure
  * integer function (within 4e-5 relative of true ln — far more
  * resolution than ranking needs), replayable verbatim in ANSI-ish
  * SQL: a 20-step recursive CTE of shifts and multiplies (see the
  * q103 oracle). Reference behavior matched: the serving-side
  * relevance path the reference delegates to its document store
  * (`search/indexCommands.txt:33-48`).
  */
object FixedLog {

  /** ⌈log₂-ish⌉ in Q20: `(floor(log2 m) << 20) | frac20(m)` where the
    * 20 fraction bits come from truncating repeated squaring of the
    * 30-bit mantissa. Defined for m ≥ 1; ilog2q20(1) = 0,
    * ilog2q20(2^k) = k << 20 exactly.
    */
  def ilog2q20(m: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(m)
    var x = if (e <= 30) m << (30 - e) else m >> (e - 30)
    var frac = 0L
    var i = 0
    while (i < 20) {
      x = (x * x) >> 30
      if (x >= (1L << 31)) {
        frac = (frac << 1) | 1L
        x >>= 1
      } else {
        frac = frac << 1
      }
      i += 1
    }
    (e.toLong << 20) | frac
  }

  /** ≈ 10⁶·ln(m) as a pure integer function of integer m ≥ 1:
    * `(ilog2q20(m) * 693147) >> 20` (693147 = round(10⁶·ln 2)).
    * Monotone non-decreasing in m; 0 at m = 1.
    */
  def iln1mImpl(m: Long): Long = (ilog2q20(m) * 693147L) >> 20

  case class Iln1m(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def nullable: Boolean = true
    override protected def nullSafeEval(m: Any): Any = {
      val v = m.asInstanceOf[Long]
      if (v < 1L) null else iln1mImpl(v)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, m => s"""
        if ($m < 1L) { ${ev.isNull} = true; }
        else { ${ev.value} = graft.functions.FixedLog.iln1mImpl($m); }
      """)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** ≈10⁶·ln(m) for a long column; null for m < 1 (codegen, per-row). */
  def iln1m(m: Column): Column =
    GraftColumnBridge.column(Iln1m(GraftColumnBridge.expression(m)))
}
