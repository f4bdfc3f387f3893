package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge-apply kernel: replace every LEFTMOST NON-OVERLAPPING
  * adjacent occurrence of the pair `(a, b)` in a symbol sequence with
  * the merged symbol `a||b` — one round of the byte-pair-encoding
  * re-pair step (Sennrich et al., ACL 2016 — the `replace` half of the
  * learn loop; [[graft.ops.BpeLearn]] drives the rounds). Single O(n)
  * pass per row, codegen via a static call — the per-round re-pair
  * over a corpus is a pure narrow map, no shuffle.
  *
  * Non-overlap is the standard scan rule: after a merge at position i
  * the scan resumes at i+2, so a run `a a a` under pair (a, a) merges
  * positions (0,1) — not (1,2) — yielding `aa a`. A merged output
  * symbol never re-merges within the same round (the scan walks the
  * ORIGINAL symbols; `a||b` ≠ `a` because `b` is non-empty).
  */
object BpeMerge {

  def mergePairImpl(arr: ArrayData, a: UTF8String, b: UTF8String): GenericArrayData = {
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (i + 1 < n && s == a && arr.getUTF8String(i + 1) == b) {
        out += UTF8String.concat(a, b)
        i += 2
      } else {
        out += s
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  case class BpeMergePair(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with ExpectsInputTypes {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(StringType), StringType, StringType)
    override protected def nullSafeEval(arr: Any, a: Any, b: Any): Any =
      mergePairImpl(arr.asInstanceOf[ArrayData],
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (arr, a, b) =>
        s"graft.functions.BpeMerge.mergePairImpl($arr, $a, $b)")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression) =
      copy(first = f, second = s, third = t)
  }

  /** Apply one merge `(a, b) → a||b` leftmost-non-overlapping. */
  def mergePair(syms: Column, a: Column, b: Column): Column =
    GraftColumnBridge.column(BpeMergePair(
      GraftColumnBridge.expression(syms),
      GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))
}
