package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Jaccard over two SORTED string arrays as a native Catalyst
  * expression: a single merge walk — no per-row hash sets (what
  * `array_intersect` + `array_union` build) — with an early exit once
  * the remaining elements cannot reach `threshold`. This is the verify
  * kernel of the exact similarity join: at corpus scale it runs once
  * per candidate pair, so its constant factor is the stage's cost.
  *
  * Returns the exact Jaccard when it is >= threshold, else -1.0
  * (callers filter `>= threshold`; the early exit makes "below
  * threshold" cheap without computing the exact low value).
  */
object SetSimilarity {

  def jaccardSortedGE(a: ArrayData, b: ArrayData, threshold: Double): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    // Empty sets (docs shorter than the shingle width) have UNDEFINED
    // similarity (0/0) — report below-threshold rather than 1.0, so
    // unrelated sub-shingle-length docs never pair as duplicates. This
    // matches the SQL oracle, where the NaN ratio fails the >= filter.
    if (na == 0 || nb == 0) return -1.0
    // jaccard >= t  <=>  inter >= t/(1+t) * (na+nb)
    val needed = math.ceil(threshold / (1.0 + threshold) * (na + nb) - 1e-9)
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      if (inter + math.min(na - i, nb - j) < needed) return -1.0
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      // binaryCompare, NOT compareTo: same byte order, but Spark 4.1's
      // compareTo does a System.getenv isTesting check per call (and
      // throws under spark.testing) — fatal in this per-candidate walk
      val c = x.binaryCompare(y)
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val jac = inter.toDouble / (na + nb - inter)
    if (jac >= threshold) jac else -1.0
  }

  case class JaccardSortedGE(left: Expression, right: Expression, threshold: Double)
      extends BinaryExpression with ExpectsInputTypes {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override protected def nullSafeEval(a: Any, b: Any): Any =
      jaccardSortedGE(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SetSimilarity.jaccardSortedGE($a, $b, $threshold)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** `a` and `b` MUST be sorted ascending (e.g. via `sort_array`). */
  def jaccardSorted(a: Column, b: Column, threshold: Double): Column =
    GraftColumnBridge.column(JaccardSortedGE(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), threshold))

  /** Cosine similarity of two double arrays in ONE fused pass (dot and
    * both norms together) — the ANN rerank kernel. The HOF formulation
    * (`zip_with` + two `transform`+`aggregate`s) walks the arrays three
    * times and allocates intermediates; this walks once, allocation-
    * free. Null/zero-norm/length-mismatch → 0.0 (mismatched dimensions
    * are incomparable; `zip_with`'s null-padding nulls the dot product
    * the same way — parity is covered by a unit test).
    */
  def cosineImpl(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements()) return 0.0
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na > 0 && nb > 0) dot / (math.sqrt(na) * math.sqrt(nb)) else 0.0
  }

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override protected def nullSafeEval(a: Any, b: Any): Any =
      cosineImpl(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SetSimilarity.cosineImpl($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def cosineNative(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Sparse dot product over two `array<struct<dim, wn: double>>`
    * SORTED ascending by dim (dims unique per array): one merge walk,
    * O(|a|+|b|). The APSS verify kernel — the `aggregate(map_entries,
    * element_at)` formulation it replaces is interpreted AND pays a
    * linear key scan per lookup (Catalyst maps are unsorted arrays),
    * i.e. O(|a|·|b|) string compares per pair; on a 765k-candidate
    * verify at sf0.1 that was 39s vs <1s for the walk. Int and string
    * dim variants (embedding/feature ids vs raw term vocabularies).
    */
  def sparseDotSortedInt(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var dot = 0.0
    while (i < na && j < nb) {
      val sa = a.getStruct(i, 2)
      val sb = b.getStruct(j, 2)
      val da = sa.getInt(0)
      val db = sb.getInt(0)
      if (da == db) { dot += sa.getDouble(1) * sb.getDouble(1); i += 1; j += 1 }
      else if (da < db) i += 1
      else j += 1
    }
    dot
  }

  def sparseDotSortedLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var dot = 0.0
    while (i < na && j < nb) {
      val sa = a.getStruct(i, 2)
      val sb = b.getStruct(j, 2)
      val da = sa.getLong(0)
      val db = sb.getLong(0)
      if (da == db) { dot += sa.getDouble(1) * sb.getDouble(1); i += 1; j += 1 }
      else if (da < db) i += 1
      else j += 1
    }
    dot
  }

  def sparseDotSortedStr(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var dot = 0.0
    while (i < na && j < nb) {
      val sa = a.getStruct(i, 2)
      val sb = b.getStruct(j, 2)
      // binaryCompare — see the getenv-per-call note in jaccardSortedGE
      val c = sa.getUTF8String(0).binaryCompare(sb.getUTF8String(0))
      if (c == 0) { dot += sa.getDouble(1) * sb.getDouble(1); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    dot
  }

  case class SparseDotSorted(left: Expression, right: Expression, dimType: DataType)
      extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    private def impl = dimType match {
      case StringType => "sparseDotSortedStr"
      case LongType   => "sparseDotSortedLong"
      case _          => "sparseDotSortedInt"
    }
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      dimType match {
        case StringType => sparseDotSortedStr(x, y)
        case LongType   => sparseDotSortedLong(x, y)
        case _          => sparseDotSortedInt(x, y)
      }
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SetSimilarity.$impl($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** `a`/`b` MUST be sorted ascending by the struct's first field (the
    * dim), dims unique per array; first field int, long (hashed gram
    * keys), or string per `dimType`, second field double.
    */
  def sparseDotSorted(a: Column, b: Column, dimType: DataType): Column =
    GraftColumnBridge.column(SparseDotSorted(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), dimType))
}
