package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Nearest-centroid selection as native codegen kernels — the IVF /
  * SemDeDup assignment hot path ([[graft.ops.Similarity.IvfIndex
  * .withCells]]).
  *
  * The HOF formulation these replace (`sort_array` over k
  * `struct(aggregate(zip_with(vec, cLit, …)), cid)` entries) is
  * interpreted — higher-order functions are CodegenFallback — and
  * allocates k zipped arrays + k structs PER ROW before sorting all k
  * just to keep the first nProbe. On a 2M-vector corpus with a
  * 977-cell hierarchical quantizer the 1000× audit measured the
  * assignment stage pinned in `SimpleHigherOrderFunction.eval`; these
  * kernels run the same arithmetic as primitive loops inside
  * whole-stage codegen with one bounded insertion pass (O(k·dim +
  * k·nProbe), allocation-free except the nProbe-int result).
  *
  * Semantics match the HOF path bit-for-bit on well-formed input, and
  * the q84b/q55 SQL oracles replay them: distance is the left-to-right
  * Σ(xₜ−cₜ)² (the same IEEE addition order as the `aggregate` fold and
  * as a SQL sum over ordinals), selection is the nProbe least by
  * (d², cid) ascending — on equal distance the LOWER cid wins, exactly
  * `sort_array`'s struct order. Two INTENTIONAL divergences on
  * malformed input:
  *
  *  - a row-vector/centroid DIMENSION MISMATCH is demoted to
  *    Double.MaxValue — ranked LAST, out of contention. The HOF
  *    reference would rank it FIRST (`zip_with` pads the short side
  *    with nulls, nulling the distance, and `sort_array` sorts null
  *    struct fields first) — a nonsensical pick the kernel refuses to
  *    reproduce. The centroid side can't be ragged at all: the column
  *    builders below assert uniform centroid dims at construction, so
  *    a ragged seed corpus fails fast instead of silently demoting.
  *  - a NULL ELEMENT inside the vector array reads as 0.0 (getDouble
  *    on a null slot), where the HOF reference nulls the whole
  *    distance — consistent with the cosineImpl precedent; declare
  *    embedding columns with non-null elements to keep the two paths
  *    bit-identical.
  */
object VectorQuant {

  /** Bounded insertion of (d, cid) into the parallel (bd, bc) arrays
    * kept ascending by (d, cid); returns the new fill count. Strict
    * lexicographic comparisons keep the lower cid on distance ties.
    */
  private def insertSel(
      bd: Array[Double], bc: Array[Int], filled0: Int,
      d: Double, cid: Int): Int = {
    val m = bd.length
    var filled = filled0
    if (filled < m) {
      var j = filled - 1
      while (j >= 0 && (bd(j) > d || (bd(j) == d && bc(j) > cid))) {
        bd(j + 1) = bd(j); bc(j + 1) = bc(j); j -= 1
      }
      bd(j + 1) = d; bc(j + 1) = cid
      filled += 1
    } else if (d < bd(m - 1) || (d == bd(m - 1) && cid < bc(m - 1))) {
      var j = m - 2
      while (j >= 0 && (bd(j) > d || (bd(j) == d && bc(j) > cid))) {
        bd(j + 1) = bd(j); bc(j + 1) = bc(j); j -= 1
      }
      bd(j + 1) = d; bc(j + 1) = cid
    }
    filled
  }

  /** The `nProbe` cell ids nearest to `vec` by (L2², cid) ascending,
    * over a FIXED centroid matrix (`cids(i)` labels `cents(i)`).
    */
  def nearestCellsImpl(
      vec: ArrayData, cids: Array[Int], cents: Array[Array[Double]],
      nProbe: Int): ArrayData = {
    val k = cents.length
    val m = if (nProbe < k) nProbe else k
    val bd = new Array[Double](m)
    val bc = new Array[Int](m)
    var filled = 0
    val n = vec.numElements()
    var i = 0
    while (i < k) {
      val c = cents(i)
      var d = 0.0
      if (n != c.length) d = Double.MaxValue
      else {
        var t = 0
        while (t < n) { val x = vec.getDouble(t) - c(t); d += x * x; t += 1 }
      }
      filled = insertSel(bd, bc, filled, d, cids(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bc)
  }

  /** The `nProbe` cell ids nearest to `vec` over a PER-ROW candidate
    * list `subs: array<struct<cid:int, c:array<double>>>` — the
    * hierarchical quantizer's probed sub-centroid groups after the
    * broadcast attach. Entries must be non-null (they come from
    * engine-built group arrays).
    */
  def nearestSubCellsImpl(vec: ArrayData, subs: ArrayData, nProbe: Int): ArrayData = {
    val k = subs.numElements()
    val m = if (nProbe < k) nProbe else k
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Int](0))
    val bd = new Array[Double](m)
    val bc = new Array[Int](m)
    var filled = 0
    val n = vec.numElements()
    var i = 0
    while (i < k) {
      val s = subs.getStruct(i, 2)
      val c = s.getArray(1)
      var d = 0.0
      if (n != c.numElements()) d = Double.MaxValue
      else {
        var t = 0
        while (t < n) { val x = vec.getDouble(t) - c.getDouble(t); d += x * x; t += 1 }
      }
      filled = insertSel(bd, bc, filled, d, s.getInt(0))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (filled == m) bc else java.util.Arrays.copyOf(bc, filled))
  }

  case class NearestCells(
      child: Expression, cids: Array[Int], cents: Array[Array[Double]],
      nProbe: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    override protected def nullSafeEval(v: Any): Any =
      nearestCellsImpl(v.asInstanceOf[ArrayData], cids, cents, nProbe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idsRef = ctx.addReferenceObj("cids", cids, "int[]")
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.VectorQuant.nearestCellsImpl($v, $idsRef, $centsRef, $nProbe)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** [[nearestSubCellsImpl]] but returning `(d, cid)` structs ascending
    * instead of bare cids — the KEYED level attach ranks each probed
    * group's candidates independently and must merge across groups by
    * distance afterwards, which the cid-only form cannot do. Same
    * selection, same (d², cid) tie rule.
    */
  def nearestSubCellsWithDistImpl(
      vec: ArrayData, subs: ArrayData, nProbe: Int): ArrayData = {
    val k = subs.numElements()
    val m = if (nProbe < k) nProbe else k
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val bd = new Array[Double](m)
    val bc = new Array[Int](m)
    var filled = 0
    val n = vec.numElements()
    var i = 0
    while (i < k) {
      val s = subs.getStruct(i, 2)
      val c = s.getArray(1)
      var d = 0.0
      if (n != c.numElements()) d = Double.MaxValue
      else {
        var t = 0
        while (t < n) { val x = vec.getDouble(t) - c.getDouble(t); d += x * x; t += 1 }
      }
      filled = insertSel(bd, bc, filled, d, s.getInt(0))
      i += 1
    }
    new GenericArrayData(
      Array.tabulate[Any](filled)(j => InternalRow(bd(j), bc(j))))
  }

  case class NearestSubCellsWithDist(
      left: Expression, right: Expression, nProbe: Int)
      extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("d", DoubleType, nullable = false),
        StructField("cid", IntegerType, nullable = false))),
      containsNull = false)
    override protected def nullSafeEval(v: Any, s: Any): Any =
      nearestSubCellsWithDistImpl(
        v.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], nProbe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (v, s) =>
        s"graft.functions.VectorQuant.nearestSubCellsWithDistImpl($v, $s, $nProbe)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class NearestSubCells(left: Expression, right: Expression, nProbe: Int)
      extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override protected def nullSafeEval(v: Any, s: Any): Any =
      nearestSubCellsImpl(v.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], nProbe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (v, s) =>
        s"graft.functions.VectorQuant.nearestSubCellsImpl($v, $s, $nProbe)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** SRP sign-bit bucket: bit p set iff `vec`'s dot with plane p is
    * ≥ 0 — one fused pass over all planes. The HOF reference
    * (`aggregate(zip_with(vec, planeLit, …))` per plane, OR-reduced)
    * pays planes-many interpreted zip allocations per row. A
    * dimension mismatch leaves the bit unset, exactly like the
    * zip-pad path nulling the dot (`when(null >= 0)` is false);
    * parity is pinned in SimilaritySpec.
    */
  def srpBucketImpl(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    var bits = 0L
    val n = vec.numElements()
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      if (n == pl.length) {
        var dot = 0.0
        var t = 0
        while (t < n) { dot += vec.getDouble(t) * pl(t); t += 1 }
        if (dot >= 0) bits |= (1L << p)
      }
      p += 1
    }
    bits
  }

  case class SrpBucket(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression with ExpectsInputTypes {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    override protected def nullSafeEval(v: Any): Any =
      srpBucketImpl(v.asInstanceOf[ArrayData], planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.VectorQuant.srpBucketImpl($v, $planesRef)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Sign-bit SRP bucket of `vec` (already `array<double>`) over the
    * literal hyperplane set.
    */
  def srpBucket(vec: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(SrpBucket(GraftColumnBridge.expression(vec), planes))

  /** `vec`'s `nProbe` nearest cells over the literal centroid set,
    * ascending (L2², cid); `vec` must already be `array<double>`.
    */
  def nearestCells(
      vec: Column, centroids: Array[(Int, Array[Double])], nProbe: Int): Column = {
    require(centroids.nonEmpty &&
      centroids.forall(_._2.length == centroids.head._2.length),
      "centroids must be non-empty and share one dimension " +
        "(a ragged centroid set would be silently demoted, not ranked)")
    GraftColumnBridge.column(NearestCells(
      GraftColumnBridge.expression(vec),
      centroids.map(_._1), centroids.map(_._2), nProbe))
  }

  /** `vec`'s `nProbe` nearest cells over a per-row
    * `array<struct<cid:int, c:array<double>>>` column.
    */
  def nearestSubCells(vec: Column, subs: Column, nProbe: Int): Column =
    GraftColumnBridge.column(NearestSubCells(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(subs), nProbe))

  /** [[nearestSubCells]] with distances: `array<struct<d:double,
    * cid:int>>` ascending by (d, cid) — for cross-group merging in the
    * keyed level attach.
    */
  def nearestSubCellsWithDist(vec: Column, subs: Column, nProbe: Int): Column =
    GraftColumnBridge.column(NearestSubCellsWithDist(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(subs), nProbe))
}
