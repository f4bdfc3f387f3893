package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** LEB128-style varint encoding of a non-negative long stream — the
  * posting-list compression for [[graft.ops.InvertedIndex]]: each
  * value is little-endian base-128 with a continuation bit on every
  * byte but the last, so small deltas (the common case after
  * delta-encoding sorted doc ids and positions) cost one byte instead
  * of a decimal string. The byte layout is SIMPLE ARITHMETIC —
  * `((v >> 7i) & 127) | (more ? 128 : 0)` — so a SQL oracle replays
  * the exact bytes with shifts and a printf('%02x') (see the q109
  * oracle), keeping the compressed artifact hash-gateable, not just
  * size-claimable. Negative values refuse loudly (the posting streams
  * are deltas of sorted non-negative ids — a negative here means the
  * caller broke the sort invariant, not a value to zig-zag).
  */
object Varint {

  def encodeImpl(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    // first pass sizes the buffer exactly
    var bytes = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      if (v < 0L)
        throw new IllegalArgumentException(
          s"varint_encode: negative value $v at index $i — the input " +
            "must be a stream of non-negative deltas")
      bytes += math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 6) / 7)
      i += 1
    }
    val out = new Array[Byte](bytes)
    var o = 0
    i = 0
    while (i < n) {
      var v = arr.getLong(i)
      var more = true
      while (more) {
        val b = (v & 0x7fL).toInt
        v >>>= 7
        more = v != 0L
        out(o) = (if (more) b | 0x80 else b).toByte
        o += 1
      }
      i += 1
    }
    out
  }

  case class VarintEncode(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = BinaryType
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override protected def nullSafeEval(a: Any): Any =
      encodeImpl(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.Varint.encodeImpl($a)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Encode an array<long> of non-negative values to varint bytes. */
  def encode(values: Column): Column =
    GraftColumnBridge.column(VarintEncode(GraftColumnBridge.expression(values)))

  /** Decoder — the round-trip proof lives in VarintSpec; production
    * readers would use it to stream a shard's postings back out.
    */
  def decode(bytes: Array[Byte]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var v = 0L
    var shift = 0
    bytes.foreach { b =>
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) != 0) shift += 7
      else { out += v; v = 0L; shift = 0 }
    }
    require(shift == 0 && v == 0L, "truncated varint stream")
    out.toSeq
  }
}
