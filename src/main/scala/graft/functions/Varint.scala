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

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.BinaryExpression
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{StructField, StructType}

  private val postingStructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("ps", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** Decode one shard's canonical posting payload back to
    * `(doc_id, positions)` entries: the stream is
    * `[doc_delta, n_pos, pos₀, pos_deltas…]` per doc, doc ids
    * re-absoluted from `base` (= shard · shardSpan). Throws on a
    * truncated or structurally invalid stream — a corrupt artifact
    * must fail the query, not return partial postings.
    */
  def decodePostingsImpl(bytes: Array[Byte], base: Long): GenericArrayData = {
    val vs = decode(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    var doc = base
    while (i < vs.length) {
      require(i + 2 <= vs.length, "truncated posting chunk header")
      doc += vs(i)
      val n = vs(i + 1)
      require(n >= 1 && i + 2 + n <= vs.length,
        s"invalid posting chunk: n_pos=$n at offset $i")
      val ps = new Array[Long](n.toInt)
      var p = 0L
      var j = 0
      while (j < n) {
        p += vs(i + 2 + j.toInt)
        ps(j) = p
        j += 1
      }
      out += InternalRow(doc, new GenericArrayData(ps))
      i += 2 + n.toInt
    }
    new GenericArrayData(out.toArray[Any])
  }

  case class PostingsDecode(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(postingStructType, containsNull = false)
    override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
    override protected def nullSafeEval(b: Any, base: Any): Any =
      decodePostingsImpl(b.asInstanceOf[Array[Byte]], base.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, base) =>
        s"graft.functions.Varint.decodePostingsImpl($b, $base)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Decode a posting payload column: array<struct<doc_id, ps>>. */
  def postingsDecode(bin: Column, base: Column): Column =
    GraftColumnBridge.column(PostingsDecode(
      GraftColumnBridge.expression(bin), GraftColumnBridge.expression(base)))

  /** Decoder — the round-trip proof lives in VarintSpec; production
    * readers would use it to stream a shard's postings back out.
    */
  def decode(bytes: Array[Byte]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var v = 0L
    var shift = 0
    bytes.foreach { b =>
      // JVM `<<` masks the shift mod 64, so an over-long varint (10+
      // continuation bytes — impossible for a non-negative long, which
      // encode() caps at 9 bytes) would WRAP and silently decode to a
      // wrong value; a corrupt artifact must fail loudly instead
      require(shift <= 56,
        "varint too long: a non-negative long needs at most 9 bytes — " +
          "corrupt posting stream")
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) != 0) shift += 7
      else { out += v; v = 0L; shift = 0 }
    }
    require(shift == 0 && v == 0L, "truncated varint stream")
    out.toSeq
  }
}
