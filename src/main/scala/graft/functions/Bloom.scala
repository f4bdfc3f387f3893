package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast Bloom-filter membership as a native codegen predicate —
  * the scan-side prefilter that turns a corpus-sized shuffle into a
  * candidate-sized one wherever the probe set is compact enough to
  * sketch (benchmark n-grams in decontamination, blocklists, id
  * screens). The filter is built DISTRIBUTED by Spark's own sketch
  * aggregation (`df.stat.bloomFilter` — per-task filters, tree-merged,
  * only the final bitset reaches the driver) and shipped to executors
  * as a torrent broadcast, NOT as a plan literal: Spark's own
  * runtime-filter injection embeds the serialized filter in every task
  * binary, which at the byte budgets this module allows (hundreds of
  * MB) would re-ship the bitset with every stage.
  *
  * Correctness contract: `mightContain` can return false POSITIVES,
  * never false negatives — so it is sound exactly as a PREFILTER in
  * front of an exact verification join (the only way this module is
  * used; see [[graft.ops.Decontaminate.bloomOverlap]]). Because of
  * that, the byte budget can CAP the bitset instead of refusing the
  * launch: an undersized filter only degrades selectivity, never
  * results.
  */
object Bloom {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Byte budget for one Bloom bitset (built once, broadcast to every
    * executor). Past it the filter is CAPPED, not refused — the fpp
    * degrades, results cannot (exact verify downstream). Default
    * 256 MiB ≈ 214M items at the 1% design point (9.6 bits/item).
    */
  val BloomBytesKey = "graft.decontaminate.bloomBytes"
  val DefaultBloomBytes: Long = 256L << 20

  def bloomBytes(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption(BloomBytesKey).map(_.toLong)
      .getOrElse(DefaultBloomBytes)

  /** Build a Bloom filter over a string column, distributed, with the
    * bitset capped at `maxBytes`. `expectedItems` sizes the hash-count
    * (k) — an estimate is fine; only the CAP is load-bearing.
    */
  def buildString(
      df: DataFrame,
      colName: String,
      expectedItems: Long,
      fpp: Double,
      maxBytes: Long): BloomFilter = {
    val items = math.max(expectedItems, 1L)
    val optimalBits = BloomFilter.optimalNumOfBits(items, fpp)
    val bits = math.max(math.min(optimalBits, maxBytes * 8L), 64L)
    if (bits < optimalBits)
      log.info(
        s"bloom filter capped: optimal ${optimalBits / 8} bytes for " +
          s"$items items at fpp=$fpp exceeds budget $maxBytes " +
          s"($BloomBytesKey); capping degrades the prefilter's " +
          "selectivity, not the exact-verified result")
    df.stat.bloomFilter(colName, items, bits)
  }

  /** `filter.mightContainBinary(child.utf8Bytes)` — matches
    * `putString`/`stat.bloomFilter`'s UTF-8 insert path. The broadcast
    * HANDLE rides the serialized expression; executors fetch the
    * bitset once per JVM via the block manager and bind it once per
    * codegen instance (no per-row `Broadcast.value` lookup).
    */
  case class BloomMightContain(child: Expression, filter: Broadcast[BloomFilter])
      extends UnaryExpression with ExpectsInputTypes {
    override def prettyName: String = "bloom_might_contain"
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = BooleanType
    override def inputTypes: Seq[DataType] = Seq(StringType)
    @transient private lazy val local = filter.value
    override protected def nullSafeEval(s: Any): Any =
      local.mightContainBinary(s.asInstanceOf[UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj(
        "bloomBc", filter, classOf[Broadcast[BloomFilter]].getName)
      val bloom = ctx.addMutableState(
        "org.apache.spark.util.sketch.BloomFilter", "bloom",
        v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();",
        forceInline = true)
      defineCodeGen(ctx, ev, c => s"$bloom.mightContainBinary($c.getBytes())")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def mightContain(value: Column, filter: Broadcast[BloomFilter]): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(value), filter))
}
