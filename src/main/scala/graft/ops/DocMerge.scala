package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-aware document merge and cleanup — the reference's deep LUT
  * merge (`search/doc_merger.js:12-28`: lodash mergeWith + array
  * concat, case-insensitive key fallback at :23-24) and recursive
  * empty-field pruning (`search/decorate.js:124-143`) re-derived as
  * STATIC column expressions: the merge/prune plan is built from the
  * schema at planning time, so execution is ordinary codegen'd struct
  * rebuilds — no generic JSON walking per row, no UDF.
  */
object DocMerge {

  /** Merge columns of `right` into `left` (both keyed by `key`):
    *  - arrays: concat left++right, distinct (lodash array-concat rule)
    *  - structs: recursive field-wise merge
    *  - scalars: right wins when non-null, else left (LUT overrides doc)
    * Join is LEFT: docs without a LUT row pass through. The LUT side
    * should be the smaller input; pass `broadcastRight = true` (default)
    * to pin the broadcast hash join exactly like the reference's
    * in-heap LUT probe.
    */
  def deepMerge(
      left: DataFrame,
      right: DataFrame,
      key: String,
      broadcastRight: Boolean = true,
      caseInsensitiveFallback: Boolean = false): DataFrame = {
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      if (c == key) df else df.withColumnRenamed(c, s"__r_$c")
    }.withColumn("__r_hit", lit(true))
    val rr = if (broadcastRight) broadcast(r0) else r0
    val exact = left.join(rr, Seq(key), "left")
    // reference fallback (`search/doc_merger.js:23-24`): probe the LUT
    // by exact key, else by the upper-cased key — expressed as a second
    // left join against the upper-keyed LUT, losers coalesced per column
    val joined = if (!caseInsensitiveFallback) exact else {
      val rUp0 = right.columns.foldLeft(right) { (df, c) =>
        if (c == key) df else df.withColumnRenamed(c, s"__ru_$c")
      }
      // when two LUT keys collide case-insensitively, pick the smallest
      // original key — dropDuplicates would choose partition-order-
      // dependently, breaking run-to-run determinism
      val byUpper = org.apache.spark.sql.expressions.Window
        .partitionBy(upper(col(key))).orderBy(col(key))
      val rUp = rUp0
        .withColumn("__rn", row_number().over(byUpper))
        .where(col("__rn") === 1)
        .drop("__rn")
        .withColumn(key, upper(col(key)))
      val rUpB = if (broadcastRight) broadcast(rUp) else rUp
      exact
        .withColumn("__upkey", upper(col(key)))
        .join(rUpB.withColumnRenamed(key, "__upkey"), Seq("__upkey"), "left")
        .drop("__upkey")
    }
    // The fallback is PER ROW, not per column (`search/doc_merger.js:
    // 23-24`: exact probe, ELSE ci probe): the upper-key row applies only
    // when the exact join missed entirely — otherwise null fields of the
    // matched LUT row would backfill from a DIFFERENT LUT entry.
    def rightCol(name: String): Column =
      if (caseInsensitiveFallback)
        when(col("__r_hit").isNotNull, col(s"__r_$name"))
          .otherwise(col(s"__ru_$name"))
      else col(s"__r_$name")
    val rightSchema = right.schema.filter(_.name != key).map(f => f.name -> f.dataType).toMap
    val merged = left.schema.fields.filter(_.name != key).map { f =>
      rightSchema.get(f.name) match {
        case Some(rt) =>
          mergeValue(col(f.name), rightCol(f.name), f.dataType, rt).as(f.name)
        case None => col(f.name)
      }
    }
    val rightOnly = right.schema.fields
      .filter(f => f.name != key && !left.columns.contains(f.name))
      .map(f => rightCol(f.name).as(f.name))
    joined.select((col(key) +: (merged ++ rightOnly)).toIndexedSeq: _*)
  }

  private def mergeValue(l: Column, r: Column, lt: DataType, rt: DataType): Column =
    (lt, rt) match {
      case (_: ArrayType, _: ArrayType) =>
        // concat of nulls is null -> coalesce the pieces first
        array_distinct(concat(
          coalesce(l, array()), coalesce(r, array())))
      case (ls: StructType, rs: StructType) =>
        val rFields = rs.fields.map(f => f.name -> f.dataType).toMap
        val fields = ls.fields.map { f =>
          rFields.get(f.name) match {
            case Some(rft) =>
              mergeValue(l.getField(f.name), r.getField(f.name), f.dataType, rft)
                .as(f.name)
            case None => l.getField(f.name).as(f.name)
          }
        }
        // getField on a null struct yields null, so the merged struct is
        // well-typed (left's shape) even when one side is absent
        when(l.isNull && r.isNull, lit(null))
          .otherwise(struct(fields.toIndexedSeq: _*))
      case _ => coalesce(r, l)
    }

  /** Recursive empty-field pruning (`search/decorate.js:124-143`):
    * empty strings -> null, empty arrays -> null, structs whose fields
    * are all null -> null — applied bottom-up over the whole schema so
    * a struct emptied by pruning disappears too, matching the
    * reference's delete-empty-objects recursion.
    */
  def pruneEmpty(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map(f => pruneValue(col(f.name), f.dataType).as(f.name))
    df.select(cols.toIndexedSeq: _*)
  }

  private def pruneValue(c: Column, t: DataType): Column = t match {
    case StringType => nullif(c, lit(""))
    case at: ArrayType =>
      val pruned = filter(
        transform(c, e => pruneValue(e, at.elementType)),
        e => e.isNotNull)
      when(c.isNull || size(pruned) === 0, lit(null)).otherwise(pruned)
    case st: StructType =>
      val fields = st.fields.map(f => pruneValue(c.getField(f.name), f.dataType).as(f.name))
      val allNull = fields.map(_.isNull).reduce(_ && _)
      when(c.isNull || allNull, lit(null)).otherwise(struct(fields.toIndexedSeq: _*))
    case _ => c
  }

  /** Canonical JSON export of pruned documents (`search/dump_genes.js:
    * 402` JSONL sink with the decorate cleanup applied): null fields
    * dropped from the serialized output.
    */
  def toCanonicalJson(df: DataFrame): DataFrame =
    pruneEmpty(df).select(
      to_json(struct(df.columns.map(col).toIndexedSeq: _*),
        Map("ignoreNullFields" -> "true")).as("json"))
}
