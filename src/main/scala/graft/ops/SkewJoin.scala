package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys. AQE's skew-join handles most cases at
  * runtime (sort-merge splits); salting is the explicit fallback for
  * the pathological hot-key shapes AQE can't split — e.g. a broadcast
  * -ineligible dimension joined on a key where one value holds >10% of
  * the fact table (the reference's equivalent hazard: every gene of a
  * genome hitting one taxon row).
  *
  * `left` (large, skewed) gets a random salt in [0, factor); `right`
  * (the smaller side) is replicated once per salt value. The join key
  * becomes (key, salt): the hot key's rows spread over `factor`
  * reducers instead of one.
  */
object SkewJoin {

  def salted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      factor: Int,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    val salt = "__graft_salt"
    // deterministic spread: hash of a unique-ish combination of all
    // left columns, not rand() — keeps runs reproducible
    val lSalted = left.withColumn(
      salt, pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val rSalted = right
      .withColumn(salt, explode(sequence(lit(0), lit(factor - 1))))
    lSalted.join(rSalted, Seq(key, salt), joinType).drop(salt)
  }

  /** Frequency-aware variant: only keys in `hotKeys` are salted; the
    * rest join with salt 0 and a single right replica — replication
    * cost stays proportional to the hot subset. `hotKeys` typically
    * comes from a cheap approximate count (`df.groupBy(key).count`
    * over a sample).
    */
  def saltedHotKeys(
      left: DataFrame,
      right: DataFrame,
      key: String,
      hotKeys: Seq[Any],
      factor: Int): DataFrame = {
    val salt = "__graft_salt"
    val isHot: Column = col(key).isin(hotKeys: _*)
    val lSalted = left.withColumn(
      salt,
      when(isHot, pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(factor)))
        .otherwise(lit(0)))
    val rSalted = right.withColumn(
      salt,
      explode(when(isHot, sequence(lit(0), lit(factor - 1)))
        .otherwise(array(lit(0)))))
    lSalted.join(rSalted, Seq(key, salt)).drop(salt)
  }
}
