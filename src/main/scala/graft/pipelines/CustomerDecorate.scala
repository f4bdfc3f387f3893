package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.DocMerge

/** End-to-end decorated-document pipeline — the engine's restatement of
  * the reference's flagship genes pipeline (`search/decorate.js:169-194`
  * and SURVEY §3.1/§7.3) over the test star schema: one denormalized
  * JSON document per customer, assembled from facts and dims the way
  * gene docs are assembled from transcripts, xrefs, and LUTs.
  *
  * Stage map (reference decorator -> here):
  *  - transcript assembly J1/J5      -> orders array, ordered, as structs
  *  - canonical transcript W2        -> earliest order (argmax) struct
  *  - taxonomy/LUT broadcast J6/J18  -> nation+region broadcast join
  *  - genomic binning T17            -> acctbal decile bin
  *  - homolog/session stats J7       -> per-user event session count
  *  - empty-pruning + serialize P3/S14 -> DocMerge.toCanonicalJson
  *
  * Scale: one shuffle for the orders fold (groupBy custkey), one for
  * the sessions fold (groupBy user), broadcast for dims; the final
  * join set is co-partitioned on the customer key. At 100 TB this is
  * shuffle-minimal: every stage keys on the document id.
  */
object CustomerDecorate {

  def run(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val events = Tables.events(spark, dir)

    // J1/J5: fold each customer's orders into an ordered struct array
    val orderDocs = orders
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        sort_array(collect_list(struct(
          col("o_orderdate").as("date"),
          col("o_orderkey").as("id"),
          col("o_totalprice").as("total"),
          col("o_orderpriority").as("priority")))).as("orders"),
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("lifetime_value"))

    // W2: canonical = earliest order (argmax with deterministic ties)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val canonical = orders
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(
        col("o_custkey").as("c_custkey"),
        struct(
          col("o_orderkey").as("id"),
          col("o_orderdate").as("date"),
          col("o_orderpriority").as("priority")).as("first_order"))

    // J7-shape: per-user session count from the events stream (>30 min
    // silence starts a session), left-joined onto the docs
    val gaps = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sessions = events
      .withColumn("gap", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(gaps))
      .withColumn("is_new", when(col("gap").isNull || col("gap") > 1800L * 1000000L, 1L).otherwise(0L))
      .groupBy(col("user_id").as("c_custkey"))
      .agg(sum("is_new").as("n_sessions"), count(lit(1)).as("n_events"))

    // J18: broadcast dims; T17: decile bin on account balance
    val geo = broadcast(
      Tables.nation(spark, dir).join(
        broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name").as("nation"), col("r_name").as("region")))

    val decorated = customer
      .select(
        col("c_custkey"), col("c_name").as("name"), col("c_nationkey"),
        col("c_acctbal"),
        floor((col("c_acctbal") + 1000) / 1200).cast("long").as("acctbal_bin"))
      .join(geo, col("c_nationkey") === col("n_nationkey"), "left")
      .join(orderDocs, Seq("c_custkey"), "left")
      .join(canonical, Seq("c_custkey"), "left")
      .join(sessions, Seq("c_custkey"), "left")
      .select(
        col("c_custkey").as("id"), col("name"),
        struct(col("nation"), col("region")).as("geo"),
        col("acctbal_bin"),
        col("n_orders"), col("lifetime_value"), col("first_order"),
        col("orders"), col("n_sessions"), col("n_events"))

    decorated
  }

  /** The serialized export (P3 prune + S14 JSONL shape): one canonical
    * JSON doc per customer, keyed for golden comparison.
    */
  def json(spark: SparkSession, dir: String): DataFrame = {
    val d = run(spark, dir)
    val pruned = DocMerge.pruneEmpty(d)
    pruned.select(
      col("id"),
      to_json(
        struct(d.columns.filter(_ != "id").map(col).toIndexedSeq: _*),
        java.util.Collections.singletonMap("ignoreNullFields", "true")).as("doc"))
  }
}
