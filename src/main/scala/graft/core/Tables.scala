package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet test tables
  * (TESTDATA.md). In the reference every pipeline starts from a named
  * MongoDB collection or MySQL table (e.g. `search/decorate.js:8,167`);
  * here every query starts from a named parquet table. At cluster scale
  * these would be partitioned/bucketed managed tables — the accessors
  * keep that swap in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The driver's events.ts is parquet TIMESTAMP(NANOS), which Spark 4
    * refuses by default. The values are whole microseconds (verified in
    * the test data), so reading nanos as long and truncating to micros
    * is lossless; downstream code sees a normal TimestampType column.
    * A table that already carries a standard timestamp (e.g. the
    * ScaleUp-synthesized copies, or any real deployment writing micros)
    * passes through untouched.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
