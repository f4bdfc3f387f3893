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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Single-file, single-ROW-GROUP parquet (the test harness's layout;
    // verified with pyarrow) is unsplittable: the scan yields ONE
    // partition regardless of core count, so every per-row kernel and
    // partial aggregate before the first exchange runs single-threaded
    // — at audit scale that serialized minutes of work. Fan the scan
    // out when it is under-partitioned for the machine and the table
    // is not dim-tiny. Predicate pushdown and column pruning both move
    // through Repartition, so the exchange carries only pruned rows.
    // On a real cluster reading many splits (parts >= cores) this is a
    // no-op — it exists to make local single-file inputs behave like
    // the many-split layout a deployment would have.
    val target = spark.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes > (64L << 10) && df.rdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }

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
