package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Shingling, TextAnalytics}

/** Dev-only volume diagnostic for q63's APSS stages at a given SF:
  * replicates the hashed-dim TF-IDF build and the posting decision,
  * then COUNTS (never materializes) the candidate join rows before and
  * after the per-row residual pre-filter — the numbers that decide
  * whether the pair-groupBy shuffle fits a box's scratch disk.
  */
object Q63Volumes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val t = 0.6
    val half = t / 2
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        transform(
          Shingling.sortedShingles(TextAnalytics.tokens(col("text")), 3),
          g => xxhash64(g)).as("sh"))
      .where(size(col("sh")) > 0)
      .localCheckpoint(false)
    val n = timed("docs")(sh.count())
    println(s"  n=$n")
    val e = sh.select(col("doc_id"), explode(col("sh")).as("dim"))
    val dfreq = e.groupBy("dim").agg(count(lit(1)).as("df"))
    timed("df dist")(dfreq.agg(count(lit(1)).as("vocab"),
      max("df"), avg("df")).show())
    val terms = e.join(dfreq, "dim")
      .groupBy("doc_id")
      .agg(collect_list(struct(col("dim"),
        log(lit(n.toDouble) / col("df")).as("w"))).as("terms"))
    // normalize + keyed bound attach + greedy decide (Apss replica)
    val normed = terms
      .select(col("doc_id").as("id"),
        col("terms").as("terms"))
      .withColumn("nrm", sqrt(aggregate(col("terms"), lit(0.0),
        (s, x) => s + x.getField("w") * x.getField("w"))))
      .where(col("nrm") > 0)
      .select(col("id"), transform(col("terms"), x => struct(
        x.getField("dim").as("dim"),
        (x.getField("w") / col("nrm")).as("wn"))).as("terms"))
      .localCheckpoint(false)
    timed("normed")(normed.count())
    val bounds = normed.select(explode(col("terms")).as("x"))
      .groupBy(col("x.dim").as("dim")).agg(max(abs(col("x.wn"))).as("maxw"))
    val withCb = normed.select(col("id"), explode(col("terms")).as("x"))
      .select(col("id"), col("x.dim").as("dim"), col("x.wn").as("wn"))
      .join(bounds, Seq("dim"))
      .groupBy("id")
      .agg(collect_list(struct(col("dim"), col("wn"),
        (abs(col("wn")) * col("maxw")).as("cb"))).as("terms"))
    val decided = withCb.select(col("id"),
      aggregate(
        array_sort(transform(col("terms"), x => struct(
          x.getField("cb").as("contrib"), x.getField("dim").as("dim")))),
        struct(lit(0.0).as("cum"),
          array().cast("array<struct<dim:bigint,cb:double>>").as("ps")),
        (acc, x) => {
          val cum = acc.getField("cum") + x.getField("contrib")
          struct(cum.as("cum"),
            when(cum >= half, array_append(acc.getField("ps"), struct(
              x.getField("dim").as("dim"), acc.getField("cum").as("cb"))))
              .otherwise(acc.getField("ps")).as("ps"))
        },
        acc => struct(
          transform(acc.getField("ps"), p => struct(
            p.getField("dim").as("dim"),
            (acc.getField("cum") - p.getField("cb")).as("rem"))).as("dims"),
          coalesce(try_element_at(acc.getField("ps"), lit(1)).getField("cb"),
            acc.getField("cum")).as("dropped"))).as("pd"))
      .select(col("id"), col("pd.dims").as("posted"),
        col("pd.dropped").as("dropped"))
      .localCheckpoint(false)
    timed("decide")(decided.count())
    val postings = decided
      .select(col("id"), col("dropped"), explode(col("posted")).as("p"))
      .select(col("p.dim").as("dim"), col("id"),
        col("p.rem").as("rem"), col("dropped"))
      .localCheckpoint(false)
    timed("postings")(println("  postings=" + postings.count()))
    timed("predicted (sum df(df-1)/2)")(postings
      .groupBy("dim").agg(count(lit(1)).as("c"))
      .agg(sum(expr("CAST(c AS DOUBLE)*(c-1)/2")).as("predicted"),
        max("c").as("hottest")).show())
    val a = postings.select(col("dim"), col("id").as("id_a"),
      col("rem").as("rem_a"), col("dropped").as("da"))
    val b = postings.select(col("dim"), col("id").as("id_b"),
      col("rem").as("rem_b"), col("dropped").as("db"))
    val joined = a.join(b, Seq("dim")).where(col("id_a") < col("id_b"))
    timed("join rows (count only)")(println("  joinRows=" + joined.count()))
    timed("filtered rows (count only)")(println("  filtered=" + joined
      .where(greatest(col("rem_a"), col("rem_b")) + col("da") + col("db") >=
        t - 1e-9).count()))
    spark.stop()
  }
}
