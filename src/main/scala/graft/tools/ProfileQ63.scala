package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Shingling, TextAnalytics}

/** Scratch profiler for the q63 TF-IDF APSS stages (dev-only). */
object ProfileQ63 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        Shingling.sortedShingles(TextAnalytics.tokens(col("text")), args.lift(1).map(_.toInt).getOrElse(2)).as("sh"))
      .where(size(col("sh")) > 0)
      .localCheckpoint(false)
    val n = timed("shingle count")(sh.count())
    val e = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val dfreq = e.groupBy("shingle").agg(count(lit(1)).as("df"))
    timed("vocab size")(println("  vocab=" + dfreq.count()))
    timed("df dist")(dfreq.select(
      max(col("df")), avg(col("df")),
      sum(when(col("df") === 1, 1)).as("df1")).show())
    val terms = e.join(dfreq, "shingle")
      .groupBy("doc_id")
      .agg(collect_list(struct(
        col("shingle").as("dim"),
        log(lit(n.toDouble) / col("df")).as("w"))).as("terms"))
      .localCheckpoint(false)
    timed("terms build")(terms.count())

    // replicate Apss internals to count postings / candidates
    val t = 0.6
    // normalized + decide, keyed bounds
    val normed = terms
      .select(col("doc_id").as("id"), col("terms").as("terms"))
      .withColumn("nrm",
        sqrt(aggregate(col("terms"), lit(0.0),
          (s, x) => s + x.getField("w") * x.getField("w"))))
      .where(col("nrm") > 0)
      .select(col("id"),
        transform(col("terms"), x => struct(
          x.getField("dim").as("dim"),
          (x.getField("w") / col("nrm")).as("wn"))).as("terms"))
      .localCheckpoint(false)
    timed("normed")(normed.count())
    val bounds = normed.select(explode(col("terms")).as("t"))
      .groupBy(col("t.dim").as("dim")).agg(max(abs(col("t.wn"))).as("maxw"))
    val exploded = normed.select(col("id"), explode(col("terms")).as("t"))
      .select(col("id"), col("t.dim").as("dim"), col("t.wn").as("wn"))
    val withCb = exploded.join(bounds, Seq("dim"))
      .groupBy("id")
      .agg(collect_list(struct(
        col("dim"), col("wn"),
        (abs(col("wn")) * col("maxw")).as("cb"))).as("terms"))
    timed("withCb")(withCb.count())
    // posting stats: how many dims survive the t/2 drop per vector
    val half = t / 2
    val posted = withCb.select(col("id"),
      aggregate(
        array_sort(transform(col("terms"), x => struct(
          x.getField("cb").as("contrib"), x.getField("dim").as("dim")))),
        struct(lit(0.0).as("cum"), lit(0).as("nPost")),
        (acc, x) => {
          val cum = acc.getField("cum") + x.getField("contrib")
          struct(cum.as("cum"),
            (acc.getField("nPost") + when(cum >= half, 1).otherwise(0)).as("nPost"))
        },
        acc => acc.getField("nPost")).as("nPost"),
      size(col("terms")).as("nTerms"))
    timed("posting stats")(posted.select(
      sum("nPost"), avg("nPost"), avg("nTerms"), max("nPost")).show())
    // candidate pair volume through posted dims (upper bound: sum over
    // dims of postings^2)
    val postRows = withCb.select(col("id"),
      explode(aggregate(
        array_sort(transform(col("terms"), x => struct(
          x.getField("cb").as("contrib"), x.getField("dim").as("dim")))),
        struct(lit(0.0).as("cum"),
          array().cast("array<string>").as("ps")),
        (acc, x) => {
          val cum = acc.getField("cum") + x.getField("contrib")
          struct(cum.as("cum"),
            when(cum >= half, array_append(acc.getField("ps"), x.getField("dim")))
              .otherwise(acc.getField("ps")).as("ps"))
        },
        acc => acc.getField("ps"))).as("dim"))
      .localCheckpoint(false)
    timed("posting rows")(println("  postings=" + postRows.count()))
    val perDim = postRows.groupBy("dim").agg(count(lit(1)).as("c"))
    timed("pairs upper bound")(perDim.select(
      sum(col("c") * col("c")).as("sum_c2"), max("c"), avg("c")).show())
    // candidate pairs (no residual prune here — upper bound on verify
    // input) and the map-based verify cost
    val cand = postRows.select(col("dim"), col("id").as("id_a"))
      .join(postRows.select(col("dim"), col("id").as("id_b")), Seq("dim"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .localCheckpoint(false)
    timed("candidate pairs")(println("  cands=" + cand.count()))
    val m = normed.select(col("id"),
      map_from_entries(col("terms")).as("m")).localCheckpoint(false)
    m.count()
    timed("verify (map dot)")(println("  pairs=" + cand
      .join(m.select(col("id").as("id_a"), col("m").as("ma")), "id_a")
      .join(m.select(col("id").as("id_b"), col("m").as("mb")), "id_b")
      .withColumn("sim",
        aggregate(map_entries(col("ma")), lit(0.0),
          (s2, x) => s2 + x.getField("value") *
            coalesce(element_at(col("mb"), x.getField("key")), lit(0.0))))
      .where(col("sim") >= t).count()))
    spark.stop()
  }
}
