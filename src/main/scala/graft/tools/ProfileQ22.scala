package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Shingling, TextAnalytics}

/** Scratch profiler for the q22 PPJoin stages (dev-only). */
object ProfileQ22 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val threshold = 0.5
    val docs = Tables.documents(spark, sfDir)
    timed("docs warm")(docs.count())
    def shPlan() = docs
      .select(col("lang").as("block"), col("doc_id").as("id"),
        TextAnalytics.tokens(col("text")).as("toks"))
      .select(col("block"), col("id"),
        Shingling.sortedShingles(col("toks"), 2).as("sh"))
      .where(size(col("sh")) > 0)
    (1 to 3).foreach { i =>
      timed(s"shingle build native #$i")(
        shPlan().select(sum(size(col("sh")))).collect())
    }
    val sh = timed("shingle ckpt") {
      val c = shPlan().localCheckpoint(false); c.count(); c
    }
    val exploded = sh.select(
      col("block"), col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("tok"))
    val tokFreq = exploded.groupBy("block", "tok").agg(count(lit(1)).as("freq"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("block", "id").orderBy(col("freq"), col("tok"))
    def prefixPlan() = exploded
      .join(tokFreq, Seq("block", "tok"))
      .withColumn("rn", row_number().over(byRarity))
      .where(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")).cast("int") + 1)
      .select("block", "id", "sz", "tok", "rn")
    (1 to 2).foreach { i =>
      timed(s"prefixes (freq+window) #$i")(prefixPlan().count())
    }
    val prefixes = timed("prefix ckpt") {
      val c = prefixPlan().localCheckpoint(false); c.count(); c
    }
    def candPlan() = prefixes
      .select(col("block"), col("tok"),
        col("id").as("id_a"), col("sz").as("sz_a"), col("rn").as("rn_a"))
      .join(
        prefixes.select(col("block"), col("tok"),
          col("id").as("id_b"), col("sz").as("sz_b"), col("rn").as("rn_b")),
        Seq("block", "tok"))
      .where(
        col("id_a") < col("id_b") &&
          col("sz_b") * threshold <= col("sz_a") &&
          col("sz_a") * threshold <= col("sz_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(max(lit(1) + least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")))
        .as("overlap_ub"))
      .where(col("overlap_ub") >=
        ceil(lit(threshold) / (1 + threshold) * (col("sz_a") + col("sz_b"))))
      .select("id_a", "id_b")
    (1 to 2).foreach { i =>
      timed(s"candidates #$i")(candPlan().count())
    }
    val candidates = candPlan().localCheckpoint(false)
    candidates.count()
    (1 to 2).foreach { i =>
      timed(s"verify #$i")(
        candidates
          .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .withColumn("jaccard",
            graft.functions.SetSimilarity.jaccardSorted(
              col("sh_a"), col("sh_b"), threshold))
          .where(col("jaccard") >= threshold)
          .count())
    }
    spark.stop()
  }
}
