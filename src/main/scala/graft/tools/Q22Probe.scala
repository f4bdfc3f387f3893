package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.TextAnalytics
object Q22Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = 0.5
    val sh = Tables.documents(spark, d).select(
      col("lang").as("block"), col("doc_id").as("id"),
      sort_array(TextAnalytics.shingles(col("text"), 2)).as("sh")).cache()
    println("docs=" + sh.count())
    println("avg shingles=" + sh.select(avg(size(col("sh")))).head.getDouble(0))
    val exploded = sh.select(col("block"), col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("tok"))
    val tokFreq = exploded.groupBy("block", "tok").agg(count(lit(1)).as("freq"))
    println("distinct (block,tok)=" + tokFreq.count())
    val byRarity = Window.partitionBy("block", "id").orderBy(col("freq"), col("tok"))
    val prefixes = exploded.join(tokFreq, Seq("block", "tok"))
      .withColumn("rn", row_number().over(byRarity))
      .where(col("rn") <= col("sz") - ceil(lit(t) * col("sz")).cast("int") + 1)
      .select("block", "id", "sz", "tok", "rn").cache()
    println("prefix rows=" + prefixes.count())
    var t0 = System.nanoTime()
    val joined = prefixes.select(col("block"), col("tok"), col("id").as("id_a"), col("sz").as("sz_a"), col("rn").as("rn_a"))
      .join(prefixes.select(col("block"), col("tok"), col("id").as("id_b"), col("sz").as("sz_b"), col("rn").as("rn_b")), Seq("block", "tok"))
      .where(col("id_a") < col("id_b") && col("sz_b") * t <= col("sz_a") && col("sz_a") * t <= col("sz_b"))
    println("joined rows=" + joined.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val cand = joined.groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(max(lit(1) + least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b"))).as("ub"))
      .where(col("ub") >= ceil(lit(t) / (1 + t) * (col("sz_a") + col("sz_b"))))
      .select("id_a", "id_b").cache()
    println("candidates=" + cand.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val ver = cand.join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("j", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") / size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("j") >= t)
    println("verified=" + ver.count() + " in " + (System.nanoTime()-t0)/1e9)
    spark.stop()
  }
}
