package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val facts = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
  private val dim = Seq((1L, "hot"), (950L, "cold"))

  test("salted join equals plain join results") {
    val l = facts.toDF("k", "v")
    val r = dim.toDF("k", "name")
    val plain = l.join(r, "k").select("k", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    val salted = SkewJoin.salted(l, r, "k", factor = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 900)
  }

  test("salted left join keeps unmatched rows exactly once") {
    val l = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val r = Seq((1L, "x")).toDF("k", "name")
    val got = SkewJoin.salted(l, r, "k", factor = 4, joinType = "left")
      .select("k", "v", "name")
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((1L, "a", Some("x")), (2L, "b", None)))
  }

  test("hot-key-only salting equals plain join and replicates right minimally") {
    val l = facts.toDF("k", "v")
    val r = dim.toDF("k", "name")
    val plain = l.join(r, "k").select("k", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    val salted = SkewJoin.saltedHotKeys(l, r, "k", hotKeys = Seq(1L), factor = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(salted == plain)
  }

  test("salt distribution actually spreads the hot key") {
    val l = facts.toDF("k", "v")
    val salts = l.where(col("k") === 1L)
      .withColumn("s", pmod(hash(col("k"), col("v")), lit(8)))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(salts.size == 8, s"hot key should spread over all salts: $salts")
    assert(salts.values.max < 900, "no single salt holds the whole hot key")
  }
}
