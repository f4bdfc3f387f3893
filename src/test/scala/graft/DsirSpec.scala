package graft

import org.apache.spark.sql.functions._

import graft.functions.FixedLog
import graft.ops.Dsir

/** DSIR importance scores: the distributed plan must equal an
  * independent replay of the documented integer formula on every
  * partitioning, and empty corpora refuse by name.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val raw = Seq(
    1L -> "apple banana apple",
    2L -> "cherry date",
    3L -> "apple egg egg fig",
    4L -> "banana banana banana")
  private val target = Seq(
    10L -> "apple apple apple cherry",
    11L -> "apple fig")

  private def md5Bucket(tok: String, b: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(15), 16) % b
  }

  private def brute(b: Int): Map[Long, (Long, Long)] = {
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
    val rawToks = raw.flatMap { case (id, t) => toks(t).map(id -> _) }
    val cr = rawToks.groupBy(r => md5Bucket(r._2, b)).view
      .mapValues(_.size.toLong).toMap
    val ct = target.flatMap(t => toks(t._2))
      .groupBy(md5Bucket(_, b)).view.mapValues(_.size.toLong).toMap
    val tr = cr.values.sum
    val tt = ct.values.sum
    def llr(bk: Long): Long =
      (FixedLog.iln1mImpl(ct.getOrElse(bk, 0L) + 1) -
        FixedLog.iln1mImpl(tt + b)) -
        (FixedLog.iln1mImpl(cr(bk) + 1) - FixedLog.iln1mImpl(tr + b))
    rawToks.groupBy(_._1).view.mapValues { rs =>
      (rs.size.toLong, rs.map(r => llr(md5Bucket(r._2, b))).sum)
    }.toMap
  }

  test("equals the exact-integer replay across partitionings and " +
      "bucket counts") {
    for (b <- Seq(4, 64, 1024); parts <- Seq(1, 3)) {
      val got = Dsir.importanceScores(
        raw.toDF("doc_id", "text").repartition(parts),
        target.toDF("doc_id", "text"),
        "text", "doc_id", buckets = b)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got === brute(b), s"b=$b parts=$parts")
    }
  }

  test("a doc made of target-favored tokens outscores one of " +
      "target-absent tokens (per token)") {
    // with enough buckets these vocabularies don't collide
    val got = Dsir.importanceScores(
      raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"),
      "text", "doc_id", buckets = 1024)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2).toDouble / r.getLong(1))).toMap
    // doc 1 = apple/banana (apple target-heavy); doc 4 = banana only
    assert(got(1L) > got(4L))
  }

  test("empty corpora refuse by name") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val full = raw.toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dsir.importanceScores(empty, full, "text", "doc_id")
    }
    assert(e1.getMessage.contains("raw"))
    val e2 = intercept[IllegalArgumentException] {
      Dsir.importanceScores(full, empty, "text", "doc_id")
    }
    assert(e2.getMessage.contains("target"))
  }
}
