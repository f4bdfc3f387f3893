package graft

import org.apache.spark.sql.functions._

import graft.functions.Varint
import graft.ops.InvertedIndex

/** Varint encoding + the compressed posting shards: lossless
  * round-trip, byte-layout pins, and layout-independence.
  */
class VarintSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip: decode(encode(xs)) == xs across magnitudes") {
    val cases = Seq(
      Seq.empty[Long],
      Seq(0L),
      Seq(127L, 128L, 129L),
      Seq(0L, 1L, 16383L, 16384L, Long.MaxValue),
      (0 to 200).map(i => (1L << (i % 63)) - 1 + i).toSeq)
    cases.foreach { xs =>
      val enc = Seq(Tuple1(xs)).toDF("v")
        .select(Varint.encode(col("v"))).head().getAs[Array[Byte]](0)
      assert(Varint.decode(enc) === xs)
    }
  }

  test("byte layout pinned: LEB128 little-endian 7-bit groups") {
    def enc(xs: Seq[Long]) = Seq(Tuple1(xs)).toDF("v")
      .select(Varint.encode(col("v"))).head().getAs[Array[Byte]](0)
    assert(enc(Seq(0L)).toSeq === Seq(0x00.toByte))
    assert(enc(Seq(1L)).toSeq === Seq(0x01.toByte))
    assert(enc(Seq(127L)).toSeq === Seq(0x7f.toByte))
    assert(enc(Seq(128L)).toSeq === Seq(0x80.toByte, 0x01.toByte))
    assert(enc(Seq(300L)).toSeq === Seq(0xac.toByte, 0x02.toByte))
  }

  test("negative values refuse loudly") {
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(-1L))).toDF("v")
        .select(Varint.encode(col("v"))).head()
    }
    assert(e.getMessage.contains("negative") ||
      e.getCause != null && e.getCause.getMessage.contains("negative"))
  }

  test("over-long varints refuse loudly instead of wrapping mod 64") {
    // 10 continuation bytes push shift past 63; JVM << masks the shift
    // amount, so without the bound this would silently decode to a
    // WRONG value — it must throw (9 bytes is the max for a
    // non-negative long, which is all encode() ever emits)
    val overlong = Array.fill[Byte](10)(0x81.toByte) :+ 0x01.toByte
    val e = intercept[IllegalArgumentException] { Varint.decode(overlong) }
    assert(e.getMessage.contains("varint too long"))
    // the longest LEGAL stream (9 bytes, 62 set bits) still decodes
    val max = Long.MaxValue >> 1 // 62 bits: 8 continuation bytes + final
    assert(Varint.decode(Varint.encodeImpl(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(max)))) === Seq(max))
  }

  test("postingsDecode: lossless round-trip of the binary index, and " +
      "index-served phrase search equals the corpus-scan plan") {
    val docs = (0L until 150L).map(i =>
      (i, s"w${i % 5} w${i % 11} w${i % 5} w${i % 7}")).toDF("doc_id", "text")
    val idx = InvertedIndex.postingShardsBinary(docs, "text", "doc_id", 40L)
    // decode every shard and rebuild the ASCII canonical form: must
    // match postingShards' digest input exactly
    val decoded = idx.select(col("term"), col("shard"),
        explode(Varint.postingsDecode(col("bin"), col("shard") * 40L)).as("e"))
      .select(col("term"), col("shard"), col("e.doc_id").as("doc_id"),
        col("e.ps").as("ps"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case (k, rows) =>
        k -> rows.map(r => f"${r.getLong(2)}%012d:" +
          r.getSeq[Long](3).mkString(",")).sorted.mkString(";")
      }
    val ascii = InvertedIndex.postingShards(docs, "text", "doc_id", 40L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(4))
      .toMap
    assert(decoded.keySet === ascii.keySet)
    decoded.foreach { case (k, canonical) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5 === ascii(k), s"shard $k decode mismatch")
    }
    // phrase search from the index == phrase search from the corpus
    for (phrase <- Seq(Seq("w0", "w0"), Seq("w1", "w1", "w1"), Seq("w2", "w4"))) {
      val fromIdx = InvertedIndex.phraseMatchesFromPostings(idx, 40L, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fromCorpus = InvertedIndex.phraseMatches(docs, "text", "doc_id", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fromIdx === fromCorpus, s"phrase $phrase")
    }
  }

  test("postingsDecode refuses corrupt payloads loudly") {
    val bad = Seq(Tuple1(Array[Byte](0x05, 0x00))).toDF("b") // ddoc=5, then truncated
    val e = intercept[Exception] {
      bad.select(Varint.postingsDecode(col("b"), lit(0L))).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("posting") || msg.contains("truncated"))
  }

  test("compressed posting shards: deterministic across partitionings, " +
      "counts equal the ASCII variant, and the payload genuinely " +
      "compresses") {
    val docs = (0L until 120L).map(i =>
      (i, s"w${i % 5} w${i % 11} w${i % 5}")).toDF("doc_id", "text")
    def run(parts: Int) = InvertedIndex.postingShardsCompressed(
      docs.repartition(parts), "text", "doc_id", 30L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5), r.getLong(6))).toSet
    val a = run(1)
    assert(a === run(7))
    val plain = InvertedIndex.postingShards(docs, "text", "doc_id", 30L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    a.foreach { case (term, shard, dfS, tfS, _, vb, rb) =>
      assert(plain((term, shard)) === (dfS, tfS))
      assert(vb < rb, s"$term/$shard: varint $vb !< raw $rb")
    }
  }
}
