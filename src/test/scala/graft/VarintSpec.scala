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
