package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ops.Packing

/** Sequence-packing invariants: the distributed two-level prefix sum
  * must equal the naive per-stratum window exactly, and the greedy
  * shard fold must replay a reference in-memory first-fit-with-reset.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("startOffsets survives a pathological single-stratum corpus") {
    // everything in one stratum — the case the naive plan serializes
    // into one task and the distributed plan must still get right
    val df = (0L until 200L).map(i => ("xx", i, i % 7)).toDF("lang", "doc_id", "w")
    val got = Packing.startOffsets(df, "lang", "doc_id", "w", 16L)
      .orderBy("doc_id").select("start_offset").as[Long].collect()
    val want = (0L until 200L).scanLeft(0L)((acc, i) => acc + i % 7).init
    assert(got.toSeq === want.toSeq)
  }

  test("packByOffset assigns the sequence the start offset falls in") {
    val df = Seq(("aa", 1L, 100L), ("aa", 2L, 100L), ("aa", 3L, 100L),
      ("aa", 4L, 100L)).toDF("lang", "doc_id", "w")
    val got = Packing.packByOffset(df, "lang", "doc_id", "w",
        budget = 250L, shardSpan = 2L)
      .select("doc_id", "start_offset", "seq_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // offsets 0,100,200,300 → seqs 0,0,0,1: doc 3 STRADDLES the
    // boundary and still belongs to seq 0 (offset semantics)
    assert(got.toSeq === Seq((1L, 0L, 0L), (2L, 100L, 0L),
      (3L, 200L, 0L), (4L, 300L, 1L)))
  }

  test("startOffsetsAuto == naive, and both levels stay ~sqrt-balanced") {
    // dense ids interleaved over 4 strata — the q74/q85/q86 shape
    val n = 4000
    val df = (0L until n.toLong).map(i => (s"l${i % 4}", i, 1L + i % 5))
      .toDF("lang", "doc_id", "w")
    val auto = Packing.startOffsetsAuto(df, "lang", "doc_id", "w")
      .select("lang", "doc_id", "start_offset")
      .as[(String, Long, Long)].collect().toSet
    val naive = Packing.startOffsetsNaive(df, "lang", "doc_id", "w")
      .select("lang", "doc_id", "start_offset")
      .as[(String, Long, Long)].collect().toSet
    assert(auto === naive)
    // the balance the helper promises: with the derived span neither
    // the per-stratum shard count (level 2) nor any (stratum, shard)
    // group (level 3) exceeds a small multiple of sqrt(n/strata)
    val span = Packing.balancedSpan(n.toLong, n.toLong, 4L)
    val bound = 4 * math.ceil(math.sqrt(n / 4.0)).toLong
    val groups = (0L until n.toLong).groupBy(i => (i % 4, i / span))
    assert(groups.values.map(_.size.toLong).max <= bound)
    assert(groups.keys.groupBy(_._1).values.map(_.size.toLong).max <= bound)
  }

  test("balancedSpan scales the shard count with the corpus on a hash-domain key") {
    // the q87 regression: a fixed span over a 60-bit hash domain froze
    // the shard count at 256 forever; the derived span must instead
    // track sqrt(n) as the corpus grows
    val domain = 1L << 60
    Seq(10L * 1000, 1000L * 1000, 100L * 1000 * 1000).foreach { n =>
      val span = Packing.balancedSpan(n, domain)
      val shards = domain / span
      val target = math.ceil(math.sqrt(n.toDouble)).toLong
      assert(shards >= target && shards <= 2 * target + 1,
        s"n=$n shards=$shards target=$target")
    }
  }

  test("greedy: no sequence exceeds the budget unless it is a single row") {
    val rows = (0L until 100L).map(i => ("aa", i, 1L + (i * 37) % 90))
    val packed = Packing.packGreedyShards(rows.toDF("lang", "doc_id", "w"),
        "lang", "doc_id", "w", budget = 100L, shardSpan = 25L)
      .groupBy("lang", "shard", "seq")
      .agg(sum("w").as("tot"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(packed.nonEmpty)
    packed.foreach { case (_, _, _, tot, n) =>
      assert(tot <= 100L || n === 1L, s"overfull multi-row sequence: $tot/$n")
    }
  }

  test("greedy handles over-budget single docs and zero-weight docs") {
    val df = Seq(("aa", 0L, 0L), ("aa", 1L, 500L), ("aa", 2L, 0L),
      ("aa", 3L, 10L)).toDF("lang", "doc_id", "w")
    val got = Packing.packGreedyShards(df, "lang", "doc_id", "w",
        budget = 100L, shardSpan = 100L)
      .select("doc_id", "seq").as[(Long, Long)].collect().sortBy(_._1)
    // doc 0 (w=0): running stays 0 → seq 0. doc 1 (w=500): running=0
    // means no overflow check → seq 0, an over-budget SINGLETON bin.
    // doc 2 (w=0): running 500 overflows even at +0 → seq 1, running 0.
    // doc 3 (w=10): running 0 → no overflow → stays seq 1.
    assert(got.toSeq === Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)))
  }
}

object PackingProperties extends Properties("packing") {
  import SharedSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private def corpus(rows: Seq[(String, Long, Long)]) =
    rows.toDF("lang", "doc_id", "w")

  private val genRows: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      lang <- Gen.oneOf("aa", "bb", "cc")
      id <- Gen.choose(0L, 500L)
      w <- Gen.choose(0L, 40L)
    } yield (lang, id, w))
  } yield
    // order keys must be unique within a stratum — dedup on (lang, id)
    rows.groupBy(r => (r._1, r._2)).map(_._2.head).toList

  /** Reference greedy fold (first-fit-with-reset) on one ordered group. */
  private def greedyRef(ws: Seq[(Long, Long)], budget: Long): Seq[(Long, Long)] = {
    var seq = 0L; var running = 0L
    ws.sortBy(_._1).map { case (o, w) =>
      if (running > 0 && running + w > budget) { seq += 1; running = 0 }
      running += w
      (o, seq)
    }
  }

  property("distributed startOffsets == naive window layout") =
    forAll(genRows, Gen.oneOf(1L, 7L, 64L, 1000L)) { (rows, span) =>
      val df = corpus(rows)
      val got = Packing.startOffsets(df, "lang", "doc_id", "w", span)
        .select("lang", "doc_id", "w", "start_offset")
        .collect().map(_.toSeq).toSet
      val want = Packing.startOffsetsNaive(df, "lang", "doc_id", "w")
        .select("lang", "doc_id", "w", "start_offset")
        .collect().map(_.toSeq).toSet
      Prop(got == want)
    }

  property("balancedSpan: derived shard count within 2x of sqrt(n/strata)") =
    forAll(Gen.choose(1L, 4L * 1000 * 1000), Gen.choose(1L, 32L),
        Gen.oneOf(1L << 20, 1L << 40, 1L << 60)) { (n, s, domain) =>
      val span = Packing.balancedSpan(n, domain, s)
      val target = math.ceil(math.sqrt(n.toDouble / s)).toLong
      val shards = domain / span
      // integer floor of domain/shards can only RAISE the shard count,
      // and never above ~2x target while span >= 1
      Prop(span >= 1L && shards >= math.min(target, domain) &&
        (span == 1L || shards <= 2 * target + 1))
    }

  property("packGreedyShards == reference fold per (stratum, shard)") =
    forAll(genRows, Gen.oneOf(50L, 120L, 10000L)) { (rows, budget) =>
      val got = Packing.packGreedyShards(corpus(rows), "lang", "doc_id", "w",
          budget, shardSpan = 32L)
        .select("lang", "shard", "doc_id", "seq")
        .as[(String, Long, Long, Long)].collect().toSet
      val want = rows.groupBy(r => (r._1, r._2 / 32L)).toSeq.flatMap {
        case ((lang, shard), rs) =>
          greedyRef(rs.map(r => (r._2, r._3)), budget)
            .map { case (o, seq) => (lang, shard, o, seq) }
      }.toSet
      Prop(got == want)
    }
}
