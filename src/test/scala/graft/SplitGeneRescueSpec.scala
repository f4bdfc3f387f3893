package graft

import graft.ops.SplitGeneRescue
import graft.ops.SplitGeneRescue.{Decision, Gene, Pair}

/** Pins the split-gene rescue gates (`search/dump_homologs.js:7-12,
  * 66-84,176-205`): strict ppos < 10 on both sides, the no-overlap vs
  * small-overlap constants, the walk-past-the-higher-gene tally, and
  * the 10000 sentinel for unlocatable pairs.
  */
class SplitGeneRescueSpec extends SparkSpec {
  import spark.implicits._

  // one strand with five genes; ends arranged so walks stop mid-array
  private val genes = Seq(
    Gene(1, 0, 101, 0, 1000),
    Gene(1, 0, 102, 2000, 3000),
    Gene(1, 0, 103, 4000, 9000), // long gene: its end gates later walks
    Gene(1, 0, 104, 6000, 7000),
    Gene(1, 0, 105, 8000, 8500),
    Gene(2, 1, 201, 0, 1000))

  private def decide(pairs: Seq[Pair]): Map[Long, Decision] =
    SplitGeneRescue.rescue(genes.toDS(), pairs.toDS())
      .collect().map(d => d.pair_id -> d).toMap

  test("no-overlap branch: tally <= 3 and start distance <= 1 Mb rescue") {
    val out = decide(Seq(
      Pair(1, 1, 0, 101, 102, 0, 0), // walk 101,102 (end 3000): tally 2 → rescued
      Pair(2, 1, 0, 101, 105, 0, 0), // endpoint 8500: 101,102 pass, 103 (9000) stops → tally 2
      Pair(3, 1, 0, 101, 103, 0, 0))) // endpoint 9000: counts 101..105 → tally 5 > 3
    assert(out(1).n_between === 2 && out(1).rescued)
    assert(out(2).n_between === 2 && out(2).rescued)
    assert(out(3).n_between === 5 && !out(3).rescued)
  }

  test("ppos gate is strict: 10 on either side disqualifies") {
    val out = decide(Seq(
      Pair(1, 1, 0, 101, 102, 10, 0),
      Pair(2, 1, 0, 101, 102, 0, 10),
      Pair(3, 1, 0, 101, 102, 9.9, 0)))
    assert(!out(1).rescued && !out(2).rescued)
    assert(out(3).rescued) // small-overlap branch: tally 2 <= 2, dists small
  }

  test("small-overlap branch: tally <= 2 and both distances <= 500 kb") {
    // tally boundary: pair (101,103) walks 5 genes → fails even with tiny dists
    val out = decide(Seq(
      Pair(1, 1, 0, 102, 103, 1, 1), // walk from 102: ends 3000,9000?  endpoint 9000 → 102..105 tally 4
      Pair(2, 1, 0, 104, 105, 1, 1))) // lo=104(end 7000),105(end 8500): tally 2 → rescued
    assert(out(1).n_between === 4 && !out(1).rescued)
    assert(out(2).n_between === 2 && out(2).rescued)
  }

  test("distance gates: 1 Mb (no overlap) and 500 kb (small overlap)") {
    val far = Seq(
      Gene(3, 0, 301, 0, 100),
      Gene(3, 0, 302, 600000, 600100),
      Gene(3, 0, 303, 1500000, 1500100))
    val out = SplitGeneRescue.rescue(far.toDS(), Seq(
      Pair(1, 3, 0, 301, 302, 0, 0), // 600000 <= 1 Mb → rescued
      Pair(2, 3, 0, 301, 303, 0, 0), // 1.5 Mb > 1 Mb → no
      Pair(3, 3, 0, 301, 302, 1, 1)) // small overlap: 600000 > 500 kb → no
      .toDS()).collect().map(d => d.pair_id -> d).toMap
    assert(out(1).rescued)
    assert(!out(2).rescued)
    assert(!out(3).rescued)
  }

  test("different fragment/strand or unknown gene tallies 10000 and never rescues") {
    val out = decide(Seq(
      Pair(1, 1, 0, 101, 201, 0, 0), // 201 lives on frag 2
      Pair(2, 1, 0, 101, 999, 0, 0))) // unknown id
    assert(out(1).n_between === 10000L && !out(1).rescued)
    assert(out(2).n_between === 10000L && !out(2).rescued)
  }
}
