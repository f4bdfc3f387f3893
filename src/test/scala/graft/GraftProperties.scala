package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.ops.{Closure, GeneTreeRep, RangeJoin}

/** Property-based checks against brute-force oracles (SURVEY §5.2):
  * random inputs, exhaustive reference computation, exact comparison.
  * Sample counts are small — every evaluation runs Spark jobs.
  */
object GraftProperties extends Properties("graft") {
  import SharedSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private val genPoints: Gen[List[Long]] =
    Gen.listOfN(60, Gen.chooseNum(-500L, 500L))

  private val genIntervals: Gen[List[(Long, Long)]] =
    Gen.listOfN(25, for {
      lo <- Gen.chooseNum(-500L, 500L)
      len <- Gen.chooseNum(0L, 200L)
    } yield (lo, lo + len))

  property("rangeJoin == nested loop oracle") =
    forAll(genPoints, genIntervals, Gen.oneOf(1L, 37L, 128L, 10000L)) {
      (ps, ivs, binWidth) =>
        val pDf = ps.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
        val iDf = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("iid", "lo", "hi")
        val got = RangeJoin.pointInInterval(pDf, "x", iDf, "lo", "hi", binWidth)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val want = (for {
          (x, pi) <- ps.zipWithIndex
          ((lo, hi), ii) <- ivs.zipWithIndex
          if x >= lo && x <= hi
        } yield (pi.toLong, ii.toLong)).toSet
        Prop(got == want) :| s"got=${got.size} want=${want.size}"
    }

  private val genDagEdges: Gen[List[(Long, Long)]] =
    Gen.chooseNum(2, 40).flatMap { n =>
      Gen.sequence[List[List[(Long, Long)]], List[(Long, Long)]](
        (2L to n.toLong).toList.map { c =>
          Gen.chooseNum(1, 2).flatMap(k =>
            Gen.listOfN(k, Gen.chooseNum(1L, c - 1).map(p => (c, p))))
        }).map(_.flatten.distinct)
    }

  property("closure == reachability oracle") = forAll(genDagEdges) { edges =>
    (edges.nonEmpty) ==> {
      val got = Closure.transitiveClosure(edges.toDF("child", "parent"))
        .as[(Long, Long)].collect().toSet
      val parents = edges.groupBy(_._1).map { case (c, es) => c -> es.map(_._2).toSet }
      def anc(n: Long): Set[Long] = {
        val d = parents.getOrElse(n, Set.empty)
        d ++ d.flatMap(anc)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.flatMap(n => anc(n).map(n -> _)).toSet
      Prop(got == want) :| s"got=${got.size} want=${want.size}"
    }
  }

  // Random rooted trees: node i (2..n) hangs under a uniform parent in
  // 1..i-1; leaves get genes/scores, internals get dup confidences.
  private val genTree: Gen[Seq[GeneTreeRep.Node]] =
    Gen.chooseNum(2, 22).flatMap { n =>
      val parentGens = (2 to n).toList.map(i => Gen.chooseNum(1, i - 1).map(i -> _))
      for {
        parents <- Gen.sequence[List[(Int, Int)], (Int, Int)](parentGens)
        dists <- Gen.listOfN(n, Gen.chooseNum(0, 8).map(_ * 0.25))
        scores <- Gen.listOfN(n, Gen.oneOf(
          Gen.chooseNum(-26, 8).map(_ * 5.0), Gen.const(-60.0)))
        dups <- Gen.listOfN(n, Gen.oneOf(0.0, 0.4, 0.9))
        ats <- Gen.listOfN(n, Gen.prob(0.3))
        excl <- Gen.listOfN(n, Gen.prob(0.15))
      } yield {
        val hasChild = parents.map(_._2).toSet
        (1 to n).map { i =>
          val leaf = !hasChild.contains(i)
          GeneTreeRep.Node(
            treeId = 1L,
            id = i.toLong,
            parent = if (i == 1) -1L else parents(i - 2)._2.toLong,
            dist = dists(i - 1),
            taxonId = if (leaf && excl(i - 1)) 3702001L else 100L + i,
            geneId = if (!leaf) null
              else if (ats(i - 1)) s"AT$i" else s"G$i",
            score = scores(i - 1),
            dupConf = dups(i - 1))
        }
      }
    }

  /** Independent reference: bu via EXPLICIT min over descendant leaves
    * (score + path distance, tie = first pre-order leaf) — no climb, no
    * break — then the documented top-down/ath/dup/emission rules,
    * recursively. Catches any case where the climb's early break would
    * diverge from the true minimum.
    */
  private def leafAttrsOracle(ns: Seq[GeneTreeRep.Node]): Set[GeneTreeRep.LeafAttr] = {
    val byId = ns.map(n => n.id -> n).toMap
    val children = ns.filter(_.parent != -1L).groupBy(_.parent)
      .view.mapValues(_.sortBy(_.id)).toMap
    val root = ns.find(_.parent == -1L).get
    def preorder(n: GeneTreeRep.Node): Seq[GeneTreeRep.Node] =
      n +: children.getOrElse(n.id, Seq.empty).flatMap(preorder)
    val pre = preorder(root)
    val leaves = pre.filter(n => !children.contains(n.id))
    val leafRank = leaves.zipWithIndex.map { case (l, i) => l.id -> i }.toMap
    def pathDist(from: Long, to: Long): Double = {
      var cur = from
      var d = 0.0
      while (cur != to) { d += byId(cur).dist; cur = byId(cur).parent }
      d
    }
    def leavesUnder(n: GeneTreeRep.Node): Seq[GeneTreeRep.Node] =
      if (!children.contains(n.id)) Seq(n)
      else children(n.id).flatMap(leavesUnder)
    case class Rep(leafId: Long, gene: String, score: Double)
    def bu(n: GeneTreeRep.Node): Rep =
      leavesUnder(n).map(l => (l, l.score + pathDist(l.id, n.id)))
        .minBy { case (l, s) => (s, leafRank(l.id)) } match {
        case (l, s) => Rep(l.id, l.geneId, s)
      }
    val fin = scala.collection.mutable.HashMap[Long, Rep](root.id -> bu(root))
    val ath = scala.collection.mutable.HashMap.empty[Long, Rep]
    def isAth(g: String) = g != null && g.startsWith("AT")
    if (isAth(fin(root.id).gene)) ath(root.id) = fin(root.id)
    pre.foreach { node =>
      val nodeRep = fin(node.id)
      val gated = nodeRep.score < -60.0
      children.getOrElse(node.id, Seq.empty).foreach { child =>
        val own = bu(child)
        val rep = if (gated && own.score > 0.8 * nodeRep.score) nodeRep else own
        fin(child.id) = rep
        if (gated) {
          if (isAth(rep.gene)) ath(child.id) = rep
          else ath.get(node.id).foreach(a => ath(child.id) = a)
        }
      }
    }
    def dupsOf(l: GeneTreeRep.Node): Seq[Long] = {
      var cur = l.id
      var acc = List.empty[Long]
      while (cur != -1L) {
        val n = byId(cur)
        if (n.dupConf > 0.5) acc = n.taxonId :: acc
        cur = n.parent
      }
      acc.distinct.sorted
    }
    leaves.map { leaf =>
      val rep = fin(leaf.id)
      val d = dupsOf(leaf)
      if (rep.score >= -60.0 || leaf.taxonId == 3702001L)
        GeneTreeRep.LeafAttr(1L, leaf.geneId, root.taxonId, None, None, None, d)
      else if (rep.leafId == leaf.id)
        GeneTreeRep.LeafAttr(1L, leaf.geneId, root.taxonId, Some(rep.score),
          ath.get(leaf.id).map(_.gene).orElse(Option(leaf.geneId)), None, d)
      else
        GeneTreeRep.LeafAttr(1L, leaf.geneId, root.taxonId, Some(rep.score),
          ath.get(leaf.id).collect { case a if a.gene != rep.gene => a.gene },
          Option(rep.gene), d)
    }.toSet
  }

  property("gene-tree rep propagation == recursive min-over-leaves oracle") =
    forAll(genTree) { ns =>
      val got = GeneTreeRep.leafAttrs(ns.toDS()).collect().toSet
      val want = leafAttrsOracle(ns)
      Prop(got == want) :| s"got=${got.size} want=${want.size} diff=${(got diff want).take(2)}"
    }

  property("binning partitions the domain: each point matches its own bin exactly once") =
    forAll(genPoints, Gen.oneOf(1L, 7L, 100L)) { (ps, w) =>
      val df = ps.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      // join every point against the full covering set of intervals
      // built from the same binning: [k*w, (k+1)*w - 1]
      val bins = ps.map(x => Math.floorDiv(x, w)).distinct
        .map(k => (k, k * w, k * w + w - 1))
      val iDf = bins.toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(df, "x", iDf, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect()
      Prop(got.length == ps.length &&
        got.toMap.forall { case (pid, k) => Math.floorDiv(ps(pid.toInt), w) == k })
    }

  private val genSparseCorpus: Gen[List[(Long, List[(Int, Double)])]] =
    Gen.chooseNum(10, 40).flatMap { n =>
      Gen.sequence[List[List[(Int, Double)]], List[(Int, Double)]](
        (0 until n).toList.map { _ =>
          Gen.chooseNum(1, 6).flatMap { k =>
            Gen.pick(k, 1 to 12).flatMap { dims =>
              Gen.sequence[List[Double], Double](
                dims.toList.map(_ => Gen.chooseNum(-8, 8).map(_ / 4.0)))
                .map(ws => dims.toList.zip(ws))
            }
          }
        }).map(_.zipWithIndex.map { case (ts, i) => (i.toLong, ts.sortBy(_._1)) })
    }

  property("APSS prefix-filtered cosine join == brute force") =
    forAll(genSparseCorpus, Gen.oneOf(0.3, 0.6, 0.9)) { (corpus, t) =>
      val df = corpus.toDF("id", "terms").select(
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("terms")
          .cast("array<struct<dim:int,w:double>>").as("terms"))
      val got = graft.ops.Apss.cosinePairs(df, "id", "terms", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      def cos(a: Map[Int, Double], b: Map[Int, Double]): Double = {
        val dot = a.map { case (d, w) => w * b.getOrElse(d, 0.0) }.sum
        val na = math.sqrt(a.values.map(w => w * w).sum)
        val nb = math.sqrt(b.values.map(w => w * w).sum)
        if (na > 0 && nb > 0) dot / (na * nb) else 0.0
      }
      val m = corpus.map { case (i, ts) => i -> ts.toMap }.toMap
      val want = (for {
        a <- m.keys; b <- m.keys if a < b
        if cos(m(a), m(b)) >= t
      } yield (a, b)).toSet
      Prop(got == want) :| s"t=$t missed=${(want diff got).take(3)} extra=${(got diff want).take(3)}"
    }

  private val genDenseCorpus: Gen[List[(Long, Array[Float])]] =
    for {
      n <- Gen.chooseNum(20, 60)
      seed <- Gen.chooseNum(0, 10000)
    } yield {
      val rnd = new scala.util.Random(seed)
      List.tabulate(n)(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    }

  property("grid-blocked exact embedding near-dup == brute force, any block count") =
    forAll(genDenseCorpus, Gen.oneOf(1, 2, 5, 9), Gen.oneOf(0.3, 0.6)) {
      (corpus, blocks, t) =>
        def cos(a: Array[Float], b: Array[Float]): Double = {
          val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
          val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
          val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
          if (na > 0 && nb > 0) dot / (na * nb) else 0.0
        }
        val want = (for {
          (ia, va) <- corpus; (ib, vb) <- corpus if ia < ib
          if cos(va, vb) >= t
        } yield (ia, ib)).toSet
        val got = graft.ops.Dedup.embeddingNearDupExact(
          corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", t,
          numBlocks = blocks)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        Prop(got == want) :| s"blocks=$blocks t=$t missed=${(want diff got).take(3)} extra=${(got diff want).take(3)}"
    }

  property("native sortedShingles == sort_array(array_distinct(HOF shingles))") =
    forAll(
      Gen.listOf(Gen.oneOf("a", "b", "ab", "ba", "aa", "c", "é", "z9")),
      Gen.choose(1, 4)) { (toks, n) =>
      import org.apache.spark.sql.functions._
      val df = Seq(toks.mkString(" ")).toDF("text")
        .select(graft.functions.TextAnalytics.tokens(col("text")).as("toks"))
        .select(
          graft.functions.Shingling.sortedShingles(col("toks"), n).as("native"),
          sort_array(graft.functions.TextAnalytics.shinglesOf(col("toks"), n))
            .as("hof"))
      val r = df.head()
      Prop(r.getSeq[String](0) == r.getSeq[String](1)) :| s"toks=$toks n=$n row=$r"
    }

  property("decontaminate ngramOverlap == local distinct-gram intersection") =
    forAll(
      Gen.listOfN(8, Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))),
      Gen.listOfN(3, Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))) {
      (trainTexts, benchTexts) =>
        import org.apache.spark.sql.functions._
        val train = trainTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text")
        val bench = benchTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
          .toDF("id", "text")
        val out = graft.ops.Decontaminate.ngramOverlap(train, bench, "text", "id", n = 2)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        def grams(t: String): Set[String] =
          t.split(" ").filter(_.nonEmpty).sliding(2).filter(_.length == 2)
            .map(_.mkString(" ")).toSet
        val benchSet = benchTexts.flatMap(grams).toSet
        val expected = trainTexts.zipWithIndex.map { case (t, i) =>
          val g = grams(t)
          i.toLong -> (g.size.toLong, g.intersect(benchSet).size.toLong)
        }.toMap
        Prop(out == expected) :| s"got=$out expected=$expected"
    }

  property("native shingleStats == local gram-bag counting") =
    forAll(
      Gen.listOf(Gen.oneOf("a", "b", "ab", "ba", "aa", "c", "é", "z9")),
      Gen.choose(1, 4)) { (toks, n) =>
      import org.apache.spark.sql.functions._
      val df = Seq(toks.mkString(" ")).toDF("text")
        .select(graft.functions.TextAnalytics.tokens(col("text")).as("toks"))
        .select(graft.functions.Shingling.shingleStats(col("toks"), n).as("s"))
        .select("s.total", "s.n_distinct", "s.max_freq")
      val r = df.head()
      val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val expected =
        if (grams.isEmpty) (0, 0, 0)
        else (grams.size, counts.size, counts.values.max)
      Prop((r.getInt(0), r.getInt(1), r.getInt(2)) == expected) :|
        s"toks=$toks n=$n got=$r expected=$expected"
    }

  private val genPrefixRows: Gen[List[(String, Long)]] =
    Gen.listOfN(40, for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4", "k5")
      id <- Gen.chooseNum(0L, 30L)
    } yield (k, id))

  property("similarity-guard volume predictors == actual join-row counts") =
    forAll(genPrefixRows, genPrefixRows) { (as, bs) =>
      import org.apache.spark.sql.functions.col
      import graft.ops.SimilarityGuard
      val a = as.toDF("htok", "id")
      val b = bs.toDF("htok", "id")
      // self: join rows surviving id_a < id_b — but selfJoinVolume
      // counts UNORDERED pairs including equal-id meetings once per
      // key, so compare against the full a×a join minus diagonal,
      // halved: that is exactly sum df*(df-1)/2 per key.
      val selfActual = a.select(col("htok"), col("id").as("id_a"))
        .join(a.select(col("htok"), col("id").as("id_b")), "htok")
        .count() // df^2 per key, includes diagonal df
      val dfSq = SimilarityGuard.selfJoinVolume(a, Seq("htok")) * 2 +
        as.length // 2*C(df,2) + df == df^2 per key
      val crossActual = a.select(col("htok"), col("id").as("id_a"))
        .join(b.select(col("htok"), col("id").as("id_b")), "htok")
        .count()
      val crossPred = SimilarityGuard.crossJoinVolume(a, b, Seq("htok"))
      Prop(selfActual == dfSq && crossActual == crossPred) :|
        s"self actual=$selfActual pred_df2=$dfSq cross actual=$crossActual pred=$crossPred"
    }
}
