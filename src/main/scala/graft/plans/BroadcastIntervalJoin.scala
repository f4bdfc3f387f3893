package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GreaterThanOrEqual, JoinedRow, LessThanOrEqual, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Custom planner path for interval-containment joins (SURVEY §4:
  * "Range-join acceleration … NOT built-in"): the reference hand-rolls
  * sorted interval arrays probed by binary search per record
  * (`search/qtl_adder.js:49-59`, `search/dump_homologs.js:215,234`).
  * Catalyst's stock plan for `p BETWEEN lo AND hi` against a broadcast
  * side is BroadcastNestedLoopJoin — O(|points| * |intervals|). This
  * strategy recognizes the pattern and emits a physical operator that
  * sorts the (small) interval side once, broadcasts it with a
  * prefix-max index, and probes each point by binary search:
  * O(|points| * (log |intervals| + matches)).
  *
  * Engaged when the right side carries a broadcast hint —
  * `points.join(broadcast(intervals), p >= lo && p <= hi)`, exactly
  * the API shape users already write — or, with NO hints on either
  * side, when the right side's estimated size fits under
  * `spark.sql.autoBroadcastJoinThreshold` (the same size evidence the
  * stock planner uses to pick BroadcastHashJoin): the raw range
  * predicate then plans through this node with no user annotation,
  * and a big interval side falls back cleanly to the stock plan.
  * Registered through `GraftExtensions` (injectPlannerStrategy) or
  * `spark.experimental.extraStrategies`.
  */
object BroadcastIntervalJoinStrategy extends SparkStrategy {

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(cond), hint) if engaged(r, hint) =>
      extract(cond, l, r) match {
        case Some((p, lo, hi)) =>
          BroadcastIntervalJoinExec(p, lo, hi, planLater(l), planLater(r)) :: Nil
        case None => Nil
      }
    case _ => Nil
  }

  private def engaged(r: LogicalPlan, hint: JoinHint): Boolean =
    broadcastRight(hint) ||
      (hint.leftHint.isEmpty && hint.rightHint.isEmpty && sizeBelowThreshold(r))

  private def broadcastRight(hint: JoinHint): Boolean =
    hint.rightHint.exists(_.strategy.contains(
      org.apache.spark.sql.catalyst.plans.logical.BROADCAST))

  /** Size-based engagement: estimated right side under the session's
    * auto-broadcast threshold (disabled when the threshold is <= 0,
    * mirroring the stock broadcast rules).
    */
  private def sizeBelowThreshold(r: LogicalPlan): Boolean = {
    val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    thr > 0 && r.stats.sizeInBytes <= thr
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** Decompose `p >= lo && p <= hi` (any operand orientation) with `p`
    * from the left side and `lo`/`hi` from the right side.
    */
  private def extract(
      cond: Expression,
      l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    // normalize each conjunct to (point, bound, isLower)
    def side(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
      case GreaterThanOrEqual(a, b) if fromLeft(a) && fromRight(b) => Some((a, b, true))
      case LessThanOrEqual(a, b) if fromRight(a) && fromLeft(b) => Some((b, a, true))
      case LessThanOrEqual(a, b) if fromLeft(a) && fromRight(b) => Some((a, b, false))
      case GreaterThanOrEqual(a, b) if fromRight(a) && fromLeft(b) => Some((b, a, false))
      case _ => None
    }
    def fromLeft(e: Expression) = e.references.nonEmpty &&
      e.references.subsetOf(l.outputSet) && integral(e)
    def fromRight(e: Expression) = e.references.nonEmpty &&
      e.references.subsetOf(r.outputSet) && integral(e)

    cond match {
      case org.apache.spark.sql.catalyst.expressions.And(c1, c2) =>
        (side(c1), side(c2)) match {
          case (Some((p1, lo, true)), Some((p2, hi, false))) if p1.semanticEquals(p2) =>
            Some((p1, lo, hi))
          case (Some((p1, hi, false)), Some((p2, lo, true))) if p1.semanticEquals(p2) =>
            Some((p1, lo, hi))
          case _ => None
        }
      case _ => None
    }
  }
}

/** Physical operator: broadcast sorted intervals + per-point binary
  * search. The interval side is collected (it is broadcast-hinted, i.e.
  * declared small), sorted by `lo`, and shipped with a running
  * prefix-max of `hi`: probing walks back from the binary-searched
  * upper bound and stops as soon as the prefix-max drops below the
  * point — the exact pruning the reference's `bounds.le` + linear scan
  * performs, distributed over the point side's partitions.
  */
case class BroadcastIntervalJoinExec(
    point: Expression,
    lo: Expression,
    hi: Expression,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  private def toL(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    val intervals = right.executeCollect()
      .flatMap { row =>
        val l = loB.eval(row)
        val h = hiB.eval(row)
        if (l == null || h == null) None
        else Some((toL(l), toL(h), row.copy()))
      }
      .sortBy(_._1)
    val prefixMaxHi = new Array[Long](intervals.length)
    var m = Long.MinValue
    var i = 0
    while (i < intervals.length) {
      if (intervals(i)._2 > m) m = intervals(i)._2
      prefixMaxHi(i) = m
      i += 1
    }
    val bc = sparkContext.broadcast((intervals, prefixMaxHi))
    val pointB = BindReferences.bindReference(point, left.output)
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output

    left.execute().mapPartitions { it =>
      val (ivs, pmax) = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, leftAttrs ++ rightAttrs)
      it.flatMap { lrow =>
        val pv = pointB.eval(lrow)
        if (pv == null || ivs.isEmpty) Iterator.empty
        else {
          val p = toL(pv)
          // last index with lo <= p
          var a = 0
          var b = ivs.length - 1
          var ub = -1
          while (a <= b) {
            val mid = (a + b) >>> 1
            if (ivs(mid)._1 <= p) { ub = mid; a = mid + 1 } else b = mid - 1
          }
          // stream matches directly off the walk — no per-probe buffer,
          // no per-row copy (flatMap drains this before advancing lrow;
          // downstream operators copy if they buffer, per Spark contract)
          new Iterator[InternalRow] {
            private var k = ub
            seek()
            private def seek(): Unit = {
              while (k >= 0 && pmax(k) >= p && ivs(k)._2 < p) k -= 1
              if (k >= 0 && pmax(k) < p) k = -1
            }
            override def hasNext: Boolean = k >= 0
            override def next(): InternalRow = {
              val r = proj(joined(lrow, ivs(k)._3))
              k -= 1
              seek()
              r
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
