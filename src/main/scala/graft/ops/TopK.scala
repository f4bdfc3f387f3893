package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k as an `Aggregator` (SURVEY §2.11's
  * UDAF-shaped surface). The window-function top-k (q07) sorts every
  * group's rows after a full shuffle; this aggregator keeps only k
  * candidates per partition and merges buffers — map-side partial
  * aggregation means the shuffle carries at most k rows per
  * (partition, group) instead of the whole group: the right plan at
  * 100 TB when k is small and groups are large or skewed.
  *
  * Ordering: descending by score, ties broken by ascending id — the
  * same deterministic rule as the reference's representative selection.
  */
object TopK {

  case class Scored(id: Long, score: Double)

  /** Buffer is a sorted (best-first) vector of at most k entries. */
  class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)

    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
      if (buf.size >= k && better(buf.last, x)) buf
      else {
        val (front, back) = buf.span(better(_, x))
        (front :+ x) ++ back.take(k - front.size - 1)
      }
    }

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)

    override def finish(buf: Seq[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TopKAggregator = new TopKAggregator(k)
}
