package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Grouped top-k by value as a typed `Aggregator` (Dataset UDAF surface).
  *
  * The scale point: a per-group top-k via `row_number` windows sorts the
  * WHOLE group on every partition; this aggregator keeps a k-bounded
  * buffer, so the shuffle carries at most k doubles per group from each
  * map task (classic partial top-k merge). For small k over huge skewed
  * groups this is the plan you want — no per-partition sort, no full
  * group materialization.
  *
  * Determinism: the buffer is a VALUE multiset (descending), so equal
  * values merge identically regardless of arrival order.
  */
object TopKAggregator {

  final class TopK(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {
    override def zero: List[Double] = Nil
    override def reduce(b: List[Double], a: Double): List[Double] = insert(b, a)
    override def merge(x: List[Double], y: List[Double]): List[Double] =
      y.foldLeft(x)(insert)
    override def finish(r: List[Double]): Seq[Double] = r
    override def bufferEncoder: Encoder[List[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

    /** Insert keeping the list sorted descending, capped at k. */
    private def insert(b: List[Double], a: Double): List[Double] = {
      if (b.lengthCompare(k) >= 0 && a <= b.last) b
      else {
        val (hi, lo) = b.span(_ >= a)
        (hi ::: a :: lo).take(k)
      }
    }
  }

  /** Column form: `top_k(col, k)` usable in `groupBy().agg(...)`. */
  def top_k(c: Column, k: Int): Column = udaf(new TopK(k)).apply(c)
}
