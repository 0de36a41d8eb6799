package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the Aggregator extension point, SURVEY §2.7): bounded top-k
  * by (price DESC, orderkey ASC, linenumber ASC) with an O(k) buffer —
  * the partial-aggregation form of TakeOrderedAndProject. Each task keeps at
  * most k rows, merge keeps at most k, so driver traffic is k rows per
  * partition regardless of input size.
  *
  * Exists to pin the UDAF surface (typed Aggregator with encoders, partial
  * merge semantics); the engine's production top-k (q08) stays the
  * declarative orderBy().limit(k) — TopKAggregatorSpec asserts both agree.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long, Int), List[(Double, Long, Int)], Seq[(Double, Long, Int)]] {

  /** Ordering that matches Spark's sort semantics exactly, so the UDAF can
    * never diverge from the declarative plan it mirrors: NaN sorts as the
    * GREATEST double (first under price DESC) and -0.0 equals 0.0 —
    * Ordering.Double.TotalOrdering gets both wrong for this purpose.
    */
  private def norm(d: Double): Double = if (d == 0.0) 0.0 else d
  private val ord: Ordering[(Double, Long, Int)] =
    new Ordering[(Double, Long, Int)] {
      override def compare(x: (Double, Long, Int), y: (Double, Long, Int)): Int = {
        val c = java.lang.Double.compare(norm(y._1), norm(x._1)) // price DESC
        if (c != 0) c
        else {
          val c2 = java.lang.Long.compare(x._2, y._2)
          if (c2 != 0) c2 else Integer.compare(x._3, y._3)
        }
      }
    }

  override def zero: List[(Double, Long, Int)] = Nil

  // zero/reduce/merge maintain the buffer sorted in `ord` order
  private def trim(xs: List[(Double, Long, Int)]): List[(Double, Long, Int)] =
    xs.sorted(ord).take(k)

  override def reduce(buf: List[(Double, Long, Int)],
      row: (Double, Long, Int)): List[(Double, Long, Int)] =
    // common case O(1): a full buffer rejects rows no better than its worst
    if (buf.lengthCompare(k) >= 0 && ord.compare(row, buf.last) >= 0) buf
    else trim(row :: buf)

  override def merge(a: List[(Double, Long, Int)],
      b: List[(Double, Long, Int)]): List[(Double, Long, Int)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long, Int)]): Seq[(Double, Long, Int)] =
    buf // already sorted by construction

  override def bufferEncoder: Encoder[List[(Double, Long, Int)]] =
    ExpressionEncoder[List[(Double, Long, Int)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long, Int)]] =
    ExpressionEncoder[Seq[(Double, Long, Int)]]()
}
