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

  private val ord: Ordering[(Double, Long, Int)] =
    Ordering.by[(Double, Long, Int), (Double, Long, Int)] {
      case (price, okey, line) => (-price, okey, line)
    }(Ordering.Tuple3(Ordering.Double.TotalOrdering, Ordering.Long, Ordering.Int))

  override def zero: List[(Double, Long, Int)] = Nil

  private def trim(xs: List[(Double, Long, Int)]): List[(Double, Long, Int)] =
    xs.sorted(ord).take(k)

  override def reduce(buf: List[(Double, Long, Int)],
      row: (Double, Long, Int)): List[(Double, Long, Int)] =
    trim(row :: buf)

  override def merge(a: List[(Double, Long, Int)],
      b: List[(Double, Long, Int)]): List[(Double, Long, Int)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long, Int)]): Seq[(Double, Long, Int)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[List[(Double, Long, Int)]] =
    ExpressionEncoder[List[(Double, Long, Int)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long, Int)]] =
    ExpressionEncoder[Seq[(Double, Long, Int)]]()
}
