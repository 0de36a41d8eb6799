package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed Aggregator — the mergeable
  * heavy-hitters summary that replaces an exact token group-by at corpus
  * scale: each task keeps at most k counters (vs the full vocabulary), the
  * merge keeps at most k, and the guarantees survive arbitrary merge
  * trees:
  *
  *   - CONTAINMENT: every item with true frequency > N/(k+1) is in the
  *     final sketch (it cannot be decremented away);
  *   - ERROR BOUND: every reported estimate undercounts its true frequency
  *     by at most N/(k+1)  (estimate <= true <= estimate + N/(k+1)).
  *
  * Estimates (not exact counts) and a merge-order-dependent tail mean the
  * output is NOT hash-deterministic — q64 registers rows-only and
  * HeavyHittersSpec asserts the two guarantees against the exact counts,
  * which is the contract the sketch actually makes.
  */
class HeavyHittersAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  /** Classic MG update: increment if tracked or space free, else decrement
    * every counter (dropping zeros) — the "pairing off" that buys the
    * N/(k+1) bound.
    */
  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  /** Mergeable form (Agarwal et al.): add counters, then subtract the
    * (k+1)-th largest count from everything and drop non-positives — the
    * combined sketch keeps at most k counters and the error bounds add.
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val kth = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (i, c) => if (c > kth) Some(i -> (c - kth)) else None }
    }
  }

  /** Descending by estimate, item ASC tie-break — deterministic given the
    * final counter set.
    */
  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (i, c) => (-c, i) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
