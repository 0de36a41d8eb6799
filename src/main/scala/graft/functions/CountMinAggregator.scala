package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min frequency sketch as a typed Aggregator — the bounded-memory
  * point-frequency summary next to the Misra-Gries top-set sketch
  * ([[HeavyHittersAggregator]]): MG answers "which items are frequent",
  * CMS answers "how often does THIS item occur" for any queried item, from
  * depth × width long counters regardless of vocabulary size.
  *
  * Distribution properties that make it the 100 TB shape:
  *   - MERGEABLE: counters are pure sums, so partial sketches from any
  *     partitioning merge by cell-wise addition (`mergeInPlace`) under any
  *     merge tree;
  *   - ORDER-INDEPENDENT: unlike MG (whose decrement step depends on arrival
  *     order), the final counter matrix is identical for EVERY partitioning
  *     and merge order — estimates are fully deterministic given (seed,
  *     data), which CountMinSpec asserts by re-aggregating under a different
  *     partitioning;
  *   - GUARANTEES: est >= true always (counters only over-count), and
  *     est <= true + eps·N with probability >= confidence per queried item.
  *
  * The buffer rides Spark's object-aggregation path (opaque serialized
  * buffer, java-serialization encoder — CountMinSketchImpl ships its own
  * compact writeObject): per-task state is ONE sketch object, serialized only
  * at the partial/final shuffle boundary.
  *
  * Output: (probe, estimate) for the fixed probe list, in probe order.
  */
class CountMinAggregator(probes: Seq[String], eps: Double, confidence: Double, seed: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      String, CountMinSketch, Seq[(String, Long)]] {

  override def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)

  override def reduce(buf: CountMinSketch, item: String): CountMinSketch = {
    buf.addString(item)
    buf
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = {
    a.mergeInPlace(b)
    a
  }

  override def finish(buf: CountMinSketch): Seq[(String, Long)] =
    probes.map(p => p -> buf.estimateCount(p))

  override def bufferEncoder: Encoder[CountMinSketch] =
    Encoders.javaSerialization[CountMinSketch]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
