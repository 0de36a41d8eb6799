package graft

import graft.operators.Scalars
import org.scalatest.funsuite.AnyFunSuite

/** Q13 approx half: HLL must land within ±5% of the exact distinct count
  * per group (SURVEY §2.9 — property-checked, never hash-checked).
  */
class ScalarsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("approx_percentile within 5% of exact percentiles per returnflag") {
    import org.apache.spark.sql.functions._
    val rows = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("exact_p50"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx_p50"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getDouble(1); val a = r.getDouble(2)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: $a vs $e")
    }
  }

  test("approx_count_distinct within 5% of exact per event_type") {
    val exact = Scalars.q13(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Scalars.q13Hll(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"$k: approx $a vs exact $e drifts > 5%")
    }
  }
}
