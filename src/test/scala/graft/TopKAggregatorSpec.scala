package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed UDAF top-k must agree exactly with the declarative
  * orderBy().limit(k) plan (q08) — same rows, same order.
  */
class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("Aggregator top-25 equals q08's TakeOrderedAndProject result") {
    import spark.implicits._
    val ds = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .as[(Double, Long, Int)]
    val agg = new TopKAggregator(25).toColumn
    val got = ds.select(agg).collect().head
    val want = operators.Relational.q08(spark, dir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === want)
  }
}
