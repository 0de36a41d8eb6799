package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: with both sides bucketed on the join key
  * into the same bucket count, the join plan must contain NO Exchange — the
  * scans themselves are the distribution.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact/dim join plans without any shuffle") {
    val autoBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real two-sided join (broadcast would hide the exchange)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketed.write(Tables.lineitem(spark, dir), "b_lineitem", "l_orderkey", 8)
      Bucketed.write(
        Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", "l_orderkey", 8)
      val joined = Bucketed.read(spark, "b_lineitem")
        .join(Bucketed.read(spark, "b_orders"), Seq("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"join still shuffles:\n${plan.take(800)}")
      assert(plan.contains("SelectedBucketsCount"), plan.take(800))
      // and it still computes the right thing
      val n = joined.agg(sum("n")).collect().head.getLong(0)
      assert(n === Tables.lineitem(spark, dir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", autoBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
