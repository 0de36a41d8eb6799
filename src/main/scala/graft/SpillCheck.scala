package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Spill certification (SCALE.md §spill): the two documented
  * memory-pressure escape hatches are FORCED and the answers proven
  * bit-identical to the in-memory paths. Never exercised before round 16
  * — the mega-key scaladoc (`InvertedIndex`) claimed "ObjectHashAggregate
  * spills" on faith.
  *
  *  1. A1 mega-key aggregation (q01b): with
  *     `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` at 16
  *     distinct keys per task, `collect_list`'s ObjectHashAggregate takes
  *     its sort-based fallback on every fixture task (the path a stopword
  *     key's memory pressure takes at 100 TB), certified by the plan's
  *     `numTasksFallBacked` metric and the result checksum.
  *  2. Window buffering (q09): with
  *     `spark.sql.windowExec.buffer.spill.threshold` at 100 rows, every
  *     window partition's ExternalAppendOnlyUnsafeRowArray spills to real
  *     disk (task-metrics diskBytesSpilled > 0), same checksum contract.
  *
  * Runs in its OWN JVM (SpillSpec forks one): the force-spill sorter
  * threshold is static at SparkEnv creation, and a getOrCreate hit on the
  * shared test session could not apply it. Prints ONE JSON line with the
  * checksums and spill evidence; exits 2 when nothing fell back or
  * nothing reached disk (a vacuous certification must fail loudly).
  */
object SpillCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local("graft-spillcheck", Map(
      "spark.shuffle.spill.numElementsForceSpillThreshold" -> "5000",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "16"))
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "100")
    @volatile var mem = 0L
    @volatile var disk = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          mem += m.memoryBytesSpilled
          disk += m.diskBytesSpilled
        }
    })
    val q01b = operators.InvertedIndex.documentsIndexSalted(spark, sfDir)
    // the checksum frame CONTAINS the q01b subtree, so its executed plan
    // carries the aggregation's metrics — q01b's own QueryExecution never
    // runs and would read zeros
    val (aggRows, aggSum, aggPlan) = checksumWithPlan(q01b)
    val fallbacks = metricSum(aggPlan, "numTasksFallBacked")
    val q09 = operators.Relational.q09(spark, sfDir)
    val (winRows, winSum) = checksum(q09)
    // Drain the listener bus DETERMINISTICALLY before reading the counters:
    // a fixed sleep is a race on a loaded box (task-end events landing
    // after it would make the disk_spill==0 exit-2 path spuriously fire).
    // Bound stated explicitly (60 s): if the bus can't drain in a minute
    // the box is unusable for certification and the loud TimeoutException
    // abort is the correct outcome — better than certifying stale zeros.
    org.apache.spark.graft.ListenerBridge.waitUntilEmpty(
      spark.sparkContext, timeoutMillis = 60000L)
    println(s"""{"q01b_rows":$aggRows,"q01b_checksum":$aggSum,""" +
      s""""fallback_tasks":$fallbacks,""" +
      s""""q09_rows":$winRows,"q09_checksum":$winSum,""" +
      s""""mem_spill":$mem,"disk_spill":$disk}""")
    spark.stop()
    if (fallbacks == 0 || disk == 0) sys.exit(2)
  }

  /** Sum of a named SQL metric over the whole executed (adaptive) plan. */
  private def metricSum(plan: org.apache.spark.sql.execution.SparkPlan,
      name: String): Long = {
    var total = 0L
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p.metrics.get(name).foreach(total += _.value)
      p.children.foreach(walk)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => ()
      }
    }
    walk(plan)
    total
  }

  /** Order-independent exact checksum: (row count, bit_xor of xxhash64
    * over every column). Shared by the forced-spill run and SpillSpec's
    * normal-session run so the two results compare without materializing
    * either.
    */
  def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val (n, x, _) = checksumWithPlan(df)
    (n, x)
  }

  private def checksumWithPlan(df: org.apache.spark.sql.DataFrame)
      : (Long, Long, org.apache.spark.sql.execution.SparkPlan) = {
    val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
    val cdf = df.select(h.as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
    val r = cdf.collect().head
    (r.getLong(0), r.getLong(1), cdf.queryExecution.executedPlan)
  }
}
