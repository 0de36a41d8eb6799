package graft.operators

import graft.functions.num._
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core Q3–Q12 (SURVEY §2.9): the Tier-B surface the reference's
  * map/shuffle/reduce model generalizes to. Everything is built-in Catalyst —
  * filters/projections push to the parquet scan, aggregates get map-side
  * partial combine, small dimension tables are broadcast explicitly.
  *
  * Scale notes per query are on each def; the common rules:
  *  - joins on high-cardinality keys shuffle both sides once (sort-merge or
  *    shuffled-hash, AQE's choice) — no driver-side collection anywhere;
  *  - dimension joins (region/nation/supplier) are `broadcast()` so the fact
  *    table never shuffles for them;
  *  - `orderBy().limit(k)` plans TakeOrderedAndProject (per-partition top-k +
  *    driver merge of k rows, not a global sort);
  *  - windows partition by a key (customer) so state per task is one
  *    customer's rows, spillable.
  */
object Relational {

  /** Q3: filter + projection. Both predicates and the 3-column projection
    * reach the parquet scan (PushedFilters / ReadSchema) — at 100 TB this is
    * the difference between reading 3 columns of matching row groups and
    * reading everything.
    */
  def q03(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Q4: TPC-H-Q1-shape multi-aggregate hash agg. One shuffle on the two
    * low-cardinality group keys; partial aggregation collapses each map task
    * to ~6 rows before the exchange.
    */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val disc  = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = disc * (lit(1) + col("l_tax"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(disc).as("sum_disc_price"),
        dsum(charge).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Q5: equi join + agg. customer is small relative to orders — broadcast
    * it; orders then aggregates with one shuffle on c_mktsegment.
    */
  def q05(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))

  /** Q6: broadcast multi-way join — lineitem ⋈ supplier ⋈ nation ⋈ region.
    * nation/region are bounded dimensions (broadcast-hinted); supplier
    * scales with the corpus so its broadcast is left to the planner's
    * threshold/AQE (it still broadcasts at every fixture scale — PlanSpec
    * asserts all three joins stay broadcast there). The fact table is read
    * once; the only guaranteed exchange is the final group-by.
    */
  def q06(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("r_name"))

  /** Q7: left semi + left anti in one result (kind marks which), exercising
    * both join types plus UNION ALL. The orders side is reduced to its
    * distinct keys by the semi/anti join itself — no materialized distinct.
    */
  def q07(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
    val keys = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c_custkey"))
    val semi = cust.join(keys, Seq("c_custkey"), "left_semi")
      .select(lit("has_orders").as("kind"), col("c_custkey"))
    val anti = cust.join(keys, Seq("c_custkey"), "left_anti")
      .select(lit("no_orders").as("kind"), col("c_custkey"))
    semi.unionAll(anti).orderBy(col("kind"), col("c_custkey"))
  }

  /** Q8: global top-k. orderBy().limit(k) plans TakeOrderedAndProject:
    * each task keeps its k best rows, the driver merges k-sized heaps — no
    * global sort, no full-data exchange, scale-safe for small k.
    */
  def q08(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)

  /** Q9: window ranking — per-customer top-3 orders by date. One shuffle on
    * o_custkey; ranking state is a single counter per partition key.
    */
  def q09(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Q10: window frame — per-customer running total. The running SUM is over
    * per-row decimals (exact, order-fixed by the frame), so the emitted
    * double is bit-deterministic.
    */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
        (sum(fixed4(col("o_totalprice"))).over(w).cast("double") / lit(10000))
          .as("running_total"))
      .orderBy(col("o_custkey"), col("odate_ms"), col("o_orderkey"))
  }

  /** Q11: distinct + set ops. INTERSECT/EXCEPT of the customer-key sets of
    * 'F' vs 'O' orders — both plan as aggregate + shuffle on the key, the
    * distributed form of the reference's hash-partition model.
    */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def keys(status: String) =
      orders.filter(col("o_orderstatus") === status)
        .select(col("o_custkey"))
    val both = keys("F").intersect(keys("O"))
      .select(lit("f_and_o").as("kind"), col("o_custkey"))
    val fOnly = keys("F").except(keys("O"))
      .select(lit("f_only").as("kind"), col("o_custkey"))
    both.unionAll(fOnly).orderBy(col("kind"), col("o_custkey"))
  }

  /** Q12: ROLLUP with GROUPING() markers. Spark expands grouping sets in one
    * pass (no re-scan per level).
    */
  def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        grouping(col("o_orderpriority")).cast("int").as("g_pri"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"))
      .orderBy(
        col("g_pri"), col("g_status"),
        col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** q53: arbitrary GROUPING SETS — per-priority totals, per-status totals,
    * and the grand total in one pass (neither ROLLUP's prefix hierarchy nor
    * CUBE's full lattice). The DataFrame API has no grouping-sets builder,
    * so the engine form IS SQL over a temp view — same text semantics both
    * engines; money summed via the fixed-point idiom (num.sqlDsum) so the
    * hash is stable.
    */
  def q53(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(s"""
      SELECT o_orderpriority, o_orderstatus,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        COUNT(*) AS n,
        ${sqlDsum("o_totalprice")} AS total
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      ORDER BY g_pri, g_status,
        o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""")
  }

  /** q41: CUBE — all four grouping-set combinations in one pass. */
  def q41(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total"),
        grouping(col("o_orderpriority")).cast("int").as("g_pri"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"))
      .orderBy(
        col("g_pri"), col("g_status"),
        col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** q42: INTERSECT ALL / EXCEPT ALL — multiset semantics (duplicates
    * preserved up to min/differences of multiplicities).
    */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def keys(status: String) =
      orders.filter(col("o_orderstatus") === status)
        .select(col("o_custkey"))
    val both = keys("F").intersectAll(keys("O"))
      .select(lit("f_and_o_all").as("kind"), col("o_custkey"))
    val fOnly = keys("F").exceptAll(keys("O"))
      .select(lit("f_only_all").as("kind"), col("o_custkey"))
    both.unionAll(fOnly).orderBy(col("kind"), col("o_custkey"))
  }

  /** q46: analytic-window battery — dense_rank / percent_rank / ntile /
    * lag / lead over one per-customer ordering, single window state pass.
    */
  def q46(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        dense_rank().over(w).as("drank"),
        percent_rank().over(w).as("prank"),
        ntile(4).over(w).as("quartile"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q46_window_battery", q46,
      Some("""SELECT o_custkey, o_orderkey,
        |  CAST(dense_rank() OVER w AS INT) AS drank,
        |  percent_rank() OVER w AS prank,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),
    QueryDef("q41_cube", q41,
      Some(s"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |  ${sqlDsum("o_totalprice")} AS total,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY g_pri, g_status,
        |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),
    QueryDef("q42_set_ops_all", q42,
      Some("""SELECT 'f_and_o_all' AS kind, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'f_only_all' AS kind, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY kind, o_custkey""".stripMargin)),
    QueryDef("q03_filter_project", q03,
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    QueryDef("q04_hash_agg", q04,
      Some(s"""SELECT l_returnflag, l_linestatus,
        |  ${sqlDsum("l_quantity")} AS sum_qty,
        |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
        |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        |  ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        |  ${sqlDavg("l_quantity")} AS avg_qty,
        |  ${sqlDavg("l_extendedprice")} AS avg_price,
        |  ${sqlDavg("l_discount")} AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    QueryDef("q05_join_agg", q05,
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  ${sqlDsum("o_totalprice")} AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),
    QueryDef("q06_multiway_join", q06,
      Some(s"""SELECT r_name, COUNT(*) AS n_items,
        |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)),
    QueryDef("q07_semi_anti", q07,
      Some("""SELECT 'has_orders' AS kind, c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_orders' AS kind, c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY kind, c_custkey""".stripMargin)),
    QueryDef("q08_topk", q08,
      Some("""SELECT l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 25""".stripMargin)),
    QueryDef("q09_window_rank", q09,
      Some("""SELECT o_custkey, rn, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey)
        |         AS INTEGER) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin)),
    QueryDef("q10_window_frame", q10,
      Some("""SELECT o_custkey, o_orderkey,
        |  epoch_ms(o_orderdate) AS odate_ms,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 10000 AS running_total
        |FROM orders
        |ORDER BY o_custkey, odate_ms, o_orderkey""".stripMargin)),
    QueryDef("q11_set_ops", q11,
      Some("""SELECT 'f_and_o' AS kind, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'f_only' AS kind, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY kind, o_custkey""".stripMargin)),
    QueryDef("q12_rollup", q12,
      Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY g_pri, g_status,
        |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),
    QueryDef("q53_grouping_sets", q53,
      Some(s"""SELECT o_orderpriority, o_orderstatus,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  COUNT(*) AS n,
        |  ${sqlDsum("o_totalprice")} AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY g_pri, g_status,
        |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)))
}
