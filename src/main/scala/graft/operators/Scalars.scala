package graft.operators

import graft.functions.num._
import graft.functions.text
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar batteries + distinct counting (SURVEY §2.9 Q13, Q16, Q17).
  *
  * Determinism rules baked in:
  *  - no libm-dependent functions in hash-checked output (ln/exp/pow differ
  *    across C libraries; sqrt is IEEE-exact so it's allowed);
  *  - money math in decimal (inputs are clean 2-dp so the double→decimal
  *    recovery is unambiguous in both engines), emitted as double;
  *  - approx_count_distinct (HLL) is property-checked, never hash-checked.
  */
object Scalars {

  /** Q13 exact half: per-type distinct users. COUNT(DISTINCT) plans a
    * two-phase partial/final aggregate on (event_type, user_id) — no
    * driver-side set, scale-safe.
    */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Q13 approx half: HLL sketch (fixed relative error) — constant memory
    * per group at any scale, the 100 TB answer to distinct counting. Checked
    * within ±5% of exact in ScalarsSpec, rows-only for the driver.
    */
  def q13Hll(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .orderBy(col("event_type"))

  /** Q16: string/date/math scalar battery over orders — all codegen'd
    * built-ins, evaluated inside the scan's whole-stage codegen.
    */
  def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .as("days_since_95"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        lower(col("o_orderpriority")).as("pri_lower"),
        upper(col("o_orderstatus")).as("status_upper"),
        // round to WHOLE units only: .5 boundaries at 0 dp are dyadic
        // (exactly representable), so Spark's HALF_UP and DuckDB's
        // half-away-from-zero agree; fractional round digits would not
        round(col("o_totalprice"), 0).as("price_round"),
        concat_ws(":", col("o_orderstatus"), col("o_orderpriority")).as("status_pri"),
        col("o_orderpriority").like("%URGENT%").as("is_urgent"),
        (col("o_orderkey") % 97).as("key_mod"),
        abs(col("o_custkey") - 1000).as("cust_dist"),
        floor(col("o_totalprice")).as("price_floor"),
        ceil(col("o_totalprice")).as("price_ceil"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        (col("o_totalprice").cast("decimal(18,2)") * lit(BigDecimal("1.1")))
          .cast("double").as("price_up"))
      // presentation-sort range sampling re-executes this scan-level
      // child (no shuffle below to resume from) — uncheckpointed, the
      // per-row expression work ran twice per run (the q112/q141 lesson)
      .localCheckpoint()
      .orderBy(col("o_orderkey"))

  /** Q17a: JSON scalar extraction over events.props. The path is extracted
    * ONCE in an inner projection and the derived columns reference it — the
    * original three get_json_object calls each re-parsed the document
    * (CollapseProject keeps the projects separate because the parse is
    * non-cheap and referenced 3×, same as q43's from_json).
    */
  def q17Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"))
      .select(
        col("event_id"),
        col("k_str"),
        col("k_str").cast("int").as("k_int"),
        col("k_str").isNotNull.as("has_k"))
      // presentation-sort range sampling re-executes this scan-level
      // child (no shuffle below to resume from) — uncheckpointed, the
      // per-row expression work ran twice per run (the q112/q141 lesson)
      .localCheckpoint()
      .orderBy(col("event_id"))

  /** Q17b: array scalars over documents tokens. */
  def q17Array(spark: SparkSession, dir: String): DataFrame = {
    val toks = text.cleanTokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        element_at(toks, 1).as("first_token"),
        element_at(toks, -1).as("last_token"),
        array_contains(toks, "spark").as("has_spark"),
        concat_ws(" ", slice(sort_array(toks), 1, 3)).as("sorted_first3"))
      // presentation-sort range sampling re-executes this scan-level
      // child (no shuffle below to resume from) — uncheckpointed, the
      // per-row expression work ran twice per run (the q112/q141 lesson)
      .localCheckpoint()
      .orderBy(col("doc_id"))
  }

  /** q43: MAP-typed scalars — props parsed to map<string,int>, then key
    * extraction / cardinality / sorted-key formatting (map key order is
    * undefined, so anything emitted is sorted first).
    */
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.IntegerType))
    // parse ONCE in an inner projection: from_json is non-cheap and
    // referenced three times, so CollapseProject keeps the two projects
    // separate instead of re-inlining the parse per output column
    Tables.events(spark, dir)
      .select(col("event_id"), m.as("m"))
      .select(
        col("event_id"),
        element_at(col("m"), "k").as("k_val"),
        size(map_keys(col("m"))).as("n_keys"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys_csv"))
      // presentation-sort range sampling re-executes this scan+parse
      // child (no shuffle below to resume from): uncheckpointed, every
      // row paid from_json twice per run (the q112/q141 lesson)
      .localCheckpoint()
      .orderBy(col("event_id"))
  }

  /** Sketch precision for q95 (Datasketches lgConfigK): 2^12 registers,
    * ~1.6% relative standard error, ~2 KB serialized per group.
    */
  val HllLgK = 12

  /** q95: snapshot-mergeable distinct counting — the HLL sketch as a STORED
    * binary column, not just a one-shot aggregate (q13_hll). The pipeline
    * need: per-source vocabulary size tracked across daily snapshots
    * without rescanning history — build per-(source, lang) sketches (the
    * "snapshot grain"), persist them, and answer per-source questions by
    * UNIONING sketches (hll_union_agg), never re-reading tokens. Register
    * state is a slot-wise max, so sketches are order-independent and merge
    * under any tree — the same mergeability contract as q64's Misra-Gries
    * and q65's Count-Min, here for set cardinality.
    *
    * Output per source: the estimate from unioned sub-sketches next to the
    * estimate from a direct one-pass sketch — ScalarsSpec asserts they are
    * IDENTICAL (register max is associative) and both within ±5% of the
    * exact distinct count. Rows-only for the driver (the oracle engine
    * cannot mirror the sketch hash family).
    *
    * Shape for 100 TB: the token stream aggregates to |sources|×|langs|
    * sketch rows (~2 KB each) map-side; the union pass touches only those
    * rows. Cross-snapshot, the rescan cost is zero by construction.
    */
  def q95(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        explode(text.cleanTokens(col("text"))).as("tok"))
    val perSnapshot = toks
      .groupBy(col("source"), col("lang"))
      .agg(hll_sketch_agg(col("tok"), lit(HllLgK)).as("sketch"))
    val merged = perSnapshot
      .groupBy(col("source"))
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(false))).as("est_merged"))
    val direct = toks
      .groupBy(col("source"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("tok"), lit(HllLgK))).as("est_direct"))
    merged.join(direct, Seq("source"))
      .select(col("source"), col("est_merged"), col("est_direct"))
      .orderBy(col("source"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q95_hll_union", q95, None),
    QueryDef("q43_map_scalars", q43,
      Some("""SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  CAST(len(json_keys(props)) AS INT) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv
        |FROM events ORDER BY event_id""".stripMargin)),
    QueryDef("q13_count_distinct", q13,
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    QueryDef("q13_hll", q13Hll, None),
    QueryDef("q16_scalars", q16,
      Some("""SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(month(o_orderdate) AS INT) AS o_month,
        |  CAST(day(o_orderdate) AS INT) AS o_day,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |    AS days_since_95,
        |  substr(o_orderpriority, 1, 1) AS pri_code,
        |  lower(o_orderpriority) AS pri_lower,
        |  upper(o_orderstatus) AS status_upper,
        |  round(o_totalprice, 0) AS price_round,
        |  concat_ws(':', o_orderstatus, o_orderpriority) AS status_pri,
        |  (o_orderpriority LIKE '%URGENT%') AS is_urgent,
        |  o_orderkey % 97 AS key_mod,
        |  abs(o_custkey - 1000) AS cust_dist,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        |  sqrt(o_totalprice) AS price_sqrt,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE)
        |    AS price_up
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    QueryDef("q17_json_scalars", q17Json,
      Some("""SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  (json_extract_string(props, '$.k') IS NOT NULL) AS has_k
        |FROM events ORDER BY event_id""".stripMargin)),
    QueryDef("q17_array_scalars", q17Array,
      Some("""WITH d AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                t -> t <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |  toks[1] AS first_token,
        |  toks[-1] AS last_token,
        |  list_contains(toks, 'spark') AS has_spark,
        |  array_to_string(list_sort(toks)[1:3], ' ') AS sorted_first3
        |FROM d ORDER BY doc_id""".stripMargin)))
}
