package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers that keep hash-checked aggregates bit-deterministic
  * across engines AND across runs.
  *
  * Summing doubles is order-dependent (Spark's partial-agg order varies run
  * to run), and double→decimal casts are engine-dependent: Spark converts
  * through the double's shortest string representation
  * (BigDecimal.valueOf), DuckDB through the binary value — they disagree one
  * ulp-ish at the cut digit often enough to break a 60k-row sum (observed on
  * q04). The only cross-engine-stable per-row discretization is pure IEEE
  * arithmetic: scale by 1e4 in double (deterministic), floor (deterministic),
  * sum as BIGINT (exact, order-independent), divide once at the end.
  *
  * Semantics: SUM/AVG over per-row values truncated to 4 decimal places —
  * declared in the oracle contract. Headroom: |sum| must stay under
  * 2^53/1e4 ≈ 9e11, fine for the declared scales; at larger scale switch the
  * final divide to decimal.
  */
object num {

  /** Per-row fixed-point image (4 dp, truncated) of a double expression. */
  def fixed4(c: Column): Column = floor(c * lit(10000)).cast("long")

  /** Order-independent SUM of a double expression, as double. */
  def dsum(c: Column): Column =
    sum(fixed4(c)).cast("double") / lit(10000)

  /** Order-independent AVG of a double expression, as double. */
  def davg(c: Column): Column =
    sum(fixed4(c)).cast("double") / lit(10000) / count(lit(1))

  /** Oracle-side (DuckDB) images of the same helpers. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST(FLOOR(($e) * 10000) AS BIGINT)) AS DOUBLE) / 10000"
  def sqlDavg(e: String): String =
    s"${sqlDsum(e)} / COUNT(*)"
}
