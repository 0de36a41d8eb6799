package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites — same Sessions.local recipe as the
  * driver's Verify/Bench entry points, so test semantics can't drift.
  */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("graft-test")
}
