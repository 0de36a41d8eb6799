package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark query plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Column names of the Spark result and the oracle SQL must match exactly —
  * the driver's compare sorts columns by name before hashing values.
  * Queries without an oracle get a weaker rows-only check; those are
  * additionally property-checked in ScalaTest specs.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])
