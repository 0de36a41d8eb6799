package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table; at cluster scale these would be partitioned
  * directories — `spark.read.parquet` handles both shapes identically, so the
  * engine code never assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  /** `ts`'s PHYSICAL type depends on how the fixture was generated —
    * TIMESTAMP(NANOS) (read as a raw nanos BIGINT under Sessions'
    * nanosAsLong) or plain timestamp[us]/[ns] (read as a Spark timestamp,
    * NTZ when the writer stored no zone). Expose the SAME logical pair
    * either way: a microsecond TIMESTAMP (`ts`, session-zone UTC — the
    * instant DuckDB's reader exposes to the oracle) plus the exact nano
    * count (`ts_ns`, truncated at the source's own resolution). Every
    * query works in the microsecond-or-coarser domain, so both physical
    * forms hash identically against the oracle.
    */
  def withEventTime(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      case _ =>
        raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    withEventTime(apply(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
