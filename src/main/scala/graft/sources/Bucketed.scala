package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join tool for keys joined
  * repeatedly at scale: both sides pre-hashed into the same bucket count on
  * the join key mean the join needs NO exchange at read time (each task
  * pairs bucket i with bucket i). At 100 TB this converts the dominant
  * repeated shuffle of a fact table into a one-time write-side cost.
  * BucketingSpec asserts the exchange-free plan.
  */
object Bucketed {

  /** Write df as a bucketed (and sorted) managed table. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
