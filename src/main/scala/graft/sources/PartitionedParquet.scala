package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet output — the canonical layout a curation
  * pipeline writes its corpus shards in: one directory per partition-key
  * value (`lang=en/…`), files within each partition sorted on the sort key
  * so downstream range scans and merge-style consumers read sequentially.
  *
  * At 100 TB this buys two things on the READ side, both asserted in
  * SourcesSpec: partition PRUNING (a `lang = 'en'` filter never lists, let
  * alone reads, the other languages' directories — PartitionFilters in the
  * scan, zero data touched) and within-file ordering (consumers needing
  * doc_id order per shard skip the sort). The partition key should be
  * low-cardinality and skew-tolerant (language, source, date — never a
  * high-cardinality id, which would explode the file count).
  */
object PartitionedParquet {

  def write(df: DataFrame, path: String, partitionKey: String,
      sortKey: String): Unit = {
    import org.apache.spark.sql.functions.col
    // RANGE-partition on (partitionKey, sortKey): each directory is written
    // by the few tasks owning that key's range (small file count — a plain
    // repartition(col) would write every task's sliver into every
    // directory), and crucially a SKEWED key value still spans multiple
    // tasks because the range boundaries cut on the sort key within it —
    // hash-repartitioning on the key alone would funnel a dominant value
    // (lang=en at half the corpus) through one task. Rows arrive
    // range-sorted, so the within-task sort is nearly free.
    df.repartitionByRange(col(partitionKey), col(sortKey))
      .sortWithinPartitions(col(partitionKey), col(sortKey))
      .write
      .partitionBy(partitionKey)
      .mode("overwrite")
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
