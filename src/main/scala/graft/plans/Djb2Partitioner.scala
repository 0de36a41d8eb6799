package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.Partitioner

/** djb2 hash partitioner — parity with the reference's shuffle routing
  * (mapreduce.c:64-72, which credits the public djb2 algorithm at
  * cse.yorku.ca/~oz/hash: h = 5381; h = h * 33 + byte, unsigned long).
  *
  * Partition identity never affects query results (SURVEY §1.4) — Spark's
  * Murmur3 is used everywhere in the engine proper. This partitioner exists
  * only so the partition-layout parity test can assert that the C binary's
  * output blocks are exactly the djb2(word) % n classes (Djb2Spec).
  */
final case class Djb2Partitioner(override val numPartitions: Int)
    extends Partitioner {

  def getPartition(key: Any): Int =
    Djb2Partitioner.hashPartition(key.toString, numPartitions)
}

object Djb2Partitioner {
  /** Unsigned-64-bit djb2 over UTF-8 bytes, reduced mod n. */
  def hashPartition(s: String, n: Int): Int = {
    var h = 5381L
    for (b <- s.getBytes(StandardCharsets.UTF_8)) h = h * 33 + (b & 0xff)
    java.lang.Long.remainderUnsigned(h, n.toLong).toInt
  }
}
