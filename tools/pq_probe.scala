// Round-12 PQ probe: smoke q98/q98b at sf0.001 + sf0.01, dump q98b for the
// DuckDB oracle cross-check, and report ADC-vs-exact top-10 recall.
// Usage: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/pq_probe.scala < /dev/null
import graft.operators.Similarity

for (sf <- Seq("sf0.001", "sf0.01")) {
  val dir = s"/root/testdata/$sf"
  val t0 = System.nanoTime()
  val seeded = Similarity.q98b(spark, dir)
  seeded.write.mode("overwrite").parquet(s"/tmp/pq_probe/$sf/q98b")
  val t1 = System.nanoTime()
  val trained = Similarity.q98(spark, dir)
  val tRows = trained.collect()
  val t2 = System.nanoTime()
  val exact = Similarity.q20(spark, dir).collect()
    .map(r => (r.getLong(0), r.getLong(2))).toSet
  val tSet = tRows.map(r => (r.getLong(0), r.getLong(2))).toSet
  val sSet = spark.read.parquet(s"/tmp/pq_probe/$sf/q98b").collect()
    .map(r => (r.getLong(0), r.getLong(2))).toSet
  println(f"[pq-probe] $sf q98b ${(t1 - t0) / 1e9}%.2f s (${sSet.size} pairs), " +
    f"q98 ${(t2 - t1) / 1e9}%.2f s (${tSet.size} pairs)")
  println(f"[pq-probe] $sf recall vs exact: trained ${
    (tSet & exact).size.toDouble / exact.size}%.3f seeded ${
    (sSet & exact).size.toDouble / exact.size}%.3f")
}
