// q107 streaming near-dup serve, sf0.1 -> sf1 scaling on the SAME session:
// one banded index build (state = distinct band keys, the remember-what-
// you've-seen floor) + a band-keyed ids-only serve join, so wall must scale
// ~linearly with the corpus. Prints the state-op row counts after the big
// drain: rowsTotal must track DISTINCT bands (<= 8 x docs), and is compared
// against the corpus row count to show text never enters the state store.
// Usage: /opt/spark/bin/spark-shell --driver-memory 48g \
//   --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/q107_probe.scala < /dev/null
val report: String = {
  val small = "/root/testdata/sf0.1"
  val big = "/root/repo/target/sf1"
  for (d <- Seq(small, big))
    spark.read.parquet(s"$d/documents.parquet").count()
  val best = scala.collection.mutable.Map[String, Double]()
  var bigState: Seq[(String, Long, Long, Long)] = Nil
  var bigDups = 0L
  for (pass <- 1 to 3; d <- Seq(small, big)) {
    val t0 = System.nanoTime()
    val out = graft.SparkEntry.queries("q107_stream_neardup_serve")(spark, d)
    val dups = out.filter(org.apache.spark.sql.functions.col("near_dup")).count()
    val t = (System.nanoTime() - t0) / 1e9
    best(d) = math.min(best.getOrElse(d, Double.MaxValue), t)
    if (d == big) {
      bigState = graft.streaming.StreamReplay.lastStateOps
      bigDups = dups
    }
  }
  val s = best(small); val b = best(big)
  val nBig = spark.read.parquet(s"$big/documents.parquet").count()
  f"q107_stream_neardup_serve   sf0.1 ${s}%6.2f s   sf1 ${b}%6.2f s   x${b / s}%.2f" +
    s"\nsf1 docs=$nBig near_dups=$bigDups state ops (name, rowsTotal, updated, dropped): $bigState"
}
println(report)
sys.exit(0)
