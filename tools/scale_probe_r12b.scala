// Round-12 scale probe for the PQ + semantic-decon additions
// (q98/q98b/q99/q99b): interleaved sf0.1 -> sf1 (10x rows) -> sf1skew
// (dup-heavy) timing on ONE session, two passes each, min taken — the
// settle discipline of tools/skew_probe_r12.scala. What each ratio means:
//   q98/q98b — ADC scored pass is probes x corpus codes: linear; the
//              8 KMeans fits (q98) are sample-bounded so they must NOT grow;
//   q99     — labeled exact anchor: train x eval where eval = n/10, so
//              pairs grow 100x across the decade (ratio ~quadratic BY
//              CONSTRUCTION; twin q99b is the linear path);
//   q99b    — cell-mate pruned: eval probes explode to sqrt(cells) cells,
//              per-eval scanned mass ~n^(3/4);
//   skew    — the planted embedding clique (make_skewed) concentrates
//              vectors in one cell; q99b's eval x cell-mates and q98's
//              flat scoring must hold ~x1.
// Usage: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/scale_probe_r12b.scala < /dev/null
import graft.operators.Similarity

val dirs = Seq(
  "sf0.1" -> "/root/testdata/sf0.1",
  "sf1" -> "/root/repo/target/sf1",
  "sf1skew" -> "/root/repo/target/sf1skew")
val qs = Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
  "q98" -> Similarity.q98, "q98b" -> Similarity.q98b,
  "q99" -> Similarity.q99, "q99b" -> Similarity.q99b)

// warm-up: JIT/codegen on the small dir
qs.foreach { case (_, f) => f(spark, "/root/testdata/sf0.001").count() }

val results = collection.mutable.Map[(String, String), Double]()
for (pass <- 1 to 2; (sfName, dir) <- dirs; (qName, f) <- qs) {
  val t0 = System.nanoTime()
  val n = f(spark, dir).count()
  val dt = (System.nanoTime() - t0) / 1e9
  val key = (qName, sfName)
  results(key) = math.min(results.getOrElse(key, Double.MaxValue), dt)
  println(f"[scale-probe] pass$pass $sfName $qName ${dt}%.2f s ($n rows)")
}
for ((qName, _) <- qs) {
  val a = results((qName, "sf0.1")); val b = results((qName, "sf1"))
  val c = results((qName, "sf1skew"))
  println(f"[scale-probe] RESULT $qName sf0.1 ${a}%.2f s -> sf1 ${b}%.2f s " +
    f"(x${b / a}%.1f) ; sf1skew ${c}%.2f s (x${c / b}%.2f vs clean sf1)")
}
