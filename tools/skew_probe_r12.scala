// Dup-heavy probe for the late round-12 additions (q94-q97): interleaved
// clean-vs-skew timing on the SAME session (target/sf1 vs target/sf1skew,
// identical row counts). What the fixture stresses per query:
//   q94 — the boilerplate mega-tokens (~30% of docs share 8 hot tokens)
//         hit the classifier's token stream; the rollup is doc-keyed so
//         hot TOKENS must not matter (no token-keyed shuffle exists);
//   q95 — 30% exact-dup docs collapse to the same token sets; HLL register
//         state is max-based so dup mass adds nothing to sketch size;
//   q96 — the planted embedding clique reuses one base vector; the dim-keyed
//         aggregate is indifferent to value skew by construction;
//   q97 — ~100 md5 groups of ~150 exact copies each hit the md5-keyed count
//         AND the count-back join on the same hot keys (partial aggregation
//         collapses the count side map-side; AQE splits the join side).
// Usage: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/skew_probe_r12.scala < /dev/null

val clean = "/root/repo/target/sf1"
val skew = "/root/repo/target/sf1skew"
for (d <- Seq(clean, skew); t <- Seq("documents", "embeddings"))
  spark.read.parquet(s"$d/$t.parquet").count()

val names = Seq("q94_classifier_score", "q95_hll_union",
  "q96_embedding_stats", "q97_corpus_health",
  // re-measured after the classifier gate joined the funnel (the r11 row
  // predates the stage)
  "q88_curation_funnel")

val best = scala.collection.mutable.Map[(String, String), Double]()
def once(name: String, dir: String): Unit = {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(name)(spark, dir)
    .write.mode("overwrite").format("noop").save()
  val t = (System.nanoTime() - t0) / 1e9
  val k = (name, dir)
  best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
}
// 3 interleaved passes; within a pass each query runs clean then skew
// back-to-back, so a load window hits BOTH sides of the ratio equally.
for (pass <- 1 to 3; n <- names; d <- Seq(clean, skew)) once(n, d)

println("query                      sf1(clean)  sf1skew  ratio")
for (n <- names) {
  val c = best((n, clean)); val s = best((n, skew))
  println(f"$n%-26s ${c}%8.2f s ${s}%6.2f s  x${s / c}%.2f")
}
sys.exit(0)
