// Skewed-fixture probe: q56 connected components on target/sf1skew, whose
// embeddings plant (a) one 2000-vector cosine clique (vec_id % 10 == 9)
// and (b) a 63-node PATH graph on the last 63 rows (consecutive cosine
// 0.5, diameter 62). Asserts the pointer-jumped CC closes in O(log d)
// rounds — plain min-label propagation would need ~62 — and that each
// plant resolves to ONE label (clique members pairwise ~1, path members
// consecutively 0.5, both >= the 0.35 bar). Component ISOLATION is NOT
// asserted: the round-11 regenerated base embeddings connect at 0.35, so
// background + plants resolve into one giant component (isolation holds
// only at q85's 0.95 bar — see pairmass_probe_q85.scala).
// The whole body is ONE braced block so the REPL's -I reader can never
// split a statement chain (split chains rebind to stale results and
// silently skip asserts — the pre-round-11 form of this probe did exactly
// that, and its component-size asserts never ran).
// Usage: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/skew_probe.scala < /dev/null
val skewReport: String = {
  import org.apache.spark.sql.functions._
  val dir = "/root/repo/target/sf1skew"
  val t0 = System.nanoTime()
  val cc = graft.operators.Dedup.q56(spark, dir).cache()
  val n = cc.count()
  val secs = (System.nanoTime() - t0) / 1e9
  val rounds = graft.operators.Dedup.lastCcRounds
  val comps = cc.groupBy(col("rep_id")).count()
    .orderBy(col("count").desc).limit(5).collect()
    .map(r => s"(${r.getLong(0)}, ${r.getLong(1)})").mkString(", ")
  val cliqueLabels = cc.filter(pmod(col("vec_id"), lit(10)) === 9)
    .select(col("rep_id")).distinct().count()
  // the path graph sits on the 63 HIGHEST vec_ids (the id space is sparse
  // — make_sf1 copies offset ids — so key off max, not row count)
  val maxId = cc.agg(max(col("vec_id"))).head().getLong(0)
  val pathLabels = cc.filter(col("vec_id") > maxId - 63)
    .select(col("rep_id")).distinct().count()
  assert(rounds <= 10, s"rounds $rounds not O(log diameter) — pointer jumping broken")
  assert(cliqueLabels == 1, s"planted clique split across $cliqueLabels labels")
  assert(pathLabels == 1, s"planted path split across $pathLabels labels")
  f"q56 on sf1skew: $n rows in $secs%.1f s, CC rounds = $rounds\n" +
    s"largest components (rep_id, size): $comps\n" +
    "SKEW_PROBE: PASS (rounds <= 10; clique and path each one label)"
}
println(skewReport)
sys.exit(0)
