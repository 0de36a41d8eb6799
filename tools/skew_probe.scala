// Skewed-fixture probe: q56 connected components on target/sf1skew, whose
// embeddings plant (a) one 2000-vector cosine clique and (b) a 63-node PATH
// graph (diameter 62). Asserts the pointer-jumped CC closes the path in
// O(log 62) rounds — plain min-label propagation would need 62 — and that
// the planted component sizes come out exactly.
// Usage: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' -I tools/skew_probe.scala < /dev/null
val dir = "/root/repo/target/sf1skew"
val t0 = System.nanoTime()
val cc = graft.operators.Dedup.q56(spark, dir).cache()
val n = cc.count()
val secs = (System.nanoTime() - t0) / 1e9
val rounds = graft.operators.Dedup.lastCcRounds
import org.apache.spark.sql.functions._
val comps = cc.groupBy(col("rep_id")).count()
  .orderBy(col("count").desc).limit(5).collect()
println(f"q56 on sf1skew: $n rows in $secs%.1f s, CC rounds = $rounds")
println("largest components (rep_id, size): " +
  comps.map(r => s"(${r.getLong(0)}, ${r.getLong(1)})").mkString(", "))
val sizes = comps.map(_.getLong(1))
assert(rounds <= 10, s"rounds $rounds not O(log diameter) — pointer jumping broken")
assert(sizes.contains(2000L), s"giant clique component missing: ${sizes.toSeq}")
assert(sizes.contains(63L), s"63-node path component missing: ${sizes.toSeq}")
println("SKEW_PROBE: PASS (rounds <= 10; clique 2000 and path 63 resolved)")
sys.exit(0)
