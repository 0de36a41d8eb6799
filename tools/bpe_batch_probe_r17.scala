// Round-17 #4: the per-step wall curve of BPE merge learning — sequential
// (q139: one shuffle + one 1-row collect PER MERGE) vs batched (q142: the
// guarded top-M disjoint prefix, same answer, ~K/M rounds). At production
// vocabularies (K = 10^4-10^5) the sequential form is a driver-latency
// wall; this probe measures both at K in {8, 32, 64} over sf0.1 documents
// and asserts the merge tables stay IDENTICAL at every K (the guard's
// exactness claim, measured beyond the spec's K=8).
// Run:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/bpe_batch_probe_r17.scala < /dev/null
import org.apache.spark.sql.functions._

val sp = graft.Sessions.local("bpe-batch-probe")
val docs = graft.Tables.documents(sp, "/root/testdata/sf0.1")
  .select(col("text")).cache()
docs.count() // warm the cache so both learners read identical inputs

for (k <- Seq(8, 32, 64)) {
  val t0 = System.nanoTime()
  val seqM = graft.operators.TextAnalysis.bpeLearnMerges(docs, k)
  val tSeq = (System.nanoTime() - t0) / 1e9
  val t1 = System.nanoTime()
  val (batM, rounds) =
    graft.operators.TextAnalysis.bpeLearnMergesBatched(docs, k)
  val tBat = (System.nanoTime() - t1) / 1e9
  assert(seqM == batM, s"K=$k: batched merges diverged from sequential")
  println(f"PROBE K=$k%3d seq=${tSeq}%7.2fs (${tSeq / k}%5.3f s/merge) " +
    f"batched=${tBat}%7.2fs rounds=$rounds%3d " +
    f"(${tBat / rounds}%5.3f s/round) speedup=${tSeq / tBat}%4.2fx IDENTICAL")
}
println("PROBE PASS")
System.exit(0)
