// Round-18 #4: the deep-K wall curve of the tie-accepting batcher (q145)
// vs the exactness-guarded one (q142) — the guard degenerates to ~one
// merge/round when counts tie (K=64 gain was only x1.3,
// tools/bpe_batch_probe_r17), while real vocabularies need 10^4-10^5
// merges. Measures wall + rounds at K in {256, 1024} for q145 (plus q142
// at K=256 for contrast) over sf0.1 documents.
// Run:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/bpe_deepk_probe_r18.scala < /dev/null
import org.apache.spark.sql.functions._

val sp = graft.Sessions.local("bpe-deepk-probe")
val docs = graft.Tables.documents(sp, "/root/testdata/sf0.1")
  .select(col("text")).cache()
docs.count()

for (k <- Seq(256, 1024)) {
  val t0 = System.nanoTime()
  val (m, rounds) = graft.operators.TextAnalysis.bpeLearnMergesDeep(docs, k)
  val t = (System.nanoTime() - t0) / 1e9
  println(f"PROBE deep  K=$k%5d merges=${m.size}%5d rounds=$rounds%5d " +
    f"wall=${t}%8.2fs (${t / math.max(rounds, 1)}%5.3f s/round)")
}
val t1 = System.nanoTime()
val (mg, roundsG) = graft.operators.TextAnalysis.bpeLearnMergesBatched(docs, 256)
val tG = (System.nanoTime() - t1) / 1e9
println(f"PROBE guard K=  256 merges=${mg.size}%5d rounds=$roundsG%5d " +
  f"wall=${tG}%8.2fs (${tG / math.max(roundsG, 1)}%5.3f s/round)")
sp.stop()
