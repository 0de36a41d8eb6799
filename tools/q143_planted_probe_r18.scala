// Round-18 #7 (VERDICT r17 "What's wrong #4"): the planting comment at
// Multimodal's AudioPert* constants said "~40/50 within [Hamming <= 3],
// max 5" while README/SURVEY say "all 50 within the bound" — one of the
// texts describes a pre-final constant set. This probe measures the
// actual planted-pair Hamming distribution at the SHIPPED constants on
// the driver's verify fixture (sf0.01, 500 docs -> 50 planted twins).
// Run:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/q143_planted_probe_r18.scala < /dev/null
import org.apache.spark.sql.functions._

val sp = graft.Sessions.local("q143-planted-probe")
val fp = graft.operators.Multimodal.audioFingerprints(
  graft.operators.Multimodal.audioNeardupTable(sp, "/root/testdata/sf0.01"))
val base = (fp.filter(col("id") < graft.operators.Multimodal.AudioPertBase)
  .select(col("id"), col("fp").as("fp_a")))
val pert = (fp.filter(col("id") >= graft.operators.Multimodal.AudioPertBase)
  .select((col("id") - graft.operators.Multimodal.AudioPertBase).as("id"),
    col("fp").as("fp_b")))
val d = (base.join(pert, Seq("id"))
  .select(col("id"), bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("h")))
val hist = d.groupBy(col("h")).count().orderBy(col("h")).collect()
val n = d.count()
val within = d.filter(col("h") <= 3).count()
val hmax = d.agg(max(col("h"))).collect()(0).getInt(0)
println(s"PROBE planted pairs n=$n within_h3=$within max_h=$hmax " +
  hist.map(r => s"h${r.getInt(0)}:${r.getLong(1)}").mkString("dist={", ",", "}"))
sp.stop()
