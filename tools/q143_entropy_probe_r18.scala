// Round-18: q143's sf10 sweep died with disk-full in the pigeonhole pair
// join. Hypothesis: the synthetic contours COLLIDE at scale — identical
// fingerprints across many clips make the Hamming<=3 pair set itself
// quadratic in the biggest collision class. Measure fp entropy per scale.
// Run:
//   SPARK_GRAFT_SF_DIR=target/sf1 /opt/spark/bin/spark-shell --driver-memory 24g \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/q143_entropy_probe_r18.scala < /dev/null
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
val sp = graft.Sessions.local("q143-entropy-probe")
val fp = graft.operators.Multimodal.audioFingerprints(
  graft.operators.Multimodal.audioNeardupTable(sp, sfDir)).localCheckpoint()
val n = fp.count()
val d = fp.select(col("fp")).distinct().count()
val top = fp.groupBy(col("fp")).count().orderBy(col("count").desc)
  .limit(5).collect().map(_.getLong(1)).mkString(",")
// pair mass of the identical-fp classes alone (H=0 pairs): sum m*(m-1)/2
val m0 = fp.groupBy(col("fp")).count()
  .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0).getLong(0)
println(s"PROBE $sfDir clips=$n distinct_fp=$d top5_class=[$top] h0_pairs=$m0")
sp.stop()
