// Round-18 #5: q24's residual decade ratio (x19.8 vs ~x12 predicted at
// r17) was attributed to the candidate-pair distinct+shuffle. Decompose
// the post-fix q24 at one scale into its stages:
//   A: bucketed explode + self-join, RAW candidate count (no distinct)
//   B: A + distinct (the suspect exchange)
//   C: full q24 (B + two vector-fetch joins + cosine + sort)
// If (B - A) dominates C, the distinct is confirmed as the residual.
// Run:
//   SPARK_GRAFT_SF_DIR=target/sf10 /opt/spark/bin/spark-shell \
//     --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/q24_distinct_probe_r18.scala < /dev/null
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
val sp = graft.Sessions.local("q24-distinct-probe")
val base = (graft.Tables.embeddings(sp, sfDir)
  .repartition(sp.sparkContext.defaultParallelism, col("vec_id"))
  .select(col("vec_id"),
    graft.functions.vectors.toDouble(col("embedding")).as("v"))
  .localCheckpoint())
val n = base.count()
val planes = graft.operators.Similarity.planesFor(n)
println(s"PROBE n=$n planes=$planes")
val bucketed = base.select(col("vec_id"),
  explode(graft.functions.expressions.vecexprs
    .hyperplaneBuckets(col("v"), planes, graft.operators.Similarity.NTables))
    .as("bucket"))
def time(tag: String)(f: => Long): Unit = {
  val t0 = System.nanoTime()
  val c = f
  println(f"PROBE $tag%-12s ${(System.nanoTime() - t0) / 1e9}%9.2f s rows=$c")
}
val raw = (bucketed.select(col("bucket"), col("vec_id").as("a_id"))
  .join(bucketed.select(col("bucket"), col("vec_id").as("b_id")), Seq("bucket"))
  .filter(col("a_id") < col("b_id"))
  .select(col("a_id"), col("b_id")))
time("A_raw")(raw.count())
time("B_distinct")(raw.distinct().count())
time("C_full") {
  graft.operators.Similarity.q24(sp, sfDir)
    .write.mode("overwrite").format("noop").save(); -1L
}
sp.stop()
