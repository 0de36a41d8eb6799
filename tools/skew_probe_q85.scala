// Dup-heavy probe for the q85-q93 curation family (round-10 mandate #3):
// interleaved clean-vs-skew timing on the SAME session (target/sf1 vs
// target/sf1skew, identical row counts), plus the q85 pair-mass assertion —
// the 2,000-vector planted clique must produce ~C(2000,2) surviving pairs
// concentrated in clique cells, NOT an N^2 blow-up (N=20k vectors would be
// 2.0e8 pairs; the assertion caps candidates at 4x the clique mass).
// Usage: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/skew_probe_q85.scala < /dev/null
import org.apache.spark.sql.functions._

val clean = "/root/repo/target/sf1"
val skew = "/root/repo/target/sf1skew"
// warm both fixtures' file caches so pass 1 doesn't bill cold reads
for (d <- Seq(clean, skew); t <- Seq("documents", "embeddings"))
  spark.read.parquet(s"$d/$t.parquet").count()

val names = Seq("q85_semantic_dedup", "q86_decontaminate_cut",
  "q87_split_repair", "q88_curation_funnel", "q89_source_cap",
  "q90_eval_contam_report", "q91_lm_fit_score", "q92_hard_negatives",
  "q93_embedding_outliers")

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

// ---- q85 pair-mass assertion on the skewed fixture ----------------------
// Reconstruct q85's candidate stage exactly (sample-fit quantizer, soft
// top-2 cells, ids-only within-cell self-join) and count:
//   candPairs  = distinct within-cell id pairs (what gets scored)
//   realPairs  = pairs surviving the cosine >= 0.95 gate
// The planted clique (vec_id % 10 == 9, 2,000 vectors, pairwise cosine ~1)
// contributes exactly C(2000,2) = 1,999,000 real pairs.
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.functions.expressions.vecexprs
import graft.operators.Similarity.{IvfCells, SemProbeCells, SemFitSample, SemDedupCosine}

val b = graft.Tables.embeddings(spark, skew)
  .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
  .select(col("vec_id"), graft.functions.vectors.toDouble(col("embedding")).as("v"))
  .filter(col("v").isNotNull)
  .localCheckpoint()
val nVec = b.count()
// uniform per-row hash key — must mirror Similarity.fitCentroids
val fitSample = b.select(col("v"), xxhash64(col("v"), col("vec_id")).as("hk"))
  .orderBy(col("hk")).limit(SemFitSample)
  .withColumn("fv", array_to_vector(col("v")))
val model = new KMeans().setK(IvfCells).setSeed(42).setMaxIter(5)
  .setInitMode("random").setFeaturesCol("fv").setPredictionCol("cell")
  .fit(fitSample)
val centroids = model.clusterCenters.map(_.toArray)
val cells = b.select(col("vec_id"),
  explode(vecexprs.nearestCells(col("v"), centroids, SemProbeCells)).as("cell"))
  .localCheckpoint()
val cellSizes = cells.groupBy(col("cell")).count().orderBy(col("count").desc)
println("top cells (cell, members incl. soft copies): " +
  cellSizes.limit(5).collect().map(r => s"(${r.get(0)}, ${r.getLong(1)})").mkString(", "))
val cand = cells.select(col("cell"), col("vec_id").as("a_id"))
  .join(cells.select(col("cell"), col("vec_id").as("b_id")), Seq("cell"))
  .filter(col("a_id") < col("b_id")).select(col("a_id"), col("b_id")).distinct()
  .localCheckpoint()
val candPairs = cand.count()
val realPairs = cand
  .join(b.select(col("vec_id").as("a_id"), col("v").as("av")), Seq("a_id"))
  .join(b.select(col("vec_id").as("b_id"), col("v").as("bv")), Seq("b_id"))
  .filter(round(vecexprs.cosineSim(col("av"), col("bv")), 6) >= SemDedupCosine)
  .count()
val cliquePairs = 2000L * 1999 / 2
val allPairs = nVec * (nVec - 1) / 2
println(f"vectors=$nVec  candidate pairs=$candPairs  surviving pairs=$realPairs")
println(f"clique C(2000,2)=$cliquePairs  all-pairs N^2/2=$allPairs")
assert(realPairs >= cliquePairs,
  s"clique pairs missed: $realPairs < $cliquePairs — soft assignment split the clique")
assert(realPairs < cliquePairs + 100000,
  s"surviving pairs $realPairs far above clique mass — unexpected dup structure")
assert(candPairs < 4 * cliquePairs,
  s"candidate pairs $candPairs not concentrated: > 4x clique mass (N^2/2 = $allPairs)")
println("Q85_SKEW_PROBE: PASS (pair mass = planted clique, not N^2)")
sys.exit(0)
