// Round-13 (r12 verdict #4): isolate the doc-fates fold — round 12's chain
// of 10 sequential id-keyed left joins vs round 13's one union +
// map-side-combinable max — over nested survivor frames with EXACTLY the
// sf10 CurationRun stage sizes (490k → 316, the measured manifest). Both
// forms run in one session (same clock), 2 passes, min; results asserted
// identical.
// Run: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 48g -I tools/fates_fold_probe.scala < /dev/null
import org.apache.spark.sql.functions._

def fatesProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
  val names = Seq("raw", "quality", "classifier", "exact_dedup", "near_dedup",
    "decontaminated", "sem_dedup", "line_dedup", "span_cut", "source_cap",
    "sampled")
  val sizes = Seq(490000L, 446817L, 446426L, 406007L, 4274L, 4264L, 4264L,
    4264L, 4264L, 400L, 316L)
  // nested survivor sets by construction (range prefixes), materialized
  val stages = names.zip(sizes).map { case (n, s) =>
    n -> spark.range(s).select(col("id").as("doc_id")).localCheckpoint()
  }
  def timed[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[fates] $label%-18s ${dt}%6.1f s"); (r, dt)
  }
  def oldFold(): org.apache.spark.sql.DataFrame =
    stages.zipWithIndex.tail.foldLeft(
      stages.head._2.select(col("doc_id"),
        lit(0).as("last_stage_idx"), lit(stages.head._1).as("last_stage"))) {
      case (acc, ((name, df), i)) =>
        acc.join(df.select(col("doc_id"), lit(true).as("hit")),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("hit"), lit(i)).otherwise(col("last_stage_idx"))
              .as("last_stage_idx"),
            when(col("hit"), lit(name)).otherwise(col("last_stage"))
              .as("last_stage"))
    }
  def newFold(): org.apache.spark.sql.DataFrame = {
    val stageName = typedLit(
      stages.zipWithIndex.map { case ((name, _), i) => i -> name }.toMap)
    stages.zipWithIndex
      .map { case ((_, df), i) =>
        df.select(col("doc_id"), lit(i).as("stage_idx")) }
      .reduce(_.union(_))
      .groupBy(col("doc_id"))
      .agg(max(col("stage_idx")).as("last_stage_idx"))
      .select(col("doc_id"), col("last_stage_idx"),
        element_at(stageName, col("last_stage_idx")).as("last_stage"))
  }
  // equality first (cheap at these sizes), then timed passes
  val a = oldFold().collect().map(r => (r.getLong(0), r.getInt(1))).sorted
  val b = newFold().collect().map(r => (r.getLong(0), r.getInt(1))).sorted
  require(a.sameElements(b), "folds disagree")
  println(s"[fates] folds agree on ${a.length} docs")
  var oldBest = Double.MaxValue; var newBest = Double.MaxValue
  for (pass <- 1 to 2) {
    val (_, t1) = timed(s"old fold pass$pass")(
      oldFold().write.mode("overwrite").format("noop").save())
    val (_, t2) = timed(s"new fold pass$pass")(
      newFold().write.mode("overwrite").format("noop").save())
    oldBest = math.min(oldBest, t1); newBest = math.min(newBest, t2)
  }
  println(f"[fates] RESULT old=${oldBest}%.1f s new=${newBest}%.1f s (x${oldBest / newBest}%.1f)")
}
fatesProbe(spark)
