// Round-13: with exact joint-distance probe order in place, where does the
// IMI tier's hard-negative recall recover as the fan-out grows? (The flat
// tier hits 1.000 at its co-scaled 22 cells; the product grid's different
// centroid geometry may simply need a deeper probe list at equal cell
// count — exactly the operating-point question q103 exists to answer.)
// Run: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 48g -I tools/imi_fanout_probe.scala < /dev/null
import graft.operators._
import graft.functions.vectors
import org.apache.spark.sql.functions._

def fanoutProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
  val dir = "/root/repo/target/sf10emb"
  def timed[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[fan] $label%-28s ${dt}%7.1f s"); (r, dt)
  }
  val e = spark.read.parquet(s"$dir/embeddings.parquet")
    .repartition(32, col("vec_id"))
    .select(col("vec_id").as("id"), col("label"),
      vectors.toDouble(col("embedding")).as("v"))
    .filter(col("v").isNotNull).localCheckpoint()
  val base = e.select(col("id").as("vec_id"), col("v"))
  val n = base.count()
  val probeSrc = e.filter(col("id") % 4000 === 0)
  val probes = probeSrc
    .select(col("id").as("probe_id"), col("label").as("plabel"),
      col("v").as("pv"))
  def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  val (exactHN, _) = timed("exact hardneg 50 probes")(
    pairSet(Similarity.hardNegatives(probeSrc, e, Similarity.HardNegK)))

  val (flatQ, _) = timed("fit flat sqrt-n")(
    Quantizers.quantizerFor(base, Similarity.ivfCellsFor(n)))
  val (imiSmall, _) = timed("fit IMI comparable") {
    val (a, b) = Quantizers.fitImiCodebooks(base, Similarity.ivfCellsFor(n))
    ImiQuantizer(a, b)
  }
  // hardNegativesQuantized uses ivfProbesFor internally; sweep fan-out by
  // replicating its body with an explicit probe count
  def hnAt(q: CellQuantizer, nprobe: Int) = {
    val pc = probes.select(col("probe_id"), col("plabel"), col("pv"),
      explode(q.probeCells(col("pv"), nprobe)).as("cell"))
    val assigned = e.select(col("id"), col("label"), col("v"),
      q.assign(col("v")).as("cell"))
    val scored = assigned.join(broadcast(pc), Seq("cell"))
      .filter(col("label") =!= col("plabel"))
      .select(col("probe_id"), col("id").as("cand_id"),
        round(graft.functions.expressions.vecexprs.cosineSim(
          col("pv"), col("v")), Similarity.ScoreDp).as("c"))
      .filter(col("c") < Similarity.hardNegCeiling)
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
          .orderBy(col("c").desc, col("cand_id"))))
      .filter(col("rnk") <= Similarity.HardNegK)
      .select(col("probe_id"), col("cand_id"))
    pairSet(scored)
  }
  for ((name, q) <- Seq("flat446" -> flatQ, "imi462" -> imiSmall);
       p <- Seq(11, 22, 44, 88, 176)) {
    val (got, dt) = timed(s"hn $name p=$p")(hnAt(q, p))
    println(f"[fan] RESULT $name nprobe=$p recall=${(exactHN & got).size.toDouble / exactHN.size}%.3f wall=$dt%.1f s")
  }
  println("[fan] DONE")
}
fanoutProbe(spark)
