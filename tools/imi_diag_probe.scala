// Round-13 diagnostic: WHY does the IMI tier return zero hard-negative
// recall at 200k while flat returns 1.0? Separates "IMI mis-routes
// nearest neighbors" (a real bug) from "the fixture's 0.35 ceiling makes
// hard negatives ~orthogonal, which no locality router should find — and
// flat only finds them because 446 joint cells are so coarse they glue
// ~4.5 unrelated modes per cell".
// Run: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 48g -I tools/imi_diag_probe.scala < /dev/null
import graft.operators._
import graft.functions.vectors
import org.apache.spark.sql.functions._

def diag(spark: org.apache.spark.sql.SparkSession): Unit = {
  val dir = "/root/repo/target/sf10emb"
  def timed[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[diag] $label%-28s ${dt}%7.1f s"); (r, dt)
  }
  val base = spark.read.parquet(s"$dir/embeddings.parquet")
    .repartition(32, col("vec_id"))
    .select(col("vec_id"), vectors.toDouble(col("embedding")).as("v"))
    .filter(col("v").isNotNull).localCheckpoint()
  val n = base.count()
  val (flatQ, _) = timed("fit flat sqrt-n")(
    Quantizers.quantizerFor(base, Similarity.ivfCellsFor(n)))
  val (imiSmall, _) = timed("fit IMI comparable") {
    val (a, b) = Quantizers.fitImiCodebooks(base, Similarity.ivfCellsFor(n))
    ImiQuantizer(a, b)
  }
  val (imiBig, _) = timed("fit IMI 5041") {
    val (a, b) = Quantizers.fitImiCodebooks(base, 5000)
    ImiQuantizer(a, b)
  }
  val quants = Seq("flat" + flatQ.nCells -> flatQ,
    "imi" + imiSmall.nCells -> imiSmall, "imi" + imiBig.nCells -> imiBig)

  // 1) RETRIEVAL recall: ivfTopK (q39's tail, 5 probes, top-10 cosine) —
  // the tier's actual contract. If IMI fails HERE the router is broken.
  def topPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  val (ex20, _) = timed("exact q20 top-10")(topPairs(Similarity.q20(spark, dir)))
  for ((name, q) <- quants) {
    val (got, dt) = timed(s"ivfTopK via $name")(
      topPairs(Similarity.ivfTopK(base, q)))
    println(f"[diag] RESULT retrieval $name recall=${(ex20 & got).size.toDouble / ex20.size}%.3f wall=$dt%.1f s")
  }

  // 2) cell-population profile per quantizer: realized cells, top-cell
  // share, mean cell size — coarse glue vs fine split, the mechanism
  for ((name, q) <- quants) {
    val h = base.select(q.assign(col("v")).as("cell"))
      .groupBy(col("cell")).count()
      .agg(count(lit(1)).as("realized"), max(col("count")).as("biggest"),
        avg(col("count")).as("mean"))
      .head()
    println(s"[diag] RESULT cells $name realized=${h.getLong(0)} biggest=${h.getLong(1)} mean=${"%.1f".format(h.getDouble(2))}")
  }

  // 3) hard-negative candidate anatomy at 50 probes: how many cell-mate
  // candidates exist, and what their cosine distribution is — if IMI's
  // cell-mates are all >= the 0.35 ceiling, the zero recall is the gate,
  // not the router
  val e = spark.read.parquet(s"$dir/embeddings.parquet")
    .repartition(32, col("vec_id"))
    .select(col("vec_id").as("id"), col("label"),
      vectors.toDouble(col("embedding")).as("v"))
    .filter(col("v").isNotNull).localCheckpoint()
  val probes = e.filter(col("id") % 4000 === 0)
    .select(col("id").as("probe_id"), col("label").as("plabel"),
      col("v").as("pv"))
  for ((name, q) <- quants) {
    val assigned = e.select(col("id"), col("label"), col("v"),
      q.assign(col("v")).as("cell"))
    val pc = probes.select(col("probe_id"), col("plabel"), col("pv"),
      explode(q.probeCells(col("pv"), Similarity.ivfProbesFor(q.nCells)))
        .as("cell"))
    val stats = assigned.join(broadcast(pc), Seq("cell"))
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"),
        (col("label") =!= col("plabel")).as("cross"),
        round(graft.functions.expressions.vecexprs.cosineSim(
          col("pv"), col("v")), 6).as("c"))
      .agg(count(lit(1)).as("cands"),
        sum(when(col("cross"), 1L).otherwise(0L)).as("cross_cands"),
        sum(when(col("cross") && col("c") < Similarity.hardNegCeiling, 1L)
          .otherwise(0L)).as("below_ceiling"),
        min(col("c")).as("cmin"), avg(col("c")).as("cavg"),
        max(col("c")).as("cmax"))
      .head()
    println(s"[diag] RESULT hn-anatomy $name cands=${stats.getLong(0)} cross=${stats.getLong(1)} below_ceiling=${stats.getLong(2)} cosine[min/avg/max]=${"%.3f/%.3f/%.3f".format(stats.getDouble(3), stats.getDouble(4), stats.getDouble(5))}")
  }
  println("[diag] DONE")
}
diag(spark)
