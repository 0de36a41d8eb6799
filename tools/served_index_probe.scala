// Round-14 probe for VERDICT r13 #1: the served-index amortization pair.
// q98/q101's dominant cost is the fit+encode wall; ModelStore.saveIndex
// persists the encoded (vec_id, cell, codes) frame, and ivfPqServe runs the
// scored pass off the LOADED artifact. This measures, at sf0.1 and sf1:
//   (a) trained one-shot ivfPqTopK       = fit + encode + serve
//   (b) index build+save (once)          = fit + encode + write
//   (c) ivfPqServe off the loaded index  = the per-query cost after (b)
// Run: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 48g -I tools/served_index_probe.scala < /dev/null
import graft.operators._
import graft.functions.vectors
import graft.sources.ModelStore
import org.apache.spark.sql.functions._

def servedProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
  def timed[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[served] $label%-34s ${dt}%7.2f s"); (r, dt)
  }
  for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/target/sf1")) {
    println(s"[served] == $dir ==")
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .repartition(32, col("vec_id"))
      .select(col("vec_id"), vectors.toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull).localCheckpoint()
    val n = base.count()
    println(s"[served] corpus n=$n")
    def drain(df: org.apache.spark.sql.DataFrame): Long = df.count()
    // one-shot trained form, twice (2nd is the settled number)
    def oneShot(): Long = drain(Similarity.ivfPqTopK(base,
      Quantizers.quantizerFor(base, Similarity.ivfCellsFor(n)),
      Quantizers.pqFitCodebooks(base,
        Similarity.PqSubspaces, Similarity.PqCodewords)))
    timed("one-shot warmup")(oneShot())
    timed("one-shot fit+encode+serve")(oneShot())
    // build + persist once
    val quant = Quantizers.quantizerFor(base, Similarity.ivfCellsFor(n))
    val cbs = Quantizers.pqFitCodebooks(base,
      Similarity.PqSubspaces, Similarity.PqCodewords)
    val tmp = java.nio.file.Files.createTempDirectory("served-idx").toString
    timed("build+save index (paid once)") {
      ModelStore.saveIndex(Similarity.ivfPqEncode(base, quant, cbs),
        s"$tmp/index")
    }
    val loaded = ModelStore.loadIndex(spark, s"$tmp/index")
    timed("serve warmup")(drain(Similarity.ivfPqServe(loaded, base, quant, cbs)))
    timed("serve off loaded index")(
      drain(Similarity.ivfPqServe(loaded, base, quant, cbs)))
    timed("serve off loaded index (again)")(
      drain(Similarity.ivfPqServe(loaded, base, quant, cbs)))
    val bytes = new java.io.File(s"$tmp/index").listFiles()
      .filter(_.isFile).map(_.length()).sum
    println(f"[served] index artifact ${bytes / 1024.0}%.0f KiB for $n vectors")
  }
}
servedProbe(spark)
