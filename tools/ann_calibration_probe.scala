// Round-13 probe: (a) the IMI quantizer tier driven by REAL data at the
// 200k-vector decade (r12 verdict #2 — the 5,041-cell spec instance proved
// it plans; this measures its constants), and (b) the ANN operating-point
// calibration at production codeword budgets (r12 verdict #3 — K=256 is
// what FAISS-style deployments ship; the registered q103 sweeps the seeded
// fixture geometry, this sweeps the TRAINED one).
// Everything lives inside one def: spark-shell -I splits top-level
// leading-dot chains into separate statements (silently losing the chain),
// while a def body parses as one unit.
// Run: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 48g -I tools/ann_calibration_probe.scala < /dev/null
import graft.operators._
import graft.functions.vectors
import org.apache.spark.sql.functions._

def calProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
  val dir = "/root/repo/target/sf10emb" // 200k perturbed vectors (make_sf1.py)

  def timed[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[cal] $label%-28s ${dt}%7.1f s"); (r, dt)
  }

  val base = spark.read.parquet(s"$dir/embeddings.parquet")
    .repartition(32, col("vec_id"))
    .select(col("vec_id"), vectors.toDouble(col("embedding")).as("v"))
    .filter(col("v").isNotNull).localCheckpoint()
  val n = base.count()
  println(s"[cal] corpus $n vectors, sqrt-n cells = ${Similarity.ivfCellsFor(n)}")

  // ---- coarse tiers: flat sqrt-n vs IMI at COMPARABLE cells vs IMI past
  // the flat 4096-cell plan-literal ceiling
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
  println(s"[cal] cells flat=${flatQ.nCells} imiSmall=${imiSmall.nCells} imiBig=${imiBig.nCells}")
  val quants = Seq("flat" + flatQ.nCells -> flatQ,
    "imi" + imiSmall.nCells -> imiSmall, "imi" + imiBig.nCells -> imiBig)

  // ---- q92b family through each tier: wall + recall vs a bounded exact
  // ground truth (50 probes x 200k = 10M cosines, cheap and exact)
  val e = spark.read.parquet(s"$dir/embeddings.parquet")
    .repartition(32, col("vec_id"))
    .select(col("vec_id").as("id"), col("label"),
      vectors.toDouble(col("embedding")).as("v"))
    .filter(col("v").isNotNull).localCheckpoint()
  val probes = e.filter(col("id") % 4000 === 0)
  def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  val (exactHN, _) = timed("exact hardneg 50 probes")(
    pairSet(Similarity.hardNegatives(probes, e, Similarity.HardNegK)))
  for ((name, q) <- quants) {
    val (got, dt) = timed(s"hardneg via $name")(
      pairSet(Similarity.hardNegativesQuantized(probes, e, Similarity.HardNegK, q)))
    println(f"[cal] RESULT hardneg $name recall=${(exactHN & got).size.toDouble / exactHN.size}%.3f wall=$dt%.1f s (probe cells ${Similarity.ivfProbesFor(q.nCells)})")
  }

  // ---- q85 candidate mass through each tier: the soft top-2 within-cell
  // pair bound the semantic-dedup join actually pays
  for ((name, q) <- quants) {
    val cells = base.select(col("vec_id"),
      explode(q.probeCells(col("v"), Similarity.SemProbeCells)).as("cell"))
    val (mass, dt) = timed(s"dedup mass via $name") {
      cells.groupBy(col("cell")).count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
        .head().getLong(0)
    }
    println(s"[cal] RESULT dedup-mass $name $mass within-cell pairs")
  }

  // ---- composed IVF-PQ through the flat tier and through IMI past the
  // ceiling: wall + recall vs exact q20 at the decade
  def topPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  val (ex20, _) = timed("exact q20 top-10")(topPairs(Similarity.q20(spark, dir)))
  val (cbs16, _) = timed("fit PQ K=16")(
    Quantizers.pqFitCodebooks(base, Similarity.PqSubspaces, Similarity.PqCodewords))
  for ((name, q) <- Seq("flat" + flatQ.nCells -> flatQ,
      "imi" + imiBig.nCells -> imiBig)) {
    val (got, dt) = timed(s"ivfPq via $name")(
      topPairs(Similarity.ivfPqTopK(base, q, cbs16)))
    println(f"[cal] RESULT ivfpq $name recall=${(ex20 & got).size.toDouble / ex20.size}%.3f wall=$dt%.1f s")
  }

  // ---- ADC codeword budget: the trained annSweep table at K=16 (deployed
  // demo point) vs K=256 (the production byte-code budget)
  val (cbs256, _) = timed("fit PQ K=256")(
    Quantizers.pqFitCodebooks(base, Similarity.PqSubspaces, 256))
  for ((kn, cbs) <- Seq("K16" -> cbs16, "K256" -> cbs256)) {
    val (tbl, dt) = timed(s"annSweep $kn")(
      Similarity.annSweep(base, flatQ, cbs).collect())
    tbl.foreach(r => println(s"[cal] SWEEP $kn nprobe=${r.getInt(0)} shortlist=${r.getInt(1)} scanned=${r.getLong(2)} recall=${if (r.isNullAt(5)) "null" else r.getDouble(5)}"))
    println(f"[cal] RESULT sweep $kn wall=$dt%.1f s")
  }
  println("[cal] DONE")
}

calProbe(spark)
