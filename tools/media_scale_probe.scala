// Round-13 probe (r12 verdict #6): the REAL javax.imageio decode path
// measured at scale. q77b proved the codec round-trip under a DuckDB oracle
// on the 12-asset committed fixture; this synthesizes REAL PNG tables at
// two decades (2k and 20k assets, near-dup groups of 4 with per-copy pixel
// perturbations) and measures the full decode → dHash → pigeonhole →
// profile pipeline wall at both, so the scale table carries a real-decode
// image row instead of only the byte-grid stub's.
// Run: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 48g -I tools/media_scale_probe.scala < /dev/null
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import spark.implicits._

val W = 128; val H = 128

def makeMedia(n: Int, path: String): Double = {
  val t0 = System.nanoTime()
  spark.range(n).repartition(32).mapPartitions { ids =>
    ids.map { id =>
      // groups of 4 near-identical assets: one deterministic base pattern
      // per group, then (id % 4) * 5 perturbed pixels per copy — the
      // near-dup structure the Hamming <= 3 profile is meant to find
      val img = new java.awt.image.BufferedImage(
        W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val base = new java.util.Random(id / 4)
      var y = 0
      while (y < H) {
        var x = 0
        while (x < W) {
          val v = base.nextInt(256)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val pert = new java.util.Random(id)
      var k = 0
      while (k < (id % 4).toInt * 5) {
        val x = pert.nextInt(W); val yy = pert.nextInt(H)
        val v = pert.nextInt(256)
        img.setRGB(x, yy, (v << 16) | (v << 8) | v)
        k += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, bos.toByteArray)
    }
  }.toDF("media_id", "media")
    .write.mode("overwrite").parquet(path)
  (System.nanoTime() - t0) / 1e9
}

def runProfile(path: String): (Long, Long, Double) = {
  val media = spark.read.parquet(path)
    .select(col("media_id"), col("media")).as[(Long, Array[Byte])]
  val t0 = System.nanoTime()
  // q77b's exact shape: mapPartitions real decode, 8 bytes/asset leave the
  // scan, ids+fp-only pigeonhole join, payload never shuffles
  val fp = media.mapPartitions { rows =>
    rows.map { case (id, b) =>
      (id, Multimodal.dhash64(Multimodal.gridFromImage(b))) }
  }.toDF("id", "fp")
  val out = Multimodal.neardupProfile(fp).localCheckpoint()
  val cnt = out.count()
  val withNbr = out.filter(col("n_neighbors") > 0).count()
  (cnt, withNbr, (System.nanoTime() - t0) / 1e9)
}

for ((n, path) <- Seq(2000 -> "target/media2k", 20000 -> "target/media20k")) {
  val enc = makeMedia(n, path)
  println(f"[media] encoded $n PNGs (${W}x$H) in $enc%.1f s -> $path")
}
val res = collection.mutable.Map[String, (Long, Long, Double)]()
for (pass <- 1 to 2; (name, path) <- Seq("2k" -> "target/media2k", "20k" -> "target/media20k")) {
  val (cnt, nbr, dt) = runProfile(path)
  val prev = res.getOrElse(name, (cnt, nbr, Double.MaxValue))
  res(name) = (cnt, nbr, math.min(prev._3, dt))
  println(f"[media] pass$pass $name profile rows=$cnt with-neighbors=$nbr wall=$dt%.1f s")
}
val a = res("2k"); val b = res("20k")
println(f"[media] RESULT real-decode profile 2k ${a._3}%.1f s -> 20k ${b._3}%.1f s (x${b._3 / a._3}%.1f at x10 assets; rows ${a._1} -> ${b._1}, neighbor-flagged ${a._2} -> ${b._2})")
