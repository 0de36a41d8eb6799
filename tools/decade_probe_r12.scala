import graft.operators.Similarity
val dirs = Seq("sf1(20k)" -> "/root/repo/target/sf1", "sf10(200k)" -> "/root/repo/target/sf10emb")
val qs = Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
  "q98" -> Similarity.q98, "q98b" -> Similarity.q98b,
  "q99b" -> Similarity.q99b, "q101" -> Similarity.q101, "q101b" -> Similarity.q101b)
qs.foreach { case (_, f) => f(spark, "/root/testdata/sf0.001").count() } // warm
val res = collection.mutable.Map[(String, String), Double]()
for (pass <- 1 to 2; (sfName, dir) <- dirs; (qName, f) <- qs) {
  val t0 = System.nanoTime()
  f(spark, dir).count()
  val dt = (System.nanoTime() - t0) / 1e9
  res((qName, sfName)) = math.min(res.getOrElse((qName, sfName), Double.MaxValue), dt)
  println(f"[decade] pass$pass $sfName $qName $dt%.2f s")
}
// recall of the composed stack at the big decade: q101 vs exact q20
def pairs(df: org.apache.spark.sql.DataFrame) =
  df.select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
val ex = pairs(Similarity.q20(spark, "/root/repo/target/sf10emb"))
val iv = pairs(Similarity.q101(spark, "/root/repo/target/sf10emb"))
println(f"[decade] q101 recall at 200k: ${(ex & iv).size.toDouble / ex.size}%.3f")
for ((q, _) <- qs) {
  val a = res((q, "sf1(20k)")); val b = res((q, "sf10(200k)"))
  println(f"[decade] RESULT $q 20k ${a}%.2f s -> 200k ${b}%.2f s (x${b / a}%.1f at x10 data)")
}
