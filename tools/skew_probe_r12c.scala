import graft.operators.{Pipeline, Similarity}
val dirs = Seq("sf1" -> "/root/repo/target/sf1", "sf1skew" -> "/root/repo/target/sf1skew")
val qs = Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
  "q100" -> Pipeline.q100, "q101" -> Similarity.q101, "q101b" -> Similarity.q101b)
qs.foreach { case (_, f) => f(spark, "/root/testdata/sf0.001").count() } // warm
val res = collection.mutable.Map[(String, String), Double]()
for (pass <- 1 to 2; (sfName, dir) <- dirs; (qName, f) <- qs) {
  val t0 = System.nanoTime()
  f(spark, dir).count()
  val dt = (System.nanoTime() - t0) / 1e9
  res((qName, sfName)) = math.min(res.getOrElse((qName, sfName), Double.MaxValue), dt)
  println(f"[skew-new] pass$pass $sfName $qName $dt%.2f s")
}
for ((q, _) <- qs) {
  val a = res((q, "sf1")); val b = res((q, "sf1skew"))
  println(f"[skew-new] RESULT $q sf1 $a%.2f s ; sf1skew $b%.2f s (x${b / a}%.2f)")
}
