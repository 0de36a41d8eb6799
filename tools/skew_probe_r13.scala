// Dup-heavy rows for the r13 streaming additions: q106 (cell monitor) and
// q107 (near-dup index serve) on sf1 vs sf1skew. q107's state SHRINKS on
// dup-heavy data (copies collide onto the same band keys) while its serve
// join emits more hits; q106's state is O(cells) regardless. Both walls
// must stay bounded (the x<~1.3 dup-heavy convention of SCALE.md).
// Usage: spark-shell confs as in tools/q106_probe.scala.
val dirs = Seq("sf1" -> "/root/repo/target/sf1", "sf1skew" -> "/root/repo/target/sf1skew")
val qs = Seq("q106_stream_cell_monitor", "q107_stream_neardup_serve")
qs.foreach { q => graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count() } // warm
val res = collection.mutable.Map[(String, String), Double]()
val state = collection.mutable.Map[(String, String), Long]()
for (pass <- 1 to 2; (sfName, dir) <- dirs; q <- qs) {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(q)(spark, dir).count()
  val dt = (System.nanoTime() - t0) / 1e9
  res((q, sfName)) = math.min(res.getOrElse((q, sfName), Double.MaxValue), dt)
  state((q, sfName)) = graft.streaming.StreamReplay.lastStateOps.map(_._2).sum
  println(f"[skew-r13] pass$pass $sfName $q $dt%.2f s state=${state((q, sfName))}")
}
for (q <- qs) {
  val a = res((q, "sf1")); val b = res((q, "sf1skew"))
  println(f"[skew-r13] RESULT $q sf1 $a%.2f s (state ${state((q, "sf1"))}) ; " +
    f"sf1skew $b%.2f s (state ${state((q, "sf1skew"))}) (x${b / a}%.2f)")
}
sys.exit(0)
