// CC edge-contraction probe (round-9 verdict mandate #4) on target/sf1skew's
// q48 pair graph — the worst case on record: the 2,000-vector clique's
// ~C(2000,2) pairs all settle in round 1, so any contraction scheme erases
// ~all edge mass for rounds 2+; the 63-node path (diameter 62) keeps the
// round COUNT owned by pointer jumping.
//
// TWO candidate schemes, measured against the production baseline:
//  (a) dropSettled — the verdict's literal proposal: keep the edge frame,
//      drop edges whose endpoints already share a label. UNSOUND: a
//      triangle u-v-L settles to L in round 1 and loses all three edges;
//      when a later edge improves u's label, v and L never hear of it —
//      L has no incident edge left, lab(L) never improves, and the
//      pointer jump dead-ends at the stale L. Run once for the record
//      (label drift + time), never timed as a contender.
//  (b) contractRewrite — true contraction: rewrite each surviving edge to
//      its endpoints' LABELS (s,d) -> (lab(s),lab(d)), drop self-loops,
//      dedupe. Sound — the label graph preserves component connectivity
//      (the min keeps flowing between label nodes, members follow via the
//      pointer jump) — so identical final labels are ASSERTED, and it is
//      timed interleaved best-of-3 against the baseline.
// Adopt (b) only if it wins >= 20%; the verdict line is computed from the
// actual measurements. The whole body is ONE braced block so the REPL's
// -I reader can never split a statement chain.
// Usage: /opt/spark/bin/spark-shell --driver-memory 48g \
//   --driver-class-path target/scala-2.13/classes \
//   --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.ansi.enabled=false \
//   -I tools/cc_contract_probe.scala < /dev/null
val probeReport: String = {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  val dir = "/root/repo/target/sf1skew"
  // pair generation is shared input, not the thing under test: materialize
  val pairs = graft.operators.Similarity.q48(spark, dir)
    .select(col("a_id"), col("b_id")).localCheckpoint()
  val ids = graft.Tables.embeddings(spark, dir).select(col("vec_id").as("v"))
    .localCheckpoint()
  val nPairs = pairs.count()
  val nIds = ids.count()

  def labSum(df: DataFrame): Long =
    df.agg(coalesce(sum(col("lab")), lit(0L))).head().getLong(0)

  def directed(p: DataFrame): DataFrame = p
    .select(col("a_id").as("s"), col("b_id").as("d"))
    .union(p.select(col("b_id").as("s"), col("a_id").as("d")))

  // shared loop: per-round label update (neighbor-min + pointer jump),
  // parameterized by how the edge frame evolves between rounds
  def ccLoop(contract: (DataFrame, DataFrame) => DataFrame,
      maxRounds: Int = 25): (DataFrame, Int, Seq[Long]) = {
    var edges = directed(pairs).localCheckpoint()
    val edgeSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val active = edges.select(col("s").as("v")).distinct()
    var labels = active.select(col("v"), col("v").as("lab")).localCheckpoint()
    var cur = labSum(labels)
    var done = false
    var round = 0
    while (!done && round < maxRounds) {
      edgeSizes += edges.count()
      val neigh = edges.join(labels, edges("s") === labels("v"))
        .select(col("d").as("v"), col("lab"))
      val jump = labels.select(col("v"), col("lab").as("ptr"))
        .join(labels.select(col("v").as("ptr2"), col("lab")),
          col("ptr") === col("ptr2"))
        .select(col("v"), col("lab"))
      val next = labels.union(neigh).union(jump)
        .groupBy(col("v")).agg(min(col("lab")).as("lab"))
        .localCheckpoint()
      edges = contract(edges, next)
      val nextSum = labSum(next)
      done = nextSum == cur
      cur = nextSum
      labels = next
      round += 1
    }
    require(done, s"CC variant did not converge in $maxRounds rounds")
    val out = ids.join(labels, Seq("v"), "left")
      .select(col("v"), coalesce(col("lab"), col("v")).as("lab"))
    (out, round, edgeSizes.toSeq)
  }

  // (a) the verdict's literal proposal: drop settled edges, keep the rest
  def dropSettled(edges: DataFrame, next: DataFrame): DataFrame = edges
    .join(next.select(col("v").as("s"), col("lab").as("ls")), Seq("s"))
    .join(next.select(col("v").as("d"), col("lab").as("ld")), Seq("d"))
    .filter(col("ls") =!= col("ld"))
    .select(col("s"), col("d")).localCheckpoint()

  // (b) true contraction: surviving edges move to the label graph
  def contractRewrite(edges: DataFrame, next: DataFrame): DataFrame = edges
    .join(next.select(col("v").as("s"), col("lab").as("ls")), Seq("s"))
    .join(next.select(col("v").as("d"), col("lab").as("ld")), Seq("d"))
    .filter(col("ls") =!= col("ld"))
    .select(col("ls").as("s"), col("ld").as("d")).distinct()
    .localCheckpoint()

  def noop(edges: DataFrame, next: DataFrame): DataFrame = edges

  // interleaved best-of-3: baseline (production code) vs contractRewrite
  var baseBest = Double.MaxValue
  var rewriteBest = Double.MaxValue
  var baseRounds = -1
  var rewriteRounds = -1
  var rewriteTrace: Seq[Long] = Nil
  for (pass <- 1 to 3) {
    val t0 = System.nanoTime()
    graft.operators.Dedup.connectedComponents(ids, pairs)
      .write.mode("overwrite").format("noop").save()
    baseBest = math.min(baseBest, (System.nanoTime() - t0) / 1e9)
    baseRounds = graft.operators.Dedup.lastCcRounds
    val t1 = System.nanoTime()
    val (c, r, tr) = ccLoop(contractRewrite)
    c.write.mode("overwrite").format("noop").save()
    rewriteBest = math.min(rewriteBest, (System.nanoTime() - t1) / 1e9)
    rewriteRounds = r
    rewriteTrace = tr
  }

  // correctness: rewrite must match the production labels EXACTLY
  val base = graft.operators.Dedup.connectedComponents(ids, pairs)
  val (rw, _, _) = ccLoop(contractRewrite)
  val rwDrift = base.except(rw).count() + rw.except(base).count()
  assert(rwDrift == 0, s"contractRewrite label drift: $rwDrift rows")
  // planted-structure check, stated as what the plant GUARANTEES on a
  // 0.35-threshold graph: clique members (vec_id % 10 == 9, pairwise
  // cosine ~1) must share ONE label, and the 63 path rows (consecutive
  // cosine 0.5) must share one label. Component ISOLATION is not
  // guaranteed here — the round-11 regenerated base embeddings connect at
  // 0.35, so the background (and the plants with it) resolves into one
  // giant component; isolation holds only at q85's 0.95 bar (see
  // pairmass_probe_q85).
  val cliqueLabels = rw.filter(pmod(col("v"), lit(10)) === 9)
    .select(col("lab")).distinct().count()
  assert(cliqueLabels == 1, s"clique split across $cliqueLabels labels")
  // the path graph sits on the fixture's 63 HIGHEST vec_ids (make_skewed
  // rewrites the last 63 rows; ids are consecutive there but the id space
  // is sparse, so key off max, not row count)
  val maxId = ids.agg(max(col("v"))).head().getLong(0)
  val pathLabels = rw.filter(col("v") > maxId - 63)
    .select(col("lab")).distinct().count()
  assert(pathLabels == 1, s"path split across $pathLabels labels")
  val topComp = rw.groupBy(col("lab")).count()
    .orderBy(col("count").desc).limit(1).collect()(0).getLong(1)

  // (a) once, for the record: unsound by construction — measure the drift
  val t2 = System.nanoTime()
  val (ds, dsRounds, dsTrace) = ccLoop(dropSettled)
  val dsTime = (System.nanoTime() - t2) / 1e9
  val dsDrift = base.except(ds).count() + ds.except(base).count()

  val winPct = 100.0 * (baseBest - rewriteBest) / baseBest
  val verdict =
    if (winPct >= 20) "ADOPT contractRewrite (won >= 20%)"
    else "REJECT contraction (win < 20% on the clique-heavy worst case)"
  f"""pair graph: $nPairs pairs over $nIds vectors (top component: $topComp)
     |baseline (production):     $baseBest%6.2f s  rounds=$baseRounds
     |contractRewrite (sound):   $rewriteBest%6.2f s  rounds=$rewriteRounds  win=$winPct%.1f%%
     |  edge frame per round: ${rewriteTrace.mkString(", ")}
     |dropSettled (verdict's proposal, 1 pass): $dsTime%6.2f s  rounds=$dsRounds  LABEL DRIFT=$dsDrift rows (unsound)
     |  edge frame per round: ${dsTrace.mkString(", ")}
     |CC_CONTRACT_PROBE verdict: $verdict""".stripMargin
}
println(probeReport)
sys.exit(0)
