package graft

import graft.operators.{FlatQuantizer, ImiQuantizer, Quantizers, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-level (IMI) quantizer that lifts the flat plan-literal ceiling:
  * delegation equality below [[Quantizers.FlatCellCap]], a planted q85
  * clique resolved through a FORCED IMI codebook, a > FlatCellCap cell
  * count that actually plans and runs, and the codegen pins (no ScalaUDF,
  * no interpreted lambda) on both assignment passes.
  */
class QuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** ~60k deterministic 8-dim vectors with no Scala-side materialization:
    * component j of row id is a scaled xxhash64(id, j) — uniform enough for
    * KMeans to spread codewords, fully reproducible.
    */
  private def synthetic(n: Long) =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), j =>
        (pmod(xxhash64(col("id"), j), lit(1000L)).cast("double") - lit(500.0))
          / lit(250.0)).as("v"))

  test("quantizerFor delegates to the flat codebook at or below the plan cap") {
    import graft.functions.vectors
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vectors.toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
    val q = Quantizers.quantizerFor(emb, Similarity.IvfCells)
    assert(q.isInstanceOf[FlatQuantizer], "k <= cap must stay flat")
    // the delegated quantizer's columns ARE the pre-round-12 expressions:
    // same centroids (same fit), so same cells bit-for-bit
    val flat = q.asInstanceOf[FlatQuantizer]
    val direct = Quantizers.fitCentroids(emb, Similarity.IvfCells)
    assert(flat.centroids.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq,
      "fit drift between quantizerFor and fitCentroids")
    val both = emb.select(
      q.assign(col("v")).as("a"),
      element_at(graft.functions.expressions.vecexprs.nearestCells(
        col("v"), direct, 1), 1).as("b"),
      q.probeCells(col("v"), Similarity.IvfProbes).as("pa"),
      graft.functions.expressions.vecexprs.nearestCells(
        col("v"), direct, Similarity.IvfProbes).as("pb"))
      .collect()
    both.foreach { r =>
      assert(r.getInt(0) === r.getInt(1), "assign drift vs flat")
      assert(r.getSeq[Int](2) === r.getSeq[Int](3), "probe-cell drift vs flat")
    }
  }

  test("past the plan cap quantizerFor builds an IMI product whose codebooks both fit the literal bound") {
    val q = Quantizers.quantizerFor(synthetic(20000), Quantizers.FlatCellCap + 1)
    assert(q.isInstanceOf[ImiQuantizer], "k > cap must go two-level")
    val imi = q.asInstanceOf[ImiQuantizer]
    assert(imi.cbA.length <= Quantizers.FlatCellCap)
    assert(imi.cbB.length <= Quantizers.FlatCellCap)
    assert(q.nCells >= Quantizers.FlatCellCap + 1)
  }

  test("an IMI quantizer with > 4096 cells plans, runs, and realizes more cells than the flat ceiling") {
    val df = synthetic(60000).localCheckpoint()
    val (cbA, cbB) = Quantizers.fitImiCodebooks(df, 5000)
    val q = ImiQuantizer(cbA, cbB)
    assert(q.nCells === 5041, s"71x71 expected, got ${q.nCells}") // ceil(sqrt(5000))^2
    val stats = df.select(q.assign(col("v")).as("cell"))
      .agg(countDistinct(col("cell")).as("nd"),
        min(col("cell")).as("lo"), max(col("cell")).as("hi"))
      .head()
    assert(stats.getLong(0) > Quantizers.FlatCellCap,
      s"only ${stats.getLong(0)} distinct cells realized — not past the flat ceiling")
    assert(stats.getInt(1) >= 0 && stats.getInt(2) < q.nCells, "cell id out of range")
    // the probe rectangle always contains the assignment cell and holds
    // exactly pa*pb distinct cells
    df.limit(200)
      .select(q.assign(col("v")).as("c"), q.probeCells(col("v"), 4).as("pc"))
      .collect()
      .foreach { r =>
        val pc = r.getSeq[Int](1)
        assert(pc.length === 4 && pc.distinct.length === 4, s"probe cells $pc")
        assert(pc.contains(r.getInt(0)), "probe rectangle must contain the assigned cell")
      }
  }

  /** Round-13: the IMI probe order is EXACT joint-distance order (the
    * multi-sequence walk), not the per-half rectangle it replaced — the
    * 200k probe measured the rectangle missing every moderate-cosine
    * hard negative (recall 0.000 vs flat's 1.000) because a cell whose
    * A-half ranked just past pa was unreachable however close its B-half.
    * Hand-computed grids below include exactly such a case.
    */
  test("IMI probe cells follow exact joint-distance order, not a per-half rectangle") {
    import spark.implicits._
    val cbA = Array(Array(0.0), Array(1.0), Array(2.0), Array(50.0))
    val cbB = Array(Array(0.0), Array(50.0))
    val q = ImiQuantizer(cbA, cbB)
    // v = [0,0]: dA = [0,1,4,2500], dB = [0,2500] — the 3 jointly-nearest
    // cells are (a0,b0),(a1,b0),(a2,b0) = 0,2,4: reaching A-rank 3 with
    // B-rank 1, which a 2x2 rectangle (the round-12 shape at n=3) cannot
    val got = Seq((1L, Seq(0.0, 0.0))).toDF("vec_id", "v")
      .select(q.probeCells(col("v"), 3).as("pc"), q.assign(col("v")).as("c"))
      .head()
    assert(got.getSeq[Int](0) === Seq(0, 2, 4), "not joint-distance order")
    assert(got.getInt(1) === 0, "assign must equal the joint top-1")
    // v = [1.4, 20]: dA = [1.96, .16, .36, 2362], dB = [400, 900] —
    // full 6-cell enumeration interleaves the halves by summed distance
    val pc2 = Seq((2L, Seq(1.4, 20.0))).toDF("vec_id", "v")
      .select(q.probeCells(col("v"), 6).as("pc")).head().getSeq[Int](0)
    assert(pc2 === Seq(2, 4, 0, 3, 5, 1), s"got $pc2")
  }

  test("IMI assignment and probe fan-out stay codegen-native: no ScalaUDF, no interpreted lambda") {
    val df = synthetic(1000).localCheckpoint()
    val (cbA, cbB) = Quantizers.fitImiCodebooks(df, Quantizers.FlatCellCap + 1)
    val q = ImiQuantizer(cbA, cbB)
    for (c <- Seq(q.assign(col("v")), q.probeCells(col("v"), 4))) {
      val p = df.select(c.as("cell")).queryExecution.optimizedPlan.toString
      assert(!p.contains("UDF("), p.take(800))
      assert(!p.contains("lambdafunction"), p.take(800))
    }
  }

  /** The q85 planted clique (SimilaritySpec's fixture) resolved through a
    * FORCED two-level quantizer: same verdicts as the flat path — one
    * keeper (min id) for the clique, every background vector a kept
    * singleton. kTotal = 9 keeps the codebooks un-starved (3+3 codewords
    * from 35 points); the soft top-2 probe in subspace A covers the
    * boundary-straddle case exactly as flat soft assignment does.
    */
  /** PQ codebook fitting: M codebooks of ≤ k codewords whose widths follow
    * the shared ⌊dim·m/M⌋ integer rule on a RAGGED dim (10 dims over 4
    * subspaces → widths 2,3,2,3), each codeword inside the value range of
    * its own slice — a transposed slice (codebook m fit on the wrong dims)
    * fails the range check because the synthetic ranges differ per dim
    * block. Determinism: two fits over the same frame are bit-identical
    * (the .par fan-out must not introduce order dependence).
    */
  test("pqFitCodebooks: ragged-dim slice widths, per-slice value ranges, deterministic") {
    val n = 500L
    // dim 10: block b (dims 2b..2b+1...) — give each dim a distinct offset
    // so a codeword fit on the wrong dims lands outside the slice's range
    val base = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(9)), j =>
        (pmod(xxhash64(col("id"), j), lit(100L)).cast("double") / lit(100.0))
          + j.cast("double") * lit(10.0)).as("v"))
    val m = 4
    val cbs = Quantizers.pqFitCodebooks(base, m, 8)
    assert(cbs.length === m)
    val dim = 10
    val widths = (0 until m).map(i => dim * (i + 1) / m - dim * i / m)
    assert(cbs.map(_.head.length).toSeq === widths) // 2,3,2,3
    var off = 0
    for ((cb, i) <- cbs.zipWithIndex) {
      assert(cb.length <= 8 && cb.nonEmpty)
      for (cw <- cb; (x, j) <- cw.zipWithIndex) {
        val d = off + j
        assert(x >= d * 10.0 && x < d * 10.0 + 1.0,
          s"codebook $i codeword dim $j value $x outside its slice's range")
      }
      off += widths(i)
    }
    val again = Quantizers.pqFitCodebooks(base, m, 8)
    assert(cbs.map(_.map(_.toSeq).toSeq).toSeq ===
      again.map(_.map(_.toSeq).toSeq).toSeq, "fit not deterministic")
  }

  /** Reload equality (round-13 #1): a persisted model must reproduce the
    * fitted original EXACTLY — same centroid doubles, and therefore
    * bit-identical assignments / probe fan-outs / ADC rankings. This is
    * the train-once/serve-many contract: two corpus snapshots deduped
    * under one reloaded codebook have comparable verdicts, where per-job
    * refits would move the cell boundaries. The q39b/q98b oracles already
    * pin the downstream machinery; these tests pin the save/load seam.
    */
  test("ModelStore round-trips a fitted flat quantizer: centroids and assignments bit-identical") {
    import graft.functions.vectors
    val tmp = java.nio.file.Files.createTempDirectory("modelstore").toString
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vectors.toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
    val fitted = Quantizers.quantizerFor(emb, Similarity.IvfCells)
    graft.sources.ModelStore.saveQuantizer(spark, fitted, s"$tmp/coarse")
    val loaded = graft.sources.ModelStore.loadQuantizer(spark, s"$tmp/coarse")
    assert(loaded.isInstanceOf[FlatQuantizer])
    assert(loaded.asInstanceOf[FlatQuantizer].centroids.map(_.toSeq).toSeq ===
      fitted.asInstanceOf[FlatQuantizer].centroids.map(_.toSeq).toSeq,
      "centroids drifted through the store")
    val both = emb.select(fitted.assign(col("v")).as("a"),
      loaded.assign(col("v")).as("b"),
      fitted.probeCells(col("v"), Similarity.IvfProbes).as("pa"),
      loaded.probeCells(col("v"), Similarity.IvfProbes).as("pb")).collect()
    both.foreach { r =>
      assert(r.getInt(0) === r.getInt(1), "assignment drift after reload")
      assert(r.getSeq[Int](2) === r.getSeq[Int](3), "probe drift after reload")
    }
  }

  test("ModelStore round-trips an IMI quantizer: both codebooks and assignments bit-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("modelstore").toString
    val df = synthetic(1000).localCheckpoint()
    val (cbA, cbB) = Quantizers.fitImiCodebooks(df, Quantizers.FlatCellCap + 1)
    val fitted = ImiQuantizer(cbA, cbB)
    graft.sources.ModelStore.saveQuantizer(spark, fitted, s"$tmp/coarse")
    val loaded = graft.sources.ModelStore.loadQuantizer(spark, s"$tmp/coarse")
    assert(loaded.isInstanceOf[ImiQuantizer])
    val l = loaded.asInstanceOf[ImiQuantizer]
    assert(l.cbA.map(_.toSeq).toSeq === cbA.map(_.toSeq).toSeq, "cbA drift")
    assert(l.cbB.map(_.toSeq).toSeq === cbB.map(_.toSeq).toSeq, "cbB drift")
    assert(l.nCells === fitted.nCells)
    val both = df.select(fitted.assign(col("v")).as("a"),
      loaded.assign(col("v")).as("b")).collect()
    both.foreach(r => assert(r.getInt(0) === r.getInt(1),
      "IMI assignment drift after reload"))
  }

  test("ModelStore round-trips PQ codebooks: the loaded model's ADC ranking is bit-identical") {
    import graft.functions.vectors
    val tmp = java.nio.file.Files.createTempDirectory("modelstore").toString
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vectors.toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint()
    val cbs = Quantizers.pqFitCodebooks(
      emb, Similarity.PqSubspaces, Similarity.PqCodewords)
    graft.sources.ModelStore.savePqCodebooks(spark, cbs, s"$tmp/pq")
    val loaded = graft.sources.ModelStore.loadPqCodebooks(spark, s"$tmp/pq")
    assert(loaded.map(_.map(_.toSeq).toSeq).toSeq ===
      cbs.map(_.map(_.toSeq).toSeq).toSeq, "PQ codebooks drifted")
    val want = Similarity.pqAdcTopK(emb, cbs).collect().toSeq
    val got = Similarity.pqAdcTopK(emb, loaded).collect().toSeq
    assert(got === want, "ADC search results drifted under the loaded model")
  }

  /** The round-14 seam one level below the codebooks: the ENCODED corpus
    * (vec_id, cell, c0..cM-1) through ModelStore.saveIndex/loadIndex must
    * reproduce (a) the encoded rows exactly — codes are small exact ints,
    * so parquet is bit-lossless — and (b) the served search: ivfPqServe
    * off the LOADED index ≡ the one-shot ivfPqTopK that encodes inline.
    * This is what lets a deployment pay the fit+encode wall once (q121's
    * oracle hashes the same claim against DuckDB).
    */
  test("ModelStore round-trips an encoded IVF-PQ index: rows and served search bit-identical") {
    import graft.functions.vectors
    val tmp = java.nio.file.Files.createTempDirectory("modelstore-idx").toString
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vectors.toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint()
    val quant = Quantizers.quantizerFor(emb, Similarity.IvfCells)
    val cbs = Quantizers.pqFitCodebooks(
      emb, Similarity.PqSubspaces, Similarity.PqCodewords)
    val encoded = Similarity.ivfPqEncode(emb, quant, cbs).localCheckpoint()
    graft.sources.ModelStore.saveIndex(encoded, s"$tmp/index")
    val loaded = graft.sources.ModelStore.loadIndex(spark, s"$tmp/index")
    assert(loaded.columns.sorted.toSeq === encoded.columns.sorted.toSeq)
    val wantRows = encoded.orderBy(col("vec_id")).collect().toSeq
    val gotRows = loaded.select(encoded.columns.map(col).toIndexedSeq: _*)
      .orderBy(col("vec_id")).collect().toSeq
    assert(gotRows === wantRows, "encoded rows drifted through the store")
    val want = Similarity.ivfPqTopK(emb, quant, cbs).collect().toSeq
    val got = Similarity.ivfPqServe(loaded, emb, quant, cbs).collect().toSeq
    assert(got === want, "served search drifted off the loaded index")
  }

  test("semantic dedup through a forced IMI quantizer resolves the planted clique identically") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val bg = (0 until 30).map(i =>
      (100L + i, unit(Array.fill(dim)(rnd.nextGaussian()))))
    val cliqueBase = unit(Array.fill(dim)(rnd.nextGaussian()))
    val clique = (0 until 5).map { i =>
      val v = cliqueBase.clone(); v(i) += 0.001; (10L + i, unit(v))
    }
    val all = bg ++ clique
    val df = all.toDF("vec_id", "v")
    val (cbA, cbB) = Quantizers.fitImiCodebooks(df, 9)
    val got = Similarity.semanticDedupQuantized(
        df.select(col("vec_id")), df, Similarity.SemDedupCosine,
        ImiQuantizer(cbA, cbB))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got.length === all.size)
    (10L to 14L).foreach(id =>
      assert(byId(id) === ((10L, id == 10L)), s"clique member $id"))
    bg.foreach { case (id, _) =>
      assert(byId(id) === ((id, true)), s"background $id") }
  }

  /** The q122 retrain step for the STORAGE tier: each subspace codebook
    * refreshes through the one-pass pqRefresh core, per-subspace SSE over
    * the sliced vectors never increases (the Lloyd contract, subspace
    * form), and the refreshed codebooks survive the ModelStore seam
    * bit-identically — the monitor→refresh→persist loop now covers all
    * three model tiers (coarse q111, IMI halves, PQ here).
    */
  test("pqRefresh: per-subspace Lloyd non-increase and ModelStore round trip") {
    import graft.operators.Similarity
    val df = synthetic(3000).localCheckpoint()
    val m = 4
    val cbs = Quantizers.pqFitCodebooks(df, m, 8)
    val after = Similarity.refreshedPqCodebooks(Similarity.pqRefresh(df, cbs))
    assert(after.length === cbs.length)
    assert(after.zip(cbs).forall { case (a, b) =>
      a.length == b.length && a.head.length == b.head.length })
    val vecs = df.collect().map(_.getSeq[Double](1).toArray)
    val dim = vecs.head.length
    def sse(cb: Array[Array[Double]], i: Int): Double = {
      val lo = dim * i / m; val hi = dim * (i + 1) / m
      vecs.map { v =>
        val h = v.slice(lo, hi)
        cb.map(c => c.zip(h).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    }
    cbs.indices.foreach(i =>
      assert(sse(after(i), i) <= sse(cbs(i), i) + 1e-2,
        s"subspace $i SSE rose through the refresh"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-pqref").toString
    graft.sources.ModelStore.savePqCodebooks(spark, after, s"$tmp/pq")
    val loaded = graft.sources.ModelStore.loadPqCodebooks(spark, s"$tmp/pq")
    assert(loaded.map(_.map(_.toSeq).toSeq).toSeq ===
      after.map(_.map(_.toSeq).toSeq).toSeq,
      "refreshed PQ codebooks drifted through the store")
  }

  /** The q111 retrain step through an IMI quantizer: each half refreshes
    * via the shared codebookRefresh core, per-half SSE never increases
    * (the Lloyd contract, half-space form), and the refreshed model
    * survives the ModelStore seam bit-identically — so the
    * monitor→refresh→persist loop also covers the tier past the flat
    * plan-literal ceiling.
    */
  test("imiRefresh: per-half Lloyd non-increase and ModelStore round trip") {
    val df = synthetic(5000).localCheckpoint()
    val (cbA, cbB) = Quantizers.fitImiCodebooks(df, 260) // 17x17 grid
    val before = ImiQuantizer(cbA, cbB)
    val after = Similarity.imiRefresh(df, before)
    assert(after.cbA.length === cbA.length &&
      after.cbB.length === cbB.length)
    val vecs = df.collect().map(_.getSeq[Double](1).toArray)
    def sse(cb: Array[Array[Double]], lo: Int, hi: Int): Double =
      vecs.map { v =>
        val h = v.slice(lo, hi)
        cb.map(c => c.zip(h).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    val split = cbA.head.length
    assert(sse(after.cbA, 0, split) <= sse(cbA, 0, split) + 1e-2,
      "A-half SSE rose")
    assert(sse(after.cbB, split, split + cbB.head.length) <=
      sse(cbB, split, split + cbB.head.length) + 1e-2, "B-half SSE rose")
    val tmp = java.nio.file.Files.createTempDirectory("graft-imiref").toString
    graft.sources.ModelStore.saveQuantizer(spark, after, s"$tmp/coarse")
    val loaded = graft.sources.ModelStore.loadQuantizer(spark, s"$tmp/coarse")
      .asInstanceOf[ImiQuantizer]
    assert(loaded.cbA.zip(after.cbA).forall { case (a, b) => a.sameElements(b) })
    assert(loaded.cbB.zip(after.cbB).forall { case (a, b) => a.sameElements(b) })
    new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
  }
}
