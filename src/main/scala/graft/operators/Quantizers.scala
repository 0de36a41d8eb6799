package graft.operators

import graft.functions.expressions.vecexprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A fitted coarse quantizer for the IVF family (q39/q85/q92b): maps an
  * `array<double>` vector column to integer cell ids. Two implementations
  * share one contract so every IVF consumer scales past the flat plan-size
  * ceiling without touching its join/rank logic:
  *
  *   - [[FlatQuantizer]] — one codebook baked into [[vecexprs.nearestCells]]
  *     as a plan literal. Fastest per row, but the literal caps at
  *     [[Quantizers.FlatCellCap]] cells (~2 MB of centroids at 64 dims).
  *   - [[ImiQuantizer]] — the inverted multi-index (Babenko & Lempitsky,
  *     CVPR'12): the vector splits into two halves, each half gets its own
  *     ≤ FlatCellCap codebook, and a cell is the PAIR (a, b) of per-half
  *     nearest codewords, encoded as a*k2+b. Addressable cells grow as
  *     k1×k2 (up to FlatCellCap² ≈ 16.8M) while the plan carries only
  *     k1+k2 half-width centroids — both levels stay under the 2 MB
  *     plan-literal bound, and assignment + probe fan-out are ONE
  *     codegen'd multi-sequence expression with zero per-row lambdas
  *     ([[vecexprs.imiProbeCells]]).
  *
  * Every consumer keeps the same downstream shape: corpus rows get ONE (or
  * [[Similarity.SemProbeCells]] soft) cell(s), probes fan out to ~n cells,
  * and candidates are cell-mates only.
  */
sealed trait CellQuantizer {
  /** Total addressable cells. */
  def nCells: Int

  /** The single nearest cell id — the corpus-side assignment column. Must
    * stay native/codegen'd: this is the one pass touching every vector.
    */
  def assign(v: Column): Column

  /** The min(n, nCells) nearest cells, nearest-first — the probe-side
    * fan-out column (`array<int>`). Both implementations honor exact
    * nearest-order (flat: one codebook ranking; IMI: the multi-sequence
    * joint-distance walk), and element 1 is always [[assign]]'s cell.
    */
  def probeCells(v: Column, n: Int): Column

  /** How many times the flat tier's co-scaled fan-out this quantizer needs
    * for equal coverage. Flat: 1 by definition. IMI: 2 — its centroids are
    * a GRID of per-half marginals, not free joint KMeans centers, so the
    * same probed-cell count covers the manifold less adaptively; measured
    * at the 200k decade (tools/imi_fanout_probe), hard-negative recall
    * through a 462-cell IMI steps 0.0 → 1.0 between 1× and 2× the ⌈√k⌉
    * fan-out where flat hits 1.0 at exactly 1×. Consumers multiply
    * [[Similarity.ivfProbesFor]] by this (capped at nCells).
    */
  def probeWidthFactor: Int = 1
}

/** One plan-literal codebook (the pre-round-12 behavior, unchanged). */
final case class FlatQuantizer(centroids: Array[Array[Double]])
    extends CellQuantizer {
  override def nCells: Int = centroids.length
  override def assign(v: Column): Column =
    element_at(vecexprs.nearestCells(v, centroids, 1), 1)
  override def probeCells(v: Column, n: Int): Column =
    vecexprs.nearestCells(v, centroids, n)
}

/** Two half-space codebooks; cell = nearestA(v[0:split)) * k2 +
  * nearestB(v[split:dim)). Assignment AND probe fan-out both come from
  * [[vecexprs.imiProbeCells]] — the multi-sequence expression that walks
  * the product grid in exact joint-distance order, so `probeCells(v, n)`
  * really IS the n nearest product cells (the flat tier's contract).
  *
  * Round-13 note: the previous formulation probed a per-half
  * top-pa × top-pb RECTANGLE, which is not joint order — a cell whose
  * A-half ranks just past pa was unreachable however close its B-half,
  * and the 200k-decade probe measured the hole (hard-negative recall
  * 0.000 through the rectangle vs 1.000 through flat at the same fan-out
  * budget; retrieval recall was unaffected because top-cosine neighbors
  * rank #1 in both halves). Joint order closes it with the same two
  * half-space distance sweeps per row. The joint top-1 is (argmin A,
  * argmin B), so assignments are bit-identical to the old form's.
  */
final case class ImiQuantizer(cbA: Array[Array[Double]],
    cbB: Array[Array[Double]]) extends CellQuantizer {
  override def nCells: Int = cbA.length * cbB.length
  override def assign(v: Column): Column =
    element_at(vecexprs.imiProbeCells(v, cbA, cbB, 1), 1)
  override def probeCells(v: Column, n: Int): Column =
    vecexprs.imiProbeCells(v, cbA, cbB, n)
  override def probeWidthFactor: Int = 2 // measured — see the trait doc
}

/** Quantizer fitting: bounded hash-keyed samples + ML KMeans, flat up to
  * [[FlatCellCap]] cells, IMI beyond. All fit inputs are (vec_id, v:
  * array<double>) frames with no nulls/zero-norms (callers guard).
  */
object Quantizers {

  /** Max cells a single plan-literal codebook may hold: 4096 × 64 dims ×
    * 8 B ≈ 2 MB of expression-tree literal, the practical ceiling before
    * plan size and task-binary broadcast start to hurt. Past it,
    * [[quantizerFor]] switches to the IMI product of two half-width
    * codebooks — ceiling lifted to FlatCellCap² ≈ 16.8M cells, enough for
    * √n sizing beyond 10^14 vectors.
    */
  val FlatCellCap = 4096

  /** Quantizer-fit sample floor: 4096 rows (256 per cell at the fixture's
    * 16 cells) — a coarse quantizer only needs roughly-balanced cells,
    * which a bounded sample estimates as well as the full corpus; at
    * 100 TB a full-corpus fit would pay 5 extra complete passes for
    * nothing. Grows as 16·k past k = 256 so a large-k fit is never
    * center-starved.
    */
  val FitSampleFloor = 4096

  /** The fit quantizer for a target cell count: flat codebook while the
    * plan literal can hold it, IMI product past it.
    */
  def quantizerFor(clean: DataFrame, kTotal: Int): CellQuantizer =
    if (kTotal <= FlatCellCap) FlatQuantizer(fitCentroids(clean, kTotal))
    else {
      val (a, b) = fitImiCodebooks(clean, kTotal)
      ImiQuantizer(a, b)
    }

  /** Fit one flat codebook on a bounded hash-keyed sample. The key is
    * xxhash64(v, vec_id) — a PER-ROW hash, so the lowest-key rows are a
    * uniform deterministic sample of the corpus: an exact-duplicate clique
    * of D rows gets its density-proportional ~D/N share of the sample,
    * never a contiguous low-hash block (a content-only key made identical
    * vectors share one key and sort adjacent, so one lucky clique could
    * flood the sample). Full dedup-by-content is deliberately NOT used: it
    * inflates every rare vector to equal weight, and the q93 planted-stray
    * spec measures the consequence — a deduped sample hands the stray its
    * own centroid, its within-cluster z collapses to 0, and the stray goes
    * unflagged. Density-proportional is what a coarse quantizer wants
    * anyway: heavy regions get more centroids, which shrinks Σ|cell|²
    * where pair mass concentrates. Lowest keys win (TakeOrdered with a
    * vec_id tiebreak — a total order, insensitive to file order), and k
    * clamps to the sample size so a tiny corpus never asks KMeans for more
    * centers than it has points.
    */
  def fitCentroids(clean: DataFrame, k: Int): Array[Array[Double]] = {
    import org.apache.spark.ml.functions.array_to_vector
    val sample = fitSample(clean, k)
      .withColumn("fv", array_to_vector(col("v")))
      .localCheckpoint()
    kmeansCenters(sample, math.min(k, sample.count().toInt))
  }

  /** Fit the two IMI half-space codebooks: k1 ~ √kTotal codewords on the
    * first ⌊dim/2⌋ dims, k2 = ⌈kTotal/k1⌉ on the rest, both capped at
    * [[FlatCellCap]] (so kTotal caps at FlatCellCap²). One shared sample
    * (sized for the larger side), two KMeans fits on its halves.
    */
  def fitImiCodebooks(clean: DataFrame,
      kTotal: Int): (Array[Array[Double]], Array[Array[Double]]) = {
    import org.apache.spark.ml.functions.array_to_vector
    val k1 = math.min(FlatCellCap,
      math.max(1, math.ceil(math.sqrt(kTotal.toDouble)).toInt))
    val k2 = math.min(FlatCellCap,
      math.max(1, math.ceil(kTotal.toDouble / k1).toInt))
    val half = floor(size(col("v")) / 2).cast("int")
    val sample = fitSample(clean, math.max(k1, k2))
      .select(
        array_to_vector(slice(col("v"), lit(1), half)).as("fva"),
        array_to_vector(slice(col("v"), half + 1, size(col("v")))).as("fvb"))
      .localCheckpoint()
    val n = sample.count().toInt
    require(n > 0, "IMI quantizer cannot fit an empty corpus")
    require(sample.select(col("fva")).head()
      .getAs[org.apache.spark.ml.linalg.Vector](0).size >= 1,
      "IMI quantizer needs dim >= 2 (first half-space is empty)")
    val cbA = kmeansCenters(sample.select(col("fva").as("fv")),
      math.min(k1, n))
    val cbB = kmeansCenters(sample.select(col("fvb").as("fv")),
      math.min(k2, n))
    (cbA, cbB)
  }

  /** Fit the M per-subspace product-quantization codebooks (k codewords
    * each) for [[Similarity.pqAdcTopK]]: ONE shared bounded sample (the
    * same per-row-hash-keyed discipline as every other fit here), then M
    * independent KMeans fits over its disjoint dimension slices. Subspace
    * bounds follow the integer rule lo_m = ⌊dim·m/M⌋ — the same arithmetic
    * the encode pass and the DuckDB mirror use, so all three agree on
    * ragged dims. Codebook state is M·k·(dim/M) = k·dim doubles — the SAME
    * plan footprint as one k-centroid flat codebook, far under the 2 MB
    * plan-literal bound.
    */
  def pqFitCodebooks(clean: DataFrame, m: Int,
      k: Int): Array[Array[Array[Double]]] = {
    import org.apache.spark.ml.functions.array_to_vector
    import scala.collection.parallel.CollectionConverters._
    val sample = fitSample(clean, k).localCheckpoint()
    val n = sample.count().toInt
    require(n > 0, "PQ quantizer cannot fit an empty corpus")
    val dim = sample.select(col("v")).head().getSeq[Double](0).length
    require(dim >= m, s"PQ needs dim >= $m subspaces, got $dim")
    // the M fits are independent jobs over the one materialized sample —
    // submit them concurrently (driver threads; local[32] has the slack,
    // and on a cluster the scheduler interleaves their tiny stages).
    // Sequential fits made the fit wall M× one fit and dominated q98.
    // .par preserves index order, and each fit is seed-42 deterministic,
    // so the codebooks are bit-identical to the sequential form's.
    (0 until m).toArray.par.map { i =>
      val lo = dim * i / m
      val hi = dim * (i + 1) / m
      kmeansCenters(
        sample.select(array_to_vector(
          slice(col("v"), lit(lo + 1), lit(hi - lo))).as("fv")),
        math.min(k, n))
    }.toArray
  }

  /** The bounded deterministic fit sample (see [[fitCentroids]] for why the
    * key is per-row and the order total); ≥ 16 points per requested center
    * so the fit is never center-starved.
    */
  private def fitSample(clean: DataFrame, k: Int): DataFrame =
    clean
      .select(col("vec_id"), col("v"),
        xxhash64(col("v"), col("vec_id")).as("hk"))
      .orderBy(col("hk"), col("vec_id"))
      .limit(math.max(FitSampleFloor, 16 * k))

  /** One ML KMeans fit over a materialized sample carrying `fv`. Random
    * init + few iterations: k-means|| costs several extra distributed
    * passes and a coarse quantizer only needs roughly-balanced cells, not
    * converged-optimal ones (recall bounds asserted in SimilaritySpec).
    */
  private def kmeansCenters(sample: DataFrame, k: Int): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    new KMeans()
      .setK(math.max(1, k)).setSeed(42).setMaxIter(5).setInitMode("random")
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(sample).clusterCenters.map(_.toArray)
  }
}
