package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector math over `array<double>` embeddings. The zip_with +
  * aggregate formulation is algebraically identical but pays interpreted
  * lambda dispatch per element — these run the fold as a tight primitive
  * loop (same sequential order, so results are bit-identical to the HOF
  * form and the DuckDB oracle).
  */
object vecexprs {

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** All `tables * planes` sign-buckets of a vector in one evaluation:
    * bucket t = tableId-prefixed bits of sign(v · r_{t,j}), r components
    * ±1 from Murmur3-style mixing of (dim, plane) — identical semantics to
    * Similarity.hyperplaneBucket, one pass, no re-evaluation per table.
    */
  def hyperplaneBuckets(v: Column, planes: Int, tables: Int): Column =
    ColumnBridge.column(
      HyperplaneBucketsExpr(ColumnBridge.expression(v), planes, tables))

  /** Ids of the `k` squared-euclidean-nearest centroids (ties by centroid
    * id), for IVF cell assignment. Centroids are model state (KB-scale),
    * baked into the expression and shipped once per task inside the
    * generated code's references — NOT a per-row Scala UDF, so the
    * corpus-wide assignment pass of q85/q39 stays inside whole-stage
    * codegen with zero per-row serialization.
    */
  def nearestCells(v: Column, centroids: Array[Array[Double]], k: Int): Column =
    ColumnBridge.column(
      NearestCellsExpr(ColumnBridge.expression(v),
        centroids.map(_.toVector).toVector, k))

  /** Plain inner product Σ aᵢ·bᵢ (left-to-right fold, bit-compatible with
    * DuckDB's `list_inner_product`) — the PQ-ADC lookup-table builder
    * (Similarity.pqAdcTopK) runs this on the bounded probe side only.
    */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"cosine_sim needs array<double>, got $l, $r")
    }

  // length mismatch -> null, mirroring the HOF form (zip_with pads with
  // null, which poisons the fold) so ReplaceCosineHof is semantics-preserving
  override def nullSafeEval(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[ArrayData]; val r = b.asInstanceOf[ArrayData]
    if (l.numElements() != r.numElements()) null
    else CosineSimExpr.compute(l, r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.expressions.CosineSimExpr.compute($a, $b);
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Same fold order as dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))) with
    * sequential left-to-right sums — bit-compatible with the HOF version.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Plain inner product of two `array<double>` columns (no normalization).
  * Same shape/contracts as [[CosineSimExpr]]: null on length mismatch, a
  * tight primitive loop with sequential left-to-right accumulation so the
  * result is bit-identical to DuckDB's `list_inner_product` on the same
  * doubles.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"dot_product needs array<double>, got $l, $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[ArrayData]; val r = b.asInstanceOf[ArrayData]
    if (l.numElements() != r.numElements()) null
    else DotProductExpr.compute(l, r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.expressions.DotProductExpr.compute($a, $b);
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }
}

case class HyperplaneBucketsExpr(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets needs array<double>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    HyperplaneBucketsExpr.compute(input.asInstanceOf[ArrayData], planes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.HyperplaneBucketsExpr
         |  .compute($c, $planes, $tables);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}

/** `k` nearest centroid ids for an `array<double>` vector. Centroids live
  * in the case class as immutable `Vector`s (structural equality, so plan
  * canonicalization works) and are flattened once per task into a primitive
  * `double[]` referenced from generated code. Distance loop truncates to
  * the shorter of (centroid dim, vector dim) — identical to the Scala UDF
  * form this replaced, so assignments are bit-for-bit unchanged.
  */
case class NearestCellsExpr(child: Expression,
    centroids: Vector[Vector[Double]], k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nearest_cells needs array<double>, got $t")
    }

  // rows share one flat copy per task; centroid rows may be ragged in
  // principle, so each keeps its own length
  @transient private lazy val flat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    NearestCellsExpr.compute(input.asInstanceOf[ArrayData], flat, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", flat, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.NearestCellsExpr
         |  .compute($c, $cRef, $k);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

object NearestCellsExpr {
  /** Top-k by (squared distance, centroid id) ascending — the same order a
    * stable sort by distance over id-ordered input yields. K is the cell
    * count (tiny: 16 on the fixture, ~√N capped in the thousands at scale),
    * so an O(K·k) selection beats building and sorting a pair array per row.
    */
  def compute(v: ArrayData, centroids: Array[Array[Double]], k: Int): ArrayData = {
    val n = centroids.length
    val d = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = centroids(i)
      val m = math.min(c.length, v.numElements())
      var acc = 0.0
      var j = 0
      while (j < m) { val x = c(j) - v.getDouble(j); acc += x * x; j += 1 }
      d(i) = acc
      i += 1
    }
    val kk = math.min(k, n)
    val out = new Array[Int](kk)
    val taken = new Array[Boolean](n)
    var s = 0
    while (s < kk) {
      var best = -1
      var bestD = Double.PositiveInfinity
      i = 0
      while (i < n) {
        if (!taken(i) && d(i) < bestD) { best = i; bestD = d(i) }
        i += 1
      }
      // degenerate vectors (a NaN element, or magnitudes that overflow the
      // squared distance to +Infinity) leave every remaining d(i)
      // incomparable under `<` — fall back to the lowest untaken centroid id
      // so such rows get a deterministic assignment instead of a task crash
      if (best == -1) {
        i = 0
        while (best == -1) { if (!taken(i)) best = i else i += 1 }
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

object HyperplaneBucketsExpr {
  import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{IntegerType => IT}

  /** ±1 component for (dim d, plane p): parity of Murmur3(d, p) — must stay
    * identical to `pmod(hash(d, p), 2) === 0` in the declarative form.
    */
  private def sign(d: Int, p: Int): Double = {
    // hash(d, p) folds children left-to-right from seed 42
    val h = Murmur3HashFunction.hash(p, IT,
      Murmur3HashFunction.hash(d, IT, 42L))
    val m = (h % 2 + 2) % 2
    if (m == 0) 1.0 else -1.0
  }

  def compute(v: ArrayData, planes: Int, tables: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = t.toLong << planes
      var j = 0
      while (j < planes) {
        val plane = t * planes + j
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += v.getDouble(d) * sign(d, plane); d += 1 }
        acc = acc * 2 + (if (dot >= 0) 1L else 0L)
        j += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }
}
