package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native text expressions (with codegen) for the n-gram hot paths.
  *
  * The declarative word-ngram form (`transform(sequence(...), i ->
  * concat_ws(" ", slice(toks, i+1, n)))` over cleanTokens) pays interpreted
  * lambda dispatch per gram AND drags its whole projection out of
  * whole-stage codegen (ArrayTransform/ArrayFilter are CodegenFallback).
  * WordNgramsExpr produces the identical array in one pass over the
  * lowercased bytes — equality with the HOF form is asserted in
  * TextAnalysisSpec.
  */
object textnative {

  /** Space-joined word n-grams of the lowercased text's `[a-z0-9]+` tokens;
    * docs with fewer than n tokens yield an empty array — bit-identical to
    * graft.functions.text.wordNgrams.
    */
  def wordNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsExpr(ColumnBridge.expression(text), n))

  /** One BPE merge step (adjacent lhs,rhs → lhs+rhs, greedy left-to-right)
    * over a symbol-array column — see [[BpeMergeStepExpr]].
    */
  def bpeMergeStep(syms: Column, lhs: String, rhs: String): Column =
    ColumnBridge.column(
      BpeMergeStepExpr(ColumnBridge.expression(syms), lhs, rhs))
}

case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams needs string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    WordNgramsExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.WordNgramsExpr.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

object WordNgramsExpr {
  import org.apache.spark.unsafe.types.UTF8String

  @inline private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    // token [start, end) offsets into the lowercased bytes
    var count = 0
    var i = 0
    var inTok = false
    while (i < len) {
      val t = isTokenByte(bytes(i))
      if (t && !inTok) count += 1
      inTok = t
      i += 1
    }
    if (count < n) return new GenericArrayData(Array.empty[AnyRef])
    val starts = new Array[Int](count)
    val ends = new Array[Int](count)
    var k = 0
    i = 0
    while (i < len) {
      if (isTokenByte(bytes(i))) {
        starts(k) = i
        while (i < len && isTokenByte(bytes(i))) i += 1
        ends(k) = i
        k += 1
      } else i += 1
    }
    val out = new Array[AnyRef](count - n + 1)
    var g = 0
    while (g <= count - n) {
      var glen = n - 1 // the joining spaces
      var j = g
      while (j < g + n) { glen += ends(j) - starts(j); j += 1 }
      val buf = new Array[Byte](glen)
      var o = 0
      j = g
      while (j < g + n) {
        if (j > g) { buf(o) = ' '; o += 1 }
        val l = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), buf, o, l)
        o += l
        j += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** One BPE merge step over a symbol sequence: every adjacent (lhs, rhs)
  * occurrence is replaced by their concatenation in ONE left-to-right
  * greedy pass — the published byte-pair-encoding application rule
  * (Sennrich et al. 2016; also how the reference-grade tokenizer
  * libraries apply a learned merge). Greedy-left is equivalent to
  * "repeatedly merge the leftmost occurrence until none remain": a merge
  * output `lhs+rhs` can never itself equal `lhs` or `rhs` (both
  * non-empty), so merging never creates a new occurrence to the left of
  * the scan point.
  *
  * Codegen'd via a static one-pass compute over the array — the merge
  * learning loop chains one of these per learned step over the
  * vocabulary table (words × symbols, never the corpus), so it must not
  * knock the projection out of whole-stage codegen the way an
  * ArrayTransform lambda would.
  */
case class BpeMergeStepExpr(child: Expression, lhs: String, rhs: String)
    extends UnaryExpression {
  require(lhs.nonEmpty && rhs.nonEmpty, "BPE merge symbols must be non-empty")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge_step needs array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    BpeMergeStepExpr.compute(input.asInstanceOf[ArrayData],
      org.apache.spark.unsafe.types.UTF8String.fromString(lhs),
      org.apache.spark.unsafe.types.UTF8String.fromString(rhs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLhs",
      org.apache.spark.unsafe.types.UTF8String.fromString(lhs))
    val rRef = ctx.addReferenceObj("bpeRhs",
      org.apache.spark.unsafe.types.UTF8String.fromString(rhs))
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BpeMergeStepExpr" +
        s".compute($c, $lRef, $rRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeStepExpr =
    copy(child = newChild)
}

object BpeMergeStepExpr {
  import org.apache.spark.unsafe.types.UTF8String

  def compute(arr: ArrayData, lhs: UTF8String, rhs: UTF8String): ArrayData = {
    val n = arr.numElements()
    val merged = UTF8String.concat(lhs, rhs)
    val out = new Array[AnyRef](n)
    var i = 0
    var k = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && lhs.equals(cur) && rhs.equals(arr.getUTF8String(i + 1))) {
        out(k) = merged
        i += 2
      } else {
        out(k) = cur
        i += 1
      }
      k += 1
    }
    if (k == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}
