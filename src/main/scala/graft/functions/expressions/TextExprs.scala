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
