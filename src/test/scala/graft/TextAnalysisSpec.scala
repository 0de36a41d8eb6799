package graft

import graft.functions.text
import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

import scala.math.BigDecimal.RoundingMode

/** langId (q27) has no SQL oracle — check the Spark expression against a
  * plain-Scala model of the documented semantics (argmax of stopword-marker
  * ratio, ties to the greatest language code, all-zero → "und").
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tokens(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def ratio(toks: Seq[String], set: Seq[String]): Double = {
    val hits = toks.count(set.contains)
    BigDecimal.valueOf(hits.toDouble / math.max(toks.size, 1))
      .setScale(4, RoundingMode.HALF_UP).toDouble
  }

  private def model(s: String): String = {
    val toks = tokens(s)
    val scored = text.stopwords.keys.toSeq.sorted
      .map(l => (ratio(toks, text.stopwords(l)), l))
    val best = scored.max // lexicographic (score, lang): ties → greatest lang
    if (best._1 > 0) best._2 else "und"
  }

  test("langId expression matches the Scala model on all sf0.001 docs") {
    val rows = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("text"),
        text.langId(org.apache.spark.sql.functions.col("text")).as("pred"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) === model(r.getString(0)),
        s"langId mismatch on: ${r.getString(0).take(60)}")
    }
  }

  test("q27 output is one row per doc with a non-null prediction") {
    val df = TextAnalysis.langIdScores(spark, dir).collect()
    assert(df.length === 500)
    assert(df.forall(_.getString(1) != null))
  }
}
