package graft

import graft.operators.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** The fixture corpus has no duplicate texts, so the oracle can't exercise
  * q44's dedup branch — this spec plants duplicates and asserts the
  * keep-smallest-doc_id contract plus each quality gate.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("corpus filter dedups on content keeping the smallest doc_id") {
    import spark.implicits._
    val good = (1 to 30).map(i => s"tok$i").mkString(" ") // 30 tokens, alpha
    val docs = Seq(
      (10L, "en", good),               // kept (smallest id of the dup set)
      (11L, "en", good),               // dropped: duplicate text
      (12L, "en", good + " extra"),    // kept: different text
      (13L, "en", "too short"),        // dropped: < 20 tokens
      (14L, "en", ("1 " * 25).trim),   // dropped: alpha ratio ~0
      (15L, "en", ("the a of and to in is that it for " * 3).trim) // dropped: stopwords
    ).toDF("doc_id", "lang", "text")
    val kept = Pipeline.corpusFilter(docs)
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(10L, 12L))
  }
}
