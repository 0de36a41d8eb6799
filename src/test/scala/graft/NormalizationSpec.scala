package graft

import graft.functions.text
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** P1+P2 normalization (SURVEY §2.2): the Spark expression must equal the
  * declarative model `longest leading [a-z0-9]+ run of lowercase(s)` on
  * arbitrary input, including unicode, punctuation, and control bytes.
  */
class NormalizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def model(s: String): String =
    s.toLowerCase.takeWhile(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))

  test("normalizeWord equals the leading-alnum model on 2000 random strings") {
    val rnd = new Random(42)
    val alphabet =
      "abcXYZ019 \t.,;:!?\réß中﻿-_'\"()" // ascii + accents + CJK + BOM
    val samples = Seq("", "\r", "﻿Hello", "O'NEILL", "123abc!x") ++
      (1 to 2000).map { _ =>
        val len = rnd.nextInt(12)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
    import spark.implicits._
    val got = samples.toDF("line")
      .select(text.normalizeWord(col("line")))
      .collect().map(_.getString(0)).toSeq
    val want = samples.map(model)
    assert(got === want)
  }
}
