package graft

import java.nio.file.Files

import graft.sources.Interchange
import org.scalatest.funsuite.AnyFunSuite

/** The interchange round trips on planted NASTY strings — the values CSV
  * and JSON encoders historically mangle: embedded quotes, commas,
  * newlines, the quote-comma-newline combination, unicode, leading/trailing
  * whitespace, and the null-vs-empty-string distinction (the default CSV
  * options conflate them; the explicit nullValue sentinel must not).
  */
class InterchangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def nasty = {
    import spark.implicits._
    Seq(
      (1L, "en", "web", "plain text"),
      (2L, "en", "web", "comma, inside"),
      (3L, "en", "web", "\"quoted\" words"),
      (4L, "en", "web", "line one\nline two\nline three"),
      (5L, "en", "web", "the trifecta: \"a,b\"\nnext, \"line\""),
      (6L, "ja", "web", "ユニコード éü☃"),
      (7L, "en", "web", "  padded  "),
      (8L, "en", "web", ""),                           // empty string
      (9L, "en", "web", null.asInstanceOf[String]),    // null
      (10L, null.asInstanceOf[String], "web", "null lang dimension"))
      .toDF("doc_id", "lang", "source", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      Option(r.getString(2)), Option(r.getString(3)))).toSeq

  test("JSONL round trip is lossless on nasty strings") {
    val tmp = Files.createTempDirectory("interchange_jsonl").toString
    val got = rows(Interchange.jsonlRoundTrip(nasty, s"$tmp/j"))
    assert(got === rows(nasty.orderBy(org.apache.spark.sql.functions.col("doc_id"))))
    new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
  }

  test("ORC round trip is lossless on nasty strings") {
    val tmp = Files.createTempDirectory("interchange_orc").toString
    val got = rows(Interchange.orcRoundTrip(nasty, s"$tmp/o"))
    assert(got === rows(nasty.orderBy(org.apache.spark.sql.functions.col("doc_id"))))
    new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
  }

  test("CSV round trip is lossless, keeping null and empty string distinct") {
    val tmp = Files.createTempDirectory("interchange_csv").toString
    val got = rows(Interchange.csvRoundTrip(nasty, s"$tmp/c"))
    assert(got === rows(nasty.orderBy(org.apache.spark.sql.functions.col("doc_id"))))
    val byId = got.map(t => t._1 -> t._4).toMap
    assert(byId(8L) === Some(""), "empty string must survive as empty")
    assert(byId(9L) === None, "null must survive as null, not empty")
    new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
  }

  /** The documented CSV corner, pinned rather than hidden: CSV cannot
    * distinguish a value EQUAL to the null sentinel from null, whatever
    * sentinel is chosen — a NUL-byte text reads back null through CSV.
    * JSONL has no such corner (it escapes the byte), which is part of why
    * it is the at-scale default.
    */
  test("CSV sentinel corner is lossy and pinned; JSONL carries the same byte") {
    import spark.implicits._
    val df = Seq((1L, "en", "web", Interchange.CsvNullSentinel))
      .toDF("doc_id", "lang", "source", "text")
    val tmp = Files.createTempDirectory("interchange_corner").toString
    assert(rows(Interchange.csvRoundTrip(df, s"$tmp/c")).head._4 === None,
      "the documented lossy corner: sentinel-valued text reads back null")
    assert(rows(Interchange.jsonlRoundTrip(df, s"$tmp/j")).head._4 ===
      Some(Interchange.CsvNullSentinel),
      "JSONL must carry the same byte losslessly")
    new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
  }
}
