package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interchange-format sources/sinks: JSONL and CSV, the two formats a real
  * corpus actually ARRIVES in before anyone converts it to parquet. Each is
  * registered as a ROUND TRIP — write the documents table through the
  * format, read it back with an explicit schema, hash the result against
  * the parquet truth — so the oracle checks the full encode+decode path
  * (escaping, quoting, null-vs-empty, embedded newlines), not just a read.
  *
  * Scale notes (the reason production pipelines pick one over the other):
  * JSONL is line-delimited, so the read SPLITS — a 100 TB dump fans out to
  * block-sized tasks like any text source. CSV with embedded newlines
  * needs `multiLine`, which parses each FILE whole (non-splittable) — fine
  * for many medium files, a single-task wall for one giant file; q129
  * documents the trade instead of hiding it.
  */
object Interchange {

  /** Per-process scratch roots (overwrite-in-place within one JVM,
    * isolated across processes — see [[Scratch]]): a registered query
    * must not leak one corpus-sized artifact per bench sample, and must
    * not share a mutable path with a concurrent run.
    */
  private def scratch(name: String): String = Scratch.dir(name)

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .filter(col("doc_id").isNotNull)

  /** q128: JSONL round trip — write the documents table as line-delimited
    * JSON, read it back under the explicit schema. JSON escapes newlines
    * and quotes inside values, so one record is always one line and the
    * read splits at block granularity; absent fields decode to null, so
    * null text survives the trip.
    */
  def q128(spark: SparkSession, dir: String): DataFrame =
    jsonlRoundTrip(docs(spark, dir), scratch("graft-q128-jsonl"))

  /** The q128 core over any frame — planted specs run it on nasty strings. */
  def jsonlRoundTrip(d: DataFrame, path: String): DataFrame = {
    d.write.mode("overwrite").json(path)
    d.sparkSession.read.schema(d.schema).json(path).orderBy(col("doc_id"))
  }

  /** q129's null sentinel. CSV fundamentally cannot distinguish "a value
    * that LOOKS like the sentinel" from null — whatever token is chosen,
    * a field equal to it reads back null (the reader matches nullValue on
    * the parsed value, quoted or not). A NUL byte is chosen over the
    * conventional `\N` because real scraped/DB-dumped text CONTAINS `\N`
    * and essentially never contains NUL; the residual corner is pinned by
    * a spec row rather than hidden, and is one more reason q128/q130 are
    * the at-scale defaults.
    */
  val CsvNullSentinel = "\u0000"

  /** q129: CSV round trip — RFC-4180 quoting (escape = `"` so embedded
    * quotes double instead of backslash-escaping), `multiLine` on the
    * read because document text embeds newlines, and an explicit
    * [[CsvNullSentinel]] so null text and the empty string survive as
    * DISTINCT values (the default empty-for-null conflates them — the
    * classic CSV data-loss bug, spec'd against here).
    */
  def q129(spark: SparkSession, dir: String): DataFrame =
    csvRoundTrip(docs(spark, dir), scratch("graft-q129-csv"))

  /** The q129 core over any frame — planted specs run it on nasty
    * strings. The two whitespace options must be false on the WRITE side:
    * Spark's CSV writer TRIMS leading/trailing whitespace by default
    * (read defaults are already false) — silent data loss the planted
    * padded-string row catches.
    */
  def csvRoundTrip(d: DataFrame, path: String): DataFrame = {
    d.write.mode("overwrite")
      .option("header", value = true).option("escape", "\"")
      .option("nullValue", CsvNullSentinel)
      .option("ignoreLeadingWhiteSpace", value = false)
      .option("ignoreTrailingWhiteSpace", value = false)
      .csv(path)
    d.sparkSession.read.schema(d.schema)
      .option("header", value = true).option("escape", "\"")
      .option("nullValue", CsvNullSentinel).option("multiLine", value = true)
      .option("ignoreLeadingWhiteSpace", value = false)
      .option("ignoreTrailingWhiteSpace", value = false)
      .csv(path)
      .orderBy(col("doc_id"))
  }

  /** q130: ORC round trip — the other COLUMNAR interchange: unlike the
    * text formats above it carries types natively (no escaping surface at
    * all) and keeps the parquet-class scan properties — column pruning,
    * predicate pushdown, splittable stripes — so it is the one format
    * here that is also a legitimate RESIDENT format for a 100 TB corpus.
    */
  def q130(spark: SparkSession, dir: String): DataFrame =
    orcRoundTrip(docs(spark, dir), scratch("graft-q130-orc"))

  /** The q130 core over any frame. */
  def orcRoundTrip(d: DataFrame, path: String): DataFrame = {
    d.write.mode("overwrite").orc(path)
    d.sparkSession.read.schema(d.schema).orc(path).orderBy(col("doc_id"))
  }

  /** All round trips hash against the SAME truth: the parquet table
    * itself — the trip must be lossless, so the oracle is the identity
    * read.
    */
  private val roundTripOracle: String =
    """SELECT doc_id, lang, source, text FROM documents
    |WHERE doc_id IS NOT NULL ORDER BY doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q128_jsonl_roundtrip", q128, Some(roundTripOracle)),
    QueryDef("q129_csv_roundtrip", q129, Some(roundTripOracle)),
    QueryDef("q130_orc_roundtrip", q130, Some(roundTripOracle)))
}
