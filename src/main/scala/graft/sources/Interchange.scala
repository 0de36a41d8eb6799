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

  /** The q128 core over any frame — planted specs run it on nasty strings.
    * `codec` is the write-side compression ("none", "gzip", "bzip2", … —
    * Spark resolves the read side from the file extension).
    */
  def jsonlRoundTrip(d: DataFrame, path: String,
      codec: String = "none"): DataFrame = {
    d.write.mode("overwrite").option("compression", codec).json(path)
    d.sparkSession.read.schema(d.schema).json(path).orderBy(col("doc_id"))
  }

  /** q131: COMPRESSED intake — how a 100 TB corpus actually arrives. The
    * q128/q129 cores rerun under a compression codec (decode resolved from
    * the file extension, exactly the production shape of a delivered
    * `.jsonl.gz` dump), registered under the same identity oracle so the
    * compress+encode+decode+decompress path is hashed end to end.
    *
    * The codec CHOICE is a splittability decision, measured in
    * InterchangeSpec and recorded in SCALE.md:
    *   - gzip (q131, q131c): one stream, no sync points — Hadoop marks it
    *     non-splittable, so ONE TASK reads each file however large. A
    *     single 1 TB `.jsonl.gz` is a one-task wall; the same corpus as
    *     ~10k shard files fans out fine (parallelism = file count). This
    *     is the #1 intake trap at scale, surfaced here as a measured task
    *     count, not a doc note.
    *   - bzip2 (q131b): block-structured with resynchronizable markers —
    *     Hadoop's SplittableCompressionCodec, so one big file still fans
    *     out to block-sized tasks like uncompressed text. The splittable
    *     compressed contrast, CPU-heavier per byte.
    *   - zstd: the format a modern dump actually prefers is N/A in THIS
    *     Spark build — Spark 4.1's text-source codec table
    *     (`HadoopCompressionCodec`) carries none/bzip2/deflate/gzip/lz4/
    *     snappy only, and Hadoop's `ZStandardCodec` needs native
    *     libhadoop, absent here (zstd-jni on the classpath serves parquet/
    *     ORC/shuffle, not the Hadoop text codec path). Recorded as an
    *     environment fact rather than worked around with vendored code.
    */
  def q131(spark: SparkSession, dir: String): DataFrame =
    jsonlRoundTrip(docs(spark, dir), scratch("graft-q131-jsonl-gz"), "gzip")

  /** q131b: the splittable compressed contrast — `.jsonl.bz2`. */
  def q131b(spark: SparkSession, dir: String): DataFrame =
    jsonlRoundTrip(docs(spark, dir), scratch("graft-q131b-jsonl-bz2"), "bzip2")

  /** q131c: `.csv.gz` through the q129 core — gzip costs nothing extra
    * here because multiLine CSV already parses each file whole.
    */
  def q131c(spark: SparkSession, dir: String): DataFrame =
    csvRoundTrip(docs(spark, dir), scratch("graft-q131c-csv-gz"), "gzip")

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
  def csvRoundTrip(d: DataFrame, path: String,
      codec: String = "none"): DataFrame = {
    d.write.mode("overwrite").option("compression", codec)
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

  /** q132: Avro round trip — the remaining mainstream interchange format
    * after JSONL/CSV/ORC: row-oriented, schema'd, binary, SPLITTABLE (the
    * container format interleaves sync markers, so one big file fans out
    * like uncompressed text — InterchangeSpec measures it), and the
    * Kafka-adjacent arrival format. This Spark distribution ships the Avro
    * LIBRARY (avro + avro-mapred jars) but not the `spark-avro` DataSource
    * module, so the trip runs through Avro's public Hadoop MapReduce
    * formats (`AvroKeyOutputFormat`/`AvroKeyInputFormat`) — the standard
    * pre-DataSource integration path, and a per-partition source/sink
    * bridge (the one place SURVEY §2 sanctions RDD code): records are
    * converted to/from `Row` INSIDE the partition iterator, so nothing
    * Avro-typed ever rides a shuffle, and the reader's object reuse can't
    * alias rows.
    */
  def q132(spark: SparkSession, dir: String): DataFrame =
    avroRoundTrip(docs(spark, dir), scratch("graft-q132-avro"))

  /** The q132 core over any Long/Int/String/Double/Boolean-columned frame —
    * planted specs run it on nasty strings. Every field maps to an Avro
    * `union(null, T)` so null survives in any column; strings decode from
    * Avro `Utf8` back to `String` before they leave the iterator.
    */
  def avroRoundTrip(d: DataFrame, path: String): DataFrame = {
    avroWrite(d, path)
    avroRead(d.sparkSession, path, d.schema).orderBy(col("doc_id"))
  }

  /** Avro schema JSON for a Long/Int/String/Double/Boolean-columned frame —
    * every field a `union(null, T)`. Schema is java-Serializable but the
    * JSON form is the stable contract; each task re-parses it (cheap, once
    * per partition).
    */
  private def avroSchemaJson(
      schema: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.types._
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => "long"
        case IntegerType => "int"
        case DoubleType => "double"
        case BooleanType => "boolean"
        case StringType => "string"
        case other => throw new IllegalArgumentException(
          s"avro bridge: unsupported column type $other for ${f.name}")
      }
      s"""{"name":"${f.name}","type":["null","$t"],"default":null}"""
    }
    s"""{"type":"record","name":"row","namespace":"graft",
       |"fields":[${fields.mkString(",")}]}""".stripMargin
  }

  /** The write half of the Avro bridge. */
  def avroWrite(d: DataFrame, path: String): Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericRecord}
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyOutputFormat}
    import org.apache.hadoop.io.NullWritable
    import org.apache.hadoop.mapreduce.Job
    val spark = d.sparkSession
    val names = d.schema.fieldNames
    val schemaJson = avroSchemaJson(d.schema)
    // saveAsNewAPIHadoopFile has no overwrite mode — the scratch path is
    // per-process, so the delete only ever removes this process's residue
    val out = new org.apache.hadoop.fs.Path(path)
    out.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(out, true)
    val wjob = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(wjob, new Schema.Parser().parse(schemaJson))
    d.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        names.indices.foreach { i =>
          rec.put(names(i), if (row.isNullAt(i)) null else row.get(i))
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], wjob.getConfiguration)
  }

  /** The read half of the Avro bridge. The returned frame's partitioning
    * IS the Hadoop input-split fan-out, which is what makes Avro's
    * splittability measurable (InterchangeSpec): container files
    * interleave sync markers, so `AvroKeyInputFormat` resumes at the next
    * marker inside any byte-range split — one big file fans out like
    * uncompressed text, unlike gzip's one-task wall.
    */
  def avroRead(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.GenericRecord
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat}
    import org.apache.hadoop.io.NullWritable
    import org.apache.hadoop.mapreduce.Job
    import org.apache.spark.sql.Row
    val names = schema.fieldNames
    val schemaJson = avroSchemaJson(schema)
    val rjob = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(rjob, new Schema.Parser().parse(schemaJson))
    val rows = spark.sparkContext.newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        rjob.getConfiguration)
      .mapPartitions { it =>
        // per-partition setup, nothing per record beyond the Row itself:
        // fields resolve POSITIONALLY (setInputKeySchema pins the reader
        // schema to ours, so position i is field i — no name lookups)
        val nFields = names.length
        it.map { case (k, _) =>
          // the record reader REUSES the AvroKey — extract immutable
          // values here, before the iterator advances
          val rec = k.datum()
          val vals = new Array[Any](nFields)
          var i = 0
          while (i < nFields) {
            vals(i) = rec.get(i) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case v => v
            }
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    spark.createDataFrame(rows, schema)
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
    QueryDef("q130_orc_roundtrip", q130, Some(roundTripOracle)),
    QueryDef("q131_jsonl_gzip_roundtrip", q131, Some(roundTripOracle)),
    QueryDef("q131b_jsonl_bzip2_roundtrip", q131b, Some(roundTripOracle)),
    QueryDef("q131c_csv_gzip_roundtrip", q131c, Some(roundTripOracle)),
    QueryDef("q132_avro_roundtrip", q132, Some(roundTripOracle)))
}
