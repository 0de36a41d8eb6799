package graft.operators

import graft.functions.text
import graft.sources.LineNumberedText
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's one true query (mapreduce.c:1-346): an inverted index
  * `word -> list of (source, position)`, here in two forms:
  *
  *  - Tier A (reference-literal): over line-numbered text files, with the
  *    exact normalization semantics of mapreduce.c:50-61 and the canonical
  *    order contract of SURVEY §1.4 (postings by (file number, linenum),
  *    words lexicographic).
  *  - Tier B (oracle-checked): the same operator generalized to the
  *    `documents` parquet table — token position plays linenum, doc_id plays
  *    filename — so DuckDB can hash-check it.
  *
  * Scale notes: the groupBy(word) is a single hash shuffle with map-side
  * partial `collect_list` merge; posting lists for mega-keys (stopwords) are
  * the documented skew risk — `ObjectHashAggregate` spills, and the
  * formatted-string sink streams per row. No driver-side collection.
  */
object InvertedIndex {

  /** Map phase P1+P2+P3+P4: normalize each line to a word, keep provenance,
    * drop empties (mapreduce.c:110-121). Input: (filename, linenum, line).
    */
  def postings(lines: DataFrame): DataFrame =
    lines
      .select(
        text.normalizeWord(col("line")).as("word"),
        col("filename"),
        col("linenum"))
      .filter(col("word") =!= "")

  /** Reduce phase A1 (hash-agg form): group by word, collect postings,
    * canonically ordered by (numeric file index when present, filename,
    * linenum) per SURVEY §1.4. Output formatted as the reference's sink S3:
    * `word: (file: line), ...`. [[referenceIndex]] uses the one-exchange
    * sort-based shape instead (two exchanges here: hash + sampled range);
    * this form stays as the generalized A1 operator and the sort-based
    * shape's equality anchor (spec-checked).
    */
  def index(postings: DataFrame): DataFrame = {
    val fileNo = coalesce(
      regexp_extract(col("filename"), "(\\d+)", 1).cast("int"), lit(0))
    val keyed = postings.select(
      col("word"),
      struct(fileNo.as("fileno"), col("filename"), col("linenum")).as("p"))
    keyed
      .groupBy(col("word"))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(
        col("word"),
        size(col("ps")).cast("long").as("n_postings"),
        concat_ws(", ",
          transform(col("ps"), p =>
            format_string("(%s: %d)", p.getField("filename"), p.getField("linenum"))))
          .as("postings"))
      .orderBy(col("word"))
  }

  /** Tier-A end-to-end: read the reference corpus, build the canonical index.
    * Filenames are reduced to basenames to match the golden output.txt.
    *
    * Physical shape — sort-based, ONE exchange (round-16 Tier-A cut): the
    * hash-agg form ([[index]]) costs two exchanges (hash shuffle for the
    * groupBy + a sampled range exchange for the global word order) and
    * measured 0.40 s hot at reference scale vs the C binary's 0.075 s.
    * Here postings range-partition BY WORD in a single exchange (a word's
    * rows land in one reducer), each reducer sorts (word, file#, filename,
    * linenum) and stream-groups adjacent rows into formatted posting lines
    * — a constant-memory pass (O(longest posting list), the same bound as
    * collect_list). Measured hot: 0.14 s — the session's per-action floor.
    *
    * `reducers` = 1 (default) matches the reference's single ordered
    * stdout at its 188 KB scale AND skips the range-sampling job (a
    * 1-partition range exchange needs no bounds). At cluster scale, size
    * `reducers` to the cluster: output is then R range-ordered blocks
    * (globally sorted across partition ids — the §1.4 contract holds for
    * any R, asserted by spec). The hash-shuffled, oracle-checked scale
    * twins of this operator are q01/q01b.
    */
  def referenceIndex(spark: SparkSession, dir: String,
      reducers: Int = 1): DataFrame = {
    val files = LineNumberedText.listTextFiles(dir)
    val lines = LineNumberedText.read(spark, files).toDF()
      .withColumn("filename", element_at(split(col("filename"), "/"), -1))
    val fileNo = coalesce(
      regexp_extract(col("filename"), "(\\d+)", 1).cast("int"), lit(0))
    import spark.implicits._
    postings(lines)
      .select(col("word"), fileNo.as("fileno"), col("filename"), col("linenum"))
      .repartitionByRange(reducers, col("word"))
      .sortWithinPartitions(
        col("word"), col("fileno"), col("filename"), col("linenum"))
      .select(col("word"), col("filename"), col("linenum"))
      .as[(String, String, Int)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(String, Long, String)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (String, Long, String) = {
            val (w, f0, l0) = buf.next()
            var n = 1L
            val sb = new StringBuilder
            sb.append('(').append(f0).append(": ").append(l0).append(')')
            while (buf.hasNext && buf.head._1 == w) {
              val (_, f, l) = buf.next()
              sb.append(", (").append(f).append(": ").append(l).append(')')
              n += 1
            }
            (w, n, sb.toString)
          }
        }
      }
      .toDF("word", "n_postings", "postings")
  }

  /** S3 sink: the reference's formatted text output (`word: (file: line),
    * ...`) written as text files — one file per partition, the distributed
    * analogue of the per-reducer stdout blocks (mapreduce.c:216-222).
    */
  def writeTextIndex(index: DataFrame, path: String): Unit =
    index
      .select(format_string("%s: %s", col("word"), col("postings")))
      .write.mode("overwrite").text(path)

  /** Tier-B: token-position postings over `documents` — posexplode keeps raw
    * array positions (1-based) so dropped empty tokens leave gaps, exactly as
    * the reference keeps line numbers of dropped lines.
    */
  def documentPostings(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // No pre-repartition: tokenize+explode is cheaper than shuffling the
      // text payload (A/B-measured: plain 0.15s vs spread 0.27s for the full
      // q01 at sf0.1), and at cluster scale the scan arrives as many splits
      // anyway — the groupBy shuffle right after is the only exchange needed.
      .select(col("doc_id"), posexplode(text.tokens(col("text"))).as(Seq("pos0", "token")))
      .filter(col("token") =!= "")
      .select(col("token"), col("doc_id"), (col("pos0") + 1).cast("int").as("pos"))

  private def formatDocIndex(grouped: DataFrame): DataFrame =
    grouped.select(
      col("token"),
      size(col("ps")).cast("long").as("n_postings"),
      concat_ws(", ",
        transform(col("ps"), p =>
          format_string("(%d: %d)", p.getField("doc_id"), p.getField("pos"))))
        .as("postings"))
      .orderBy(col("token"))

  def documentsIndex(spark: SparkSession, dir: String): DataFrame =
    formatDocIndex(
      documentPostings(spark, dir)
        .groupBy(col("token"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("pos")))).as("ps")))

  /** Salted two-phase collect — the A1 mega-key strategy (SURVEY §7.3): a
    * stopword like "the" (3.7% of the corpus) would funnel its entire
    * posting list through one reducer. Phase 1 collects per (token, salt) so
    * the hot key's postings build on `salts` tasks in parallel; phase 2
    * flattens the partial lists. Output is identical to documentsIndex —
    * same oracle SQL, plus an equality spec.
    */
  def documentsIndexSalted(spark: SparkSession, dir: String, salts: Int = 16): DataFrame =
    formatDocIndex(
      documentPostings(spark, dir)
        .withColumn("salt", pmod(hash(col("doc_id"), col("pos")), lit(salts)))
        .groupBy(col("token"), col("salt"))
        .agg(collect_list(struct(col("doc_id"), col("pos"))).as("partial"))
        .groupBy(col("token"))
        .agg(sort_array(flatten(collect_list(col("partial")))).as("ps")))

  /** Q2: the canonical MapReduce word count (SURVEY §2.4 A2). */
  def wordCount(spark: SparkSession, dir: String): DataFrame =
    documentPostings(spark, dir)
      .groupBy(col("token").as("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word"))

  private val tokensCte =
    """WITH raw AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS toks
      |  FROM documents
      |), t AS (
      |  SELECT doc_id, unnest(toks) AS token, generate_subscripts(toks, 1) AS pos
      |  FROM raw
      |)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_inverted_index", documentsIndex,
      Some(s"""$tokensCte
        |SELECT token, count(*) AS n_postings,
        |       string_agg('(' || doc_id || ': ' || pos || ')', ', ' ORDER BY doc_id, pos) AS postings
        |FROM t WHERE token <> '' GROUP BY token ORDER BY token""".stripMargin)),
    QueryDef("q01b_salted_index", (s, d) => documentsIndexSalted(s, d),
      Some(s"""$tokensCte
        |SELECT token, count(*) AS n_postings,
        |       string_agg('(' || doc_id || ': ' || pos || ')', ', ' ORDER BY doc_id, pos) AS postings
        |FROM t WHERE token <> '' GROUP BY token ORDER BY token""".stripMargin)),
    QueryDef("q02_word_count", wordCount,
      Some(s"""$tokensCte
        |SELECT token AS word, count(*) AS n
        |FROM t WHERE token <> '' GROUP BY word ORDER BY word""".stripMargin)),
    // Reference-literal corpus index: no SQL oracle (text-file source);
    // golden-checked against output.txt in InvertedIndexSpec instead.
    QueryDef("q00_reference_index",
      (s, _) => referenceIndex(s, "/root/reference/testfiles"),
      None))
}
