package graft.operators

import graft.functions.text
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY §2.9 Q19 + the
  * LLM-pipeline text battery): token/ngram frequency, quality scoring,
  * language ID. Tokenization is the reference's P2 normalization generalized
  * to explode (lower + split on non-alnum) — all built-in expressions, no
  * UDFs, so the projections stay inside whole-stage codegen and the only
  * shuffle is the frequency group-by.
  */
object TextAnalysis {

  /** Q19: token frequency top-100 by (count DESC, token). Low-cardinality
    * token space aggregates map-side; the explode itself never shuffles.
    */
  def q19Tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(text.cleanTokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(100)

  /** Q19b: word-trigram frequency top-100 — same shape over the native
    * n-gram expression (bit-identical to text.wordNgrams, asserted in
    * TextAnalysisSpec; the HOF form is CodegenFallback).
    */
  def q19Ngrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(
        graft.functions.expressions.textnative.wordNgrams(col("text"), 3))
        .as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(100)

  /** Quality scoring: per-doc heuristic signals (char/token counts, mean
    * token length, alpha ratio, stopword ratio) — pure per-row expressions.
    */
  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    val sigs = text.qualitySignals(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id") +: sigs.map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("doc_id"))
  }

  /** Language ID: n-gram/stopword-marker heuristic (text.langId), checked
    * against a Scala model in TextAnalysisSpec AND oracle-checked: the
    * argmax + tie-break maps to DuckDB list_max over (score, lang) structs
    * (struct comparison is field-order lexicographic on both sides), and the
    * scores are integer-ratio doubles rounded to 4 dp, so both engines
    * compute identical IEEE values.
    */
  def langIdScores(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        text.langId(col("text")).as("lang_pred"),
        col("lang").as("lang_label"))
      .orderBy(col("doc_id"))

  /** BPE-ish token counting (LLM-pipeline budgeting): whitespace tokens vs
    * BPE-style pre-tokens per doc, oracle-checked (the regex is restricted
    * to the RE2 ∩ Java-regex dialect).
    */
  def q35TokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        text.tokenCount(col("text")).as("n_ws_tokens"),
        text.bpeishTokenCount(col("text")).as("n_bpeish_tokens"))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprints (rolling-hash k-grams, window minima): the
    * document-fingerprint face of near-dup detection — a shared fingerprint
    * pins a shared substring of length >= k+w-1. Model-checked in
    * TextAnalysisSpec AND oracle-checked: the Long-wraparound polynomial
    * hash is reproduced in DuckDB with HUGEINT mod-2^64 arithmetic (see
    * winnowOracle), valid because the fixture text is pure ASCII (ascii()
    * == the UTF-16 unit the engine hashes).
    */
  def q34Fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.expressions.sketch
          .winnowFingerprints(col("text"), 8, 4).as("fps"))
      .select(col("doc_id"), size(col("fps")).as("n_fps"),
        element_at(col("fps"), 1).as("min_fp"))
      .orderBy(col("doc_id"))

  private val toksCte =
    """WITH d AS (
      |  SELECT doc_id, text, lang,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |                t -> t <> '') AS toks
      |  FROM documents)""".stripMargin

  /** DuckDB mirror of WinnowFingerprintsExpr (k=8, w=4), generated with the
    * same constants. The engine's Long arithmetic wraps mod 2^64; DuckDB
    * BIGINT throws on overflow, so each polynomial step runs in HUGEINT
    * with an explicit `% 2^64`, and the result re-centers to signed before
    * the (signed) window-minimum compare.
    */
  private def winnowOracle: String = {
    val B = 0x100000001b3L // WinnowFingerprintsExpr.B
    val M = BigInt(1) << 64
    val H = BigInt(1) << 63
    val k = 8
    val w = 4
    var e = "CAST(ascii(substr(text, i, 1)) AS HUGEINT)"
    for (j <- 1 until k)
      e = s"(($e) * $B + ascii(substr(text, i+$j, 1))) % $M"
    val signed = s"CASE WHEN ($e) >= $H THEN ($e) - $M ELSE ($e) END"
    s"""WITH g AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(1, greatest(length(text) - ${k - 1}, 0)),
       |      i -> CAST($signed AS BIGINT)) AS gh
       |  FROM documents),
       |w AS (
       |  SELECT doc_id,
       |    CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[]) ELSE
       |      list_sort(list_distinct(list_transform(
       |        generate_series(1, greatest(len(gh) - $w, 0) + 1),
       |        s -> list_min(gh[s:least(s + ${w - 1}, len(gh))])))) END AS fps
       |  FROM g)
       |SELECT doc_id, CAST(len(fps) AS INT) AS n_fps, fps[1] AS min_fp
       |FROM w ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of text.langId, generated from the same stopword map so
    * the two can never drift.
    */
  private def langIdOracle: String = {
    val structs = text.stopwords.keys.toSeq.sorted.map { l =>
      val words = text.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
      s"""{'score': round(CAST(len(list_filter(toks, t -> list_contains($words, t))) AS DOUBLE) / greatest(len(toks), 1), 4), 'lang': '$l'}"""
    }.mkString(",\n")
    s"""$toksCte,
       |s AS (SELECT doc_id, lang, [$structs] AS scored FROM d)
       |SELECT doc_id,
       |  CASE WHEN list_max(scored).score > 0 THEN list_max(scored).lang
       |       ELSE 'und' END AS lang_pred,
       |  lang AS lang_label
       |FROM s ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q19_token_top100", q19Tokens,
      Some(s"""$toksCte
        |SELECT token, COUNT(*) AS n FROM (SELECT unnest(toks) AS token FROM d)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin)),
    QueryDef("q19_ngram_top100", q19Ngrams,
      Some(s"""$toksCte
        |SELECT gram, COUNT(*) AS n FROM (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 2),
        |    i -> array_to_string(toks[i:i+2], ' '))) AS gram
        |  FROM d WHERE len(toks) >= 3)
        |GROUP BY gram ORDER BY n DESC, gram LIMIT 100""".stripMargin)),
    QueryDef("q26_text_quality", qualityScores,
      Some(s"""$toksCte
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  round(CAST(coalesce(list_aggregate(list_transform(toks, t -> length(t)),
        |          'sum'), 0) AS DOUBLE) / greatest(len(toks), 1), 4)
        |    AS mean_token_len,
        |  round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
        |          AS DOUBLE) / greatest(length(text), 1), 4) AS alpha_ratio,
        |  round(CAST(len(list_filter(toks, t -> list_contains(
        |      ['the','a','of','and','to','in','is','that','it','for'], t)))
        |          AS DOUBLE) / greatest(len(toks), 1), 4) AS stopword_ratio
        |FROM d ORDER BY doc_id""".stripMargin)),
    QueryDef("q27_lang_id", langIdScores, Some(langIdOracle)),
    QueryDef("q47_edit_distance",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          levenshtein(substring(col("text"), 1, 20),
            lit("the quick brown fox")).as("edit_dist"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  CAST(levenshtein(substr(text, 1, 20), 'the quick brown fox') AS INT)
        |    AS edit_dist
        |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("q34_fingerprints", q34Fingerprints, Some(winnowOracle)),
    QueryDef("q35_token_counts", q35TokenCounts,
      Some(s"""WITH d AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                t -> t <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '${text.bpeishPattern.replace("'", "''")}')) AS BIGINT)
        |    AS n_bpeish_tokens
        |FROM d ORDER BY doc_id""".stripMargin)))
}
