package graft.operators

import graft.functions.text
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite training-data pipeline queries — the end-to-end shapes an LLM
  * data curation job actually runs, built from the operator tiers above.
  */
object Pipeline {

  /** q44: corpus cleaning — quality gates (length, alpha ratio, stopword
    * ratio band), then exact-dedup keeping the smallest doc_id. One pass of
    * per-row expressions plus one hash shuffle for the dedup window: the
    * canonical pre-training filter chain, all declarative.
    */
  def q44(spark: SparkSession, dir: String): DataFrame =
    corpusFilter(Tables.documents(spark, dir))

  /** The filter chain on any documents-shaped frame (doc_id, text, lang) —
    * factored out so PipelineSpec can exercise the dedup branch on a
    * planted-duplicate corpus (the fixture has no duplicate texts).
    * Signals are computed ONCE in a single projection and filtered as
    * columns — predicates on fresh expressions would re-tokenize per
    * predicate in the separate Filter operator.
    */
  def corpusFilter(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), col("text"),
        size(text.cleanTokens(col("text"))).cast("long").as("n_tokens"),
        text.alphaRatio(col("text")).as("alpha_ratio"),
        text.tokenSetRatio(col("text"), text.stopwords("en")).as("sw_ratio"))
      .filter(col("n_tokens") >= 20 &&
        col("alpha_ratio") >= 0.5 && col("sw_ratio") <= 0.5)
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text").cast("binary")))
          .orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy(col("doc_id"))

  /** q45: deterministic hash split — train/held-out sampling keyed on the
    * CONTENT hash (first md5(text) nibble): byte-identical documents always
    * land in the same split (no train/heldout leakage through duplicate
    * text), reproducible across runs, engines, and cluster sizes with no
    * RNG state.
    */
  def q45(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket_hex",
        substring(md5(col("text").cast("binary")), 1, 1))
      .withColumn("split",
        when(col("bucket_hex").isin("0", "1"), "heldout").otherwise("train"))
      .select(col("doc_id"), col("bucket_hex"), col("split"))
      .orderBy(col("doc_id"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q44_corpus_filter", q44,
      Some("""WITH q AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                         t -> t <> '')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1) AS alpha_ratio,
        |    round(CAST(len(list_filter(
        |        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                    t -> t <> ''),
        |        t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t)))
        |        AS DOUBLE) / greatest(len(list_filter(
        |          regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')), 1),
        |      4) AS sw_ratio
        |  FROM documents),
        |f AS (
        |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM q
        |  WHERE n_tokens >= 20 AND alpha_ratio >= 0.5 AND sw_ratio <= 0.5)
        |SELECT doc_id, lang, n_tokens FROM f WHERE rn = 1
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("q45_hash_split", q45,
      Some("""SELECT doc_id,
        |  substr(md5(text), 1, 1) AS bucket_hex,
        |  CASE WHEN substr(md5(text), 1, 1) IN ('0', '1')
        |       THEN 'heldout' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin)))
}
