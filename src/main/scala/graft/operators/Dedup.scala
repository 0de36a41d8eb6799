package graft.operators

import graft.functions.expressions.sketch
import graft.functions.text
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` (SURVEY §2.9 Q18/Q21 + the
  * LLM-pipeline dedup battery): exact hash dedup, MinHash+LSH banded
  * near-dup, SimHash near-dup, and probe-based n-gram Jaccard.
  *
  * 100 TB design rules:
  *  - exact dedup is one hash-shuffle on md5(text) — never on raw text;
  *  - near-dup candidate pairs come ONLY from LSH band buckets (banded
  *    signature join), never an all-pairs cross join; the band join key is a
  *    64-bit hash of the band slice so the shuffle key is fixed-width;
  *  - hot buckets (boilerplate docs) are bounded by verifying candidates
  *    with the exact measure immediately after the bucket join — AQE's
  *    skew-join split handles the shuffle side.
  */
object Dedup {

  /** Q18: exact dedup on md5(text), keeping the smallest doc_id. */
  def q18(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper_id"))

  // ---- MinHash + LSH (Q21) ------------------------------------------------

  /** Signature length and banding: 32 minhashes in 8 bands of 4 rows.
    * P(candidate) = 1-(1-j^4)^8 — ~0.97 at j=0.8, ~0.04 at j=0.2.
    */
  val MinhashK = 32
  val Bands    = 8
  val RowsPerBand: Int = MinhashK / Bands

  /** The classic universal-hash minhash family h_i(x) = a_i*x + b_i (mod
    * 2^64) over ONE base xxhash64 per shingle — strings are hashed once, not
    * k times. Computed by the native MinHashSigExpr (codegen) — the
    * higher-order-function formulation benched ~10x slower at sf0.1.
    */
  val MinhashSeed = 0x5eedL

  /** Per-row minhash signature from pre-hashed shingles (array<long>). */
  def minhashSignature(shingleHashes: Column): Column =
    sketch.minhashSig(shingleHashes, MinhashK, MinhashSeed)

  /** Candidate near-dup pairs from banded LSH + exact Jaccard verification.
    * Input: (doc_id, text); output: (a_id, b_id, jaccard >= threshold).
    */
  def nearDupPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val cores = docs.sparkSession.sparkContext.defaultParallelism
    // shingle-hash computation is the CPU hot spot: spread it over all cores
    // even when the input is a single small file/split (hash partitioning by
    // key, not round-robin, so the layout is deterministic). No
    // size()-filter here — it would be pushed below the exchange and
    // re-evaluate the whole shingle expression in the (serial) scan stage;
    // docs with no shingles get a null band-key array, which explode drops.
    val shingled = docs
      .repartition(cores, col("doc_id"))
      .select(
        col("doc_id"),
        // tokenize+hash+chain fully native: the cleanTokens HOF form is
        // CodegenFallback and de-optimizes the whole projection (equality
        // with the HOF form asserted in DedupSpec)
        sketch.shingleFromHashes(sketch.tokenHashes(col("text")), 3).as("sh"))
    // one row per (band, doc). Band keys come from ONE native-expression
    // evaluation per row (minima + per-band mixing in one pass) — slicing a
    // materialized signature in a later projection re-evaluates it per band
    // after CollapseProject inlining. Only ids travel through the band join;
    // a true near-dup collides in most of its 8 bands, so deduping pairs
    // BEFORE fetching shingles and scoring avoids recomputing the Jaccard
    // (and shipping the arrays) once per shared band.
    val banded = shingled.select(
      col("doc_id"),
      explode(sketch.minhashBandKeys(col("sh"),
        MinhashK, Bands, MinhashSeed)).as("band_key"))
    val pairs = banded.select(col("band_key"), col("doc_id").as("a_id"))
      .join(banded.select(col("band_key"), col("doc_id").as("b_id")),
        Seq("band_key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    pairs
      .join(shingled.select(col("doc_id").as("a_id"), col("sh").as("a_sh")),
        Seq("a_id"))
      .join(shingled.select(col("doc_id").as("b_id"), col("sh").as("b_sh")),
        Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        // Jaccard over hashed shingles: identical to string-shingle Jaccard
        // up to 2^-64-scale collisions, at a fraction of the compare cost
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Q21 over the documents table (rows-only for the driver; recall is
    * property-checked against exact all-pairs Jaccard in DedupSpec).
    */
  def q21(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      threshold = 0.8)

  // ---- SimHash ------------------------------------------------------------

  /** 64-bit SimHash of the doc's tokens: bit b is set when the sum of
    * (+1/-1) over tokens' xxhash64 bit b is positive. Pure per-row
    * expression — zero shuffles to fingerprint a corpus. Tokens are hashed
    * once (built-in xxhash64), the 64-bit balance loop runs in the native
    * SimHash64Expr (codegen).
    */
  def simhash(tokens: Column): Column =
    sketch.simhash64(transform(tokens, t => xxhash64(t)))

  /** SimHash near-dup pairs: pigeonhole banding — any pair within Hamming
    * distance 3 shares at least one of the 4 exact 16-bit chunks, so
    * candidates come from a chunk-equality join, verified by bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val cores = docs.sparkSession.sparkContext.defaultParallelism
    val fp = docs.repartition(cores, col("doc_id"))
      .select(col("doc_id"),
        // native tokenize+hash feeding the native simhash — one codegen'd
        // projection, no interpreted lambda dispatch per token
        sketch.simhash64(sketch.tokenHashes(col("text"))).as("fp"))
    // chunk key = (chunk#, 16 fp bits) packed into one long. A plain long
    // (not a struct) so a null fingerprint (token-less doc) propagates to a
    // null key and drops out of the equi-join — struct keys would treat
    // null fields as equal and pair all token-less docs at "hamming 0".
    val chunked = fp.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(i =>
        lit(i.toLong << 16).bitwiseOR(
          shiftright(col("fp"), i * 16).bitwiseAND(lit(0xffffL)))): _*))
        .as("chunk"))
    // Unlike the jaccard/cosine pipelines, the verification here
    // (bit_count over two longs) is cheaper than a dedupe-then-refetch
    // round trip, so the 8-byte fingerprint rides along the chunk join and
    // duplicate pairs are dropped after scoring.
    val a = chunked.select(col("chunk"), col("doc_id").as("a_id"), col("fp").as("a_fp"))
    val b = chunked.select(col("chunk"), col("doc_id").as("b_id"), col("fp").as("b_fp"))
    a.join(b, Seq("chunk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("a_id"), col("b_id"))
  }

  def q22(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      maxHamming = 3)

  // ---- n-gram Jaccard (probe-based, oracle-checked) -----------------------

  /** Exact 3-gram Jaccard of 5 probe docs against the corpus — the
    * oracle-checkable face of the near-dup measure (probes broadcast; no
    * cross join of the corpus with itself).
    */
  def q23(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(
        col("doc_id"),
        array_distinct(graft.functions.expressions.textnative
          .wordNgrams(col("text"), 3)).as("g"))
    val probes = grams.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("g").as("pg"))
    grams.crossJoin(broadcast(probes))
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"), col("doc_id"),
        (size(array_intersect(col("pg"), col("g"))).cast("double") /
          size(array_union(col("pg"), col("g")))).as("jaccard"))
      .orderBy(col("probe_id"), col("doc_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q18_exact_dedup", q18,
      Some("""SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_id""".stripMargin)),
    QueryDef("q21_minhash_lsh", q21, None),
    QueryDef("q22_simhash_neardup", q22, None),
    QueryDef("q23_ngram_jaccard", q23,
      Some("""WITH d AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |      i -> array_to_string(toks[i:i+2], ' '))) AS g
        |  FROM d),
        |p AS (SELECT doc_id AS probe_id, g AS pg FROM g WHERE doc_id < 5)
        |SELECT probe_id, doc_id,
        |  CAST(len(list_intersect(pg, g.g)) AS DOUBLE) /
        |    len(list_distinct(list_concat(pg, g.g))) AS jaccard
        |FROM g, p WHERE doc_id <> probe_id
        |ORDER BY probe_id, doc_id""".stripMargin)))
}
