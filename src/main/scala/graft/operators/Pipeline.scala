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
        text.tokenCount(col("text")).as("n_tokens"),
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

  /** q83: split-leakage audit — the check a training run does before
    * trusting its heldout numbers: near-dup pairs (MinHash-LSH candidates,
    * exact-Jaccard verified at 0.8, q21's pipeline) that CROSS q45's
    * train/heldout boundary. Exact duplicates cannot cross by construction
    * (q45 keys the split on md5(text), so byte-identical docs co-locate);
    * near-dups can — a heldout doc that is a near-copy of a training doc
    * silently inflates eval scores, and this query names each offending
    * pair. Empty output = clean split.
    *
    * Shape for 100 TB: the pair generator is the banded LSH join (ids-only
    * shuffles); the split labels join back by id; no new wide exchange
    * beyond q21's own.
    */
  def q83(spark: SparkSession, dir: String): DataFrame =
    splitLeakage(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** The q83 core over any (doc_id, text) frame — planted-corpus specs run
    * it directly against a plain-Scala model.
    */
  def splitLeakage(docs: DataFrame): DataFrame = {
    val splits = docs
      .select(col("doc_id"),
        when(substring(md5(col("text").cast("binary")), 1, 1).isin("0", "1"),
          "heldout").otherwise("train").as("split"))
    Dedup.nearDupPairsUnsorted(docs, 0.8)
      .join(splits.select(col("doc_id").as("a_id"), col("split").as("a_split")),
        Seq("a_id"))
      .join(splits.select(col("doc_id").as("b_id"), col("split").as("b_split")),
        Seq("b_id"))
      .filter(col("a_split") =!= col("b_split"))
      .select(col("a_id"), col("b_id"), col("a_split"), col("b_split"),
        col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q87: split REPAIR — the fix for what q83 audits: any near-dup
    * component (q21's pair generator, threshold 0.8, q56's CC) containing
    * BOTH train and heldout members has its train members QUARANTINED
    * (excluded from training) so no eval item keeps a near-copy in train.
    * The WHOLE component is quarantined, not just direct cross-pair
    * partners: similarity chains (A≈B≈C with only C heldout) leak through
    * two hops, and the component is exactly what the dedup resolution
    * already computes. The heldout side is never reassigned — the benchmark
    * stays fixed. Output: every doc's (split, action),
    * action ∈ {train, heldout, quarantine}; action = split means unchanged.
    *
    * Shape for 100 TB: exact duplicates collapse to one representative per
    * distinct text BEFORE pair generation (q76's staging lesson — measured
    * on the dup-heavy fixture, where feeding raw copies to LSH made every
    * 501-copy group a C(501,2) intra-bucket clique and ran ×4.03 vs clean;
    * collapsed, the pair graph is duplicate-free). The collapse is exact,
    * not approximate: identical texts share the md5-derived SPLIT and the
    * same near-dup neighbors, so rep-level components + the per-component
    * action fan back to members unchanged. Then ids-only banded pair joins
    * (q21), pointer-jumped CC over edge-incident reps only (q56), and the
    * mixed-component flag aggs over the edge-incident rows alone —
    * singleton reps (lab = v, the vast majority) never enter the flag
    * shuffle; members re-attach through one narrow md5-keyed join.
    */
  def q87(spark: SparkSession, dir: String): DataFrame =
    splitRepair(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** The q87 core over any (doc_id, text) frame — planted-corpus specs run
    * it against a plain-Scala model (q83's pattern).
    */
  def splitRepair(docs: DataFrame): DataFrame = {
    // null-safe group key (q89's prio idiom): md5(NULL) is NULL, and the
    // member fan-back equi-join on g would silently drop every null-text
    // doc — coalesce to "" (no md5 collides with it) so they form one
    // shingle-less singleton group whose split/action is 'train', exactly
    // what the oracle's CASE over md5(text) resolves to
    val keyed = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("text"),
        coalesce(md5(col("text").cast("binary")), lit("")).as("g"))
    // one rep per distinct text; the split is a function of the text hash,
    // so it computes once per GROUP (first hex nibble 0/1 = heldout), never
    // per member
    val reps = keyed.groupBy(col("g"))
      .agg(min(struct(col("doc_id"), col("text"))).as("m"))
      .select(col("g"), col("m.doc_id").as("rep_id"), col("m.text").as("text"),
        when(substring(col("g"), 1, 1).isin("0", "1"), "heldout")
          .otherwise("train").as("split"))
      .localCheckpoint()
    // pairs feeds BOTH the CC edge set and the incident-node scan below —
    // unmaterialized, the banded LSH pair generation (shingle + band join +
    // Jaccard verify over rep texts) executed once per consumer (r18
    // baseline: 25 exchanges in the q87 plan). Ids-only rows; materialize.
    val pairs = Dedup.nearDupPairsUnsorted(
      reps.select(col("rep_id").as("doc_id"), col("text")), 0.8)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()
    val labels = Dedup.connectedComponents(
      reps.select(col("rep_id").as("v")), pairs)
    val labeled = labels.join(
      reps.select(col("rep_id").as("v"), col("g"), col("split")), Seq("v"))
    // mixed-component detection runs over edge-incident reps only: a
    // singleton component (one member) cannot contain both splits
    val incident = pairs.select(col("a_id").as("v"))
      .union(pairs.select(col("b_id").as("v"))).distinct()
    val mixed = labeled.join(incident, Seq("v"))
      .groupBy(col("lab"))
      .agg(max(when(col("split") === "heldout", 1).otherwise(0)).as("h"),
        max(when(col("split") === "train", 1).otherwise(0)).as("t"))
      .filter(col("h") === 1 && col("t") === 1)
      .select(col("lab"), lit(1).as("mixed"))
    val repAction = labeled.join(mixed, Seq("lab"), "left")
      .select(col("g"), col("split"),
        when(col("mixed").isNotNull && col("split") === "train", "quarantine")
          .otherwise(col("split")).as("action"))
    keyed.select(col("doc_id"), col("g"))
      .join(repAction, Seq("g"))
      .select(col("doc_id"), col("split"), col("action"))
      .orderBy(col("doc_id"))
  }

  /** q88: curation funnel report — the per-stage artifact a full curation
    * RUN ships (every stage is a shipped operator, composed in the order a
    * production pipeline applies them): train-side raw corpus → quality
    * gates (q44's three) → model gate (q94's classifier at the
    * [[ClassifierFloorE6]] operating point) → exact dedup (min-id per md5)
    * → near-dup resolution (q21 pairs at 0.8 + q56 CC, component min
    * survives) →
    * benchmark decontamination (drop docs sharing any 8-token window with
    * an eval doc — the doc-DROP policy; q86 is the surgical alternative).
    * One row per stage: (stage_idx, stage, docs, tokens) — the "how much
    * data survives each knife" table every training-data run reports.
    *
    * Shape for 100 TB: per-stage costs are the member operators' own (gates
    * are one codegen'd projection; dedup one md5 shuffle; pairs ids-only
    * banded joins; decontam a broadcast membership test). The reused
    * survivor frames are localCheckpoint-materialized (q78's lesson) so the
    * six stat branches re-read materialized partitions instead of
    * re-executing the gate/window/CC lineage per branch; each stat is a
    * two-long aggregate.
    */
  def q88(spark: SparkSession, dir: String): DataFrame =
    curationFunnel(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      EvalEvery)

  /** The q88 core over any (doc_id, text) frame with a parameterized eval
    * split — planted-corpus specs run it directly.
    */
  def curationFunnel(docs: DataFrame, evalEvery: Long): DataFrame = {
    val stages = curationStages(docs, evalEvery)
    stages.zipWithIndex
      .map { case ((name, df), i) => funnelStat(df, i, name) }
      .reduce(_.union(_))
      .orderBy(col("stage_idx"))
  }

  /** One funnel row — (stage_idx, stage, docs, tokens) — from a staged
    * survivor frame carrying n_tokens. Shared by q88 and the CurationRun
    * manifest (which extends the funnel with its run-only stages).
    */
  def funnelStat(df: DataFrame, idx: Int, name: String): DataFrame =
    df.agg(count(lit(1)).as("docs"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("tokens"))
      .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
        col("docs"), col("tokens"))

  /** The funnel's staged survivor frames, in stage order, each carrying
    * (doc_id, text, n_tokens, …): raw → quality → classifier →
    * exact_dedup → near_dedup
    * → decontaminated. Exposed so [[graft.CurationRun]] can WRITE the same
    * frames q88 counts — manifest parity with the q88 oracle is then by
    * construction, not by re-implementation.
    */
  def curationStages(docs: DataFrame,
      evalEvery: Long): Seq[(String, DataFrame)] =
    curationStages(docs, evalEvery, ClassifierFloorE6, FunnelNearDupJaccard)

  /** [[curationStages]] with the two tunable knives as parameters — the
    * classifier operating point (q102's sweep is the calibration table
    * that justifies a value) and the near-dup Jaccard bar. q88 and the
    * default CurationRun use the deployed constants, so their oracle
    * surfaces are unchanged; a recalibrated CurationRun passes the chosen
    * points through without a rebuild.
    */
  def curationStages(docs: DataFrame, evalEvery: Long,
      classifierFloorE6: Long,
      nearDupJaccard: Double): Seq[(String, DataFrame)] =
    curationStages(docs, evalEvery, classifierFloorE6, nearDupJaccard,
      qualityKeeper = false)

  /** [[curationStages]] with the near-dup keeper POLICY as a parameter:
    * `qualityKeeper = true` swaps the min-label survivor for q113's
    * argmax-classifier-score member per component (ties → lowest id) —
    * dedup decides the cluster, quality decides the survivor. Default
    * false keeps q88's oracle surface bit-identical. The quality form
    * costs one extra scoring pass over the exact-dedup survivors (the
    * funnel's own classifier pass kept only ids); the argmax is a
    * map-side-combinable min(struct), q113's shape.
    */
  def curationStages(docs: DataFrame, evalEvery: Long,
      classifierFloorE6: Long,
      nearDupJaccard: Double,
      qualityKeeper: Boolean): Seq[(String, DataFrame)] = {
    import graft.functions.expressions.sketch
    // base and clf are each consumed by SEVERAL actions downstream (their
    // own funnel stat, every later stage's lineage, and CurationRun's
    // doc-fates union) — materialize both so no consumer re-executes the
    // tokenize/ratio projection or, far worse, the classifier's
    // token-explode scoring pass. Round-13 measurement: at the sf10 decade
    // the UNCHECKPOINTED clf lineage re-ran the 447k-doc scoring explode
    // once for the manifest stats and once for the fates fold, dominating
    // a 209 s artifacts stage whose actual sink writes are seconds.
    val base = docs
      .filter(col("doc_id").isNotNull && col("doc_id") % evalEvery =!= 0)
      .select(col("doc_id"), col("text"),
        // null text must yield NULL (not size(null) = -1) so the raw-stage
        // SUM skips it exactly like the oracle's NULL n_tokens — the same
        // null-parity guard q80/q84/q86/q90 carry
        when(col("text").isNotNull, text.tokenCount(col("text")))
          .as("n_tokens"),
        text.alphaRatio(col("text")).as("alpha_ratio"),
        text.tokenSetRatio(col("text"), text.stopwords("en")).as("sw_ratio"))
      .localCheckpoint()
    val qual = base.filter(col("n_tokens") >= 20 &&
      col("alpha_ratio") >= 0.5 && col("sw_ratio") <= 0.5)
    // model gate (q94's scorer at the funnel's operating point): the
    // id-only semi join keeps the gate off the text payload's shuffle path
    val clfIds = TextAnalysis.classifierScoresUnsorted(
        qual.select(col("doc_id"), col("text")))
      .filter(col("mean_e6") >= classifierFloorE6)
      .select(col("doc_id"))
    val clf = qual.join(clfIds, Seq("doc_id")).localCheckpoint()
    val exs = clf
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text").cast("binary")))
          .orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text"), col("n_tokens"))
      .localCheckpoint()
    val pairs = Dedup.nearDupPairsUnsorted(
      exs.select(col("doc_id"), col("text")), nearDupJaccard)
      .select(col("a_id"), col("b_id"))
    val labels = Dedup.connectedComponents(
      exs.select(col("doc_id").as("v")), pairs)
    val keeperIds =
      if (!qualityKeeper)
        labels.filter(col("v") === col("lab")).select(col("v").as("doc_id"))
      else {
        // q113's policy: per component, the argmax-(mean_e6, -id) member
        val scored = labels.select(col("v").as("doc_id"), col("lab"))
          .join(TextAnalysis.classifierScoresUnsorted(
              exs.select(col("doc_id"), col("text")))
            .select(col("doc_id"), col("mean_e6")), Seq("doc_id"))
        scored.groupBy(col("lab"))
          .agg(min(struct((-col("mean_e6")).as("neg"),
            col("doc_id").as("kid"))).as("b"))
          .select(col("b.kid").as("doc_id"))
      }
    val nears = exs.join(keeperIds, Seq("doc_id"))
      .localCheckpoint()
    val evalGh = docs
      .filter(col("doc_id").isNotNull && col("doc_id") % evalEvery === 0)
      .select(explode(sketch.gramHashes(
        sketch.tokenHashes(col("text")), Dedup.SpanTokens)).as("gh"))
      .distinct()
    val hits = nears
      .select(col("doc_id"), explode(sketch.gramHashes(
        sketch.tokenHashes(col("text")), Dedup.SpanTokens)).as("gh"))
      .join(broadcast(evalGh), Seq("gh"))
      .select(col("doc_id")).distinct()
    val dec = nears.join(hits, Seq("doc_id"), "left_anti")
    Seq("raw" -> base, "quality" -> qual, "classifier" -> clf,
      "exact_dedup" -> exs, "near_dedup" -> nears, "decontaminated" -> dec)
  }

  /** The funnel's classifier operating point, on q94's mean_e6 scale
    * (mean per-token weight in micro-milli-units). The weight table is a
    * zero-mean md5 stand-in for a trained model (TextAnalysis.q94 docs), so
    * a 90-token doc's mean has σ ≈ 61,000 e6-units — the floor sits ~5σ
    * out, cutting only deliberately weight-stuffed documents (the planted
    * funnel spec) while ordinary corpus docs pass. With a REAL trained
    * weight table this constant is the calibrated precision/recall
    * operating point; the gate's plan shape (map-side scoring + id-only
    * semi join) is identical either way.
    */
  val ClassifierFloorE6: Long = -300000L

  /** The funnel's near-dup Jaccard bar (the q21 estimated-Jaccard
    * threshold its pair stage runs at). Like [[ClassifierFloorE6]], a
    * deployed default that the parameterized [[curationStages]] overload
    * lets a recalibrated run override without a rebuild.
    */
  val FunnelNearDupJaccard: Double = 0.8

  /** q89: per-source document cap — keep at most `cap` docs per source, the
    * over-represented-domain downsampling step of web-corpus curation. The
    * kept set is EXACT and deterministic: the `cap` lowest (md5(text),
    * doc_id) keys per source, so reruns and engines agree bit-for-bit (same
    * keep-key idiom as q45/q75; md5 of the UTF-8 bytes matches DuckDB's).
    *
    * Shape for 100 TB: the naive form — one `row_number() OVER (PARTITION BY
    * source)` — funnels each source's ENTIRE corpus slice through one task
    * (a 20-source crawl = 20 tasks total, each possibly terabytes). Instead
    * the rank runs in two bounded phases, the per-group generalization of
    * q08-vs-q09's TakeOrdered-vs-global-sort lesson and q50's two-phase
    * cumsum:
    *   1. salt the corpus into (source, salt % [[CapSaltBuckets]]) cells and
    *      rank within cells — a hot source parallelizes across its buckets,
    *      and only (doc_id, source, prio) ever shuffles (the text payload is
    *      dropped after the keep-key projection);
    *   2. re-rank the phase-1 survivors — at most buckets × cap rows per
    *      source, INDEPENDENT of corpus size — with the plain per-source
    *      window, now over a bounded frame.
    * Exactness: a doc with global per-source rank r ≤ cap has rank ≤ r in
    * its own cell, so phase 1 never drops a global keeper; every doc ranked
    * above a keeper also survives phase 1, so phase 2's rank equals the
    * global rank. Both directions asserted in PipelineSpec (plain-window
    * equality on the real fixture + an md5-model planted spec).
    */
  val SourceCap = 20
  val CapSaltBuckets = 8

  def q89(spark: SparkSession, dir: String): DataFrame =
    sourceCap(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source")), SourceCap)

  def sourceCap(docs: DataFrame, cap: Int): DataFrame = {
    val keyed = docs
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("source"),
        // null-text docs still compete for the cap: empty-string key, like
        // the oracle's coalesce(md5(text), '')
        coalesce(md5(col("text").cast("binary")), lit("")).as("prio"))
    val local = keyed
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(CapSaltBuckets)))
      .withColumn("lrn", row_number().over(
        Window.partitionBy(col("source"), col("salt"))
          .orderBy(col("prio"), col("doc_id"))))
      .filter(col("lrn") <= cap)
    local
      .withColumn("src_rank", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("prio"), col("doc_id"))))
      .filter(col("src_rank") <= cap)
      .select(col("doc_id"), col("source"), col("src_rank"))
      .orderBy(col("doc_id"))
  }

  /** q90: eval-integrity report — the REVERSE view of q57/q66's train-side
    * decontamination: for each EVAL doc, how compromised is it? Reports per
    * eval doc its distinct 8-token windows, how many of those windows occur
    * anywhere in train, the leaked fraction, and how many distinct train
    * docs quote it. q57 answers "which train docs must I clean"; this
    * answers "which benchmark items are no longer trustworthy" — the report
    * an eval-set owner ships BEFORE trusting a score on a corpus-trained
    * model. Eval docs with zero overlap (or too short to have a window)
    * appear with zeros — absence of evidence is part of the report.
    *
    * Shape for 100 TB: the eval side is small by nature (q66's premise), so
    * the (eval_id, gh) frame BROADCASTS against the single train tokenize
    * pass — the corpus never shuffles by gram key. The only wide operations
    * (the two distinct-counts keyed by eval_id) run on the HIT pairs, whose
    * volume is the leak mass itself, not the corpus. Windows are compared as
    * 64-bit gram hashes on the engine side vs string grams in the oracle —
    * membership and distinct-counts agree unless xxhash64 collides within a
    * doc's or the eval set's gram universe (odds ~n²/2⁶⁴; the q86 parity
    * argument).
    */
  def q90(spark: SparkSession, dir: String): DataFrame =
    evalContamReport(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      EvalEvery)

  /** The q90 core with a parameterized eval split — planted specs run it
    * directly.
    */
  def evalContamReport(docs: DataFrame, evalEvery: Long): DataFrame = {
    import graft.functions.expressions.sketch
    val base = docs.filter(col("doc_id").isNotNull)
    def grams = (f: DataFrame) => f.select(col("doc_id"),
      array_distinct(sketch.gramHashes(
        sketch.tokenHashes(col("text")), Dedup.SpanTokens)).as("ghs"))
    val evalDocs = grams(base.filter(col("doc_id") % evalEvery === 0))
      // greatest(size, 0): size() is -1 for a null-text doc, which has no
      // windows, not negative-one windows
      .select(col("doc_id"), col("ghs"),
        greatest(size(col("ghs")), lit(0)).cast("long").as("n_windows"))
      .localCheckpoint()
    val evalGh = evalDocs
      .select(col("doc_id").as("eval_id"), explode(col("ghs")).as("gh"))
    val trainGh = grams(base.filter(col("doc_id") % evalEvery =!= 0))
      .select(col("doc_id").as("train_id"), explode(col("ghs")).as("gh"))
    val hits = trainGh.join(broadcast(evalGh), Seq("gh"))
    val perEval = hits.groupBy(col("eval_id")).agg(
      countDistinct(col("gh")).as("leaked"),
      countDistinct(col("train_id")).as("quoters"))
    evalDocs
      .join(perEval, evalDocs("doc_id") === perEval("eval_id"), "left")
      .select(evalDocs("doc_id"), col("n_windows"),
        coalesce(col("leaked"), lit(0L)).as("n_leaked_windows"),
        round(coalesce(col("leaked"), lit(0L)).cast("double") /
          greatest(col("n_windows"), lit(1L)), 4).as("leak_ratio"),
        coalesce(col("quoters"), lit(0L)).as("n_train_docs"))
      .orderBy(col("doc_id"))
  }

  /** q49: PII-style redaction scrub — emails, URLs, long digit runs replaced
    * by typed placeholders, with per-doc match counts. Pure per-row regexp
    * expressions (codegen'd, no shuffle): the canonical pre-training scrub
    * pass. Patterns are restricted to the Java-regex ∩ RE2 dialect so the
    * DuckDB oracle applies verbatim; planted-PII behavior is additionally
    * spec-checked (the fixture corpus itself contains no PII).
    */
  // (?i): PII is case-blind (Bob@Example.COM, HTTPS://...) — the inline flag
  // is shared by Java regex and RE2, so the DuckDB oracle stays in sync.
  // URL body is whitespace-bounded (an EXPLICIT class, not \s: Java's \s
  // includes vertical tab, RE2's does not — the literal class means both
  // engines stop the URL at the same characters), so a URL in multi-line
  // text can't swallow newlines and the lines after them.
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlRe = "(?i)https?://[^ \\t\\n\\r\\f\\x0B]+"
  val LongNumRe = "[0-9]{7,}"

  def redact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("text"), lit(UrlRe), lit(0)))
          .as("n_urls"),
        size(regexp_extract_all(col("text"), lit(LongNumRe), lit(0)))
          .as("n_longnums"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), UrlRe, "<URL>"),
            EmailRe, "<EMAIL>"),
          LongNumRe, "<NUM>").as("redacted"))
      // presentation-sort range sampling re-executes this scan-level
      // child (no shuffle below to resume from) — uncheckpointed, the
      // per-row expression work ran twice per run (the q112/q141 lesson)
      .localCheckpoint()
      .orderBy(col("doc_id"))

  /** q114: markup strip — the HTML-to-text preprocessing every web-crawl
    * corpus runs BEFORE any quality/dedup stage (the CCNet/C4 extraction
    * step, reduced to its deterministic core): script/style blocks drop
    * wholesale (their content is code, not prose), comments and all
    * remaining balanced tags strip, the six ubiquitous entities decode
    * (&amp; LAST, so "&amp;lt;" correctly yields "&lt;" — literal text,
    * not a second decode), and whitespace collapses to single spaces.
    * Unterminated tags stay by design (conservative: never eat prose on
    * malformed markup). Reported per doc: the cleaned text and how many
    * characters markup removal reclaimed — the "boilerplate mass" signal
    * a crawl-health dashboard tracks per source.
    *
    * Cross-engine exactness: every pattern is restricted to the
    * Java-regex ∩ RE2 common subset — inline (?is) flags, non-greedy
    * spans, no lookaround, and an EXPLICIT whitespace class (Java's \\s
    * includes \\x0B, RE2's does not — the one divergence this battery
    * would otherwise hit). The mirror applies the identical replace chain
    * with DuckDB's 'g' flag (Spark's regexp_replace is always global).
    *
    * 100 TB shape: stateless per-row codegen'd regexp chain riding the
    * scan — zero joins, zero shuffles beyond the presentation sort, the
    * same class as q49's redaction scrub.
    */
  def q114(spark: SparkSession, dir: String): DataFrame =
    markupStrip(Tables.documents(spark, dir))

  /** The q114 core over any (doc_id, text) frame — planted specs run it
    * directly. The chain itself lives in [[text.stripMarkup]] so
    * CurationRun's opt-in pre-funnel transform runs the identical
    * expression.
    */
  def markupStrip(docs: DataFrame): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    val clean = text.stripMarkup(col("text"))
    docs.select(col("doc_id"), clean.as("clean_text"),
      (length(t) - length(clean)).cast("long").as("n_removed"))
      // presentation-sort range sampling re-executes this scan-level
      // child (no shuffle below to resume from) — uncheckpointed, the
      // per-row expression work ran twice per run (the q112/q141 lesson)
      .localCheckpoint()
      .orderBy(col("doc_id"))
  }

  /** q127: within-document line dedup — the self-boilerplate cut CCNet
    * applies per PAGE before any corpus-level stage (navigation chrome,
    * repeated headers/footers, cookie banners repeat INSIDE one page long
    * before they repeat across pages): each document keeps the FIRST
    * occurrence of every distinct line, in original order. Complements
    * q80/q80b (corpus-duplicated line strip — lines shared ACROSS docs)
    * and q58 (repetition SIGNALS — this is the cut). Reported per doc:
    * line totals and the rebuilt text, so Σ(n_lines − n_kept) is the
    * self-boilerplate mass.
    *
    * 100 TB shape: the explode and the (doc_id, line)-keyed first-wins
    * window never leave the document — the window partitions on
    * (doc_id, line), so partition width is a single document's copies of
    * ONE line, and the rebuild groups by doc_id (one doc per group, the
    * parallel unit a per-doc transform wants). Text rides exactly two
    * exchanges (window + rebuild) at line granularity; no corpus-wide
    * anything.
    */
  def q127(spark: SparkSession, dir: String): DataFrame =
    docLineDedup(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** The q127 core over any (doc_id, text) frame — planted specs run it
    * directly. Null-text docs fan back with zero counts and null text
    * (nothing to clean is not an error — q87's null accounting).
    */
  def docLineDedup(docs: DataFrame): DataFrame = {
    val ids = docs.filter(col("doc_id").isNotNull)
    val lines = ids.filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(split(col("text"), "\n")))
      .withColumnRenamed("col", "line")
    val marked = lines.withColumn("rn", row_number().over(
      Window.partitionBy(col("doc_id"), col("line")).orderBy(col("pos"))))
    val rebuilt = marked.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_lines"),
      sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(
            when(col("rn") === 1, struct(col("pos"), col("line"))))),
          x => x.getField("line")),
        "\n").as("clean_text"))
    ids.select(col("doc_id")).join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("clean_text"))
      .orderBy(col("doc_id"))
  }

  def q49(spark: SparkSession, dir: String): DataFrame =
    redact(Tables.documents(spark, dir))

  /** q50: token-budget chunk packing — documents are assigned to training
    * chunks of ~`budget` tokens by cumulative token offset in doc_id order
    * (chunk = floor(preceding-tokens / budget)): deterministic, no driver
    * state.
    *
    * The cumulative sum is TWO-PHASE so it never funnels one partition (a
    * global `Window.orderBy` plans `Exchange SinglePartition` — the whole
    * corpus through one task; PlanSpec asserts that exchange is gone):
    *   1. shard = doc_id / ShardSize (monotone in doc_id, so shard order ==
    *      global order); within-shard running sums run as a PARTITIONED
    *      window, all shards in parallel;
    *   2. each shard's offset = sum of the totals of the shards before it,
    *      computed on the tiny per-shard aggregate (corpus/ShardSize rows)
    *      via a broadcast triangular join — no single-partition exchange
    *      anywhere. (At extreme shard counts this level nests once more —
    *      the classic two-level scan — but one level covers ~1e4 shards,
    *      i.e. ~40M docs, before the triangle matters.)
    * offset + within-shard cumsum == the global cumsum, long for long, so
    * the oracle SQL is unchanged.
    */
  val ChunkBudget = 2048L
  val ShardSize = 4096L

  def q50(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), text.tokenCount(col("text")).as("n_tokens"),
        (col("doc_id") / ShardSize).cast("long").as("shard"))
    val withinW = Window.partitionBy(col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumed = toks.withColumn("cum", sum(col("n_tokens")).over(withinW))
    // shard totals come FROM the windowed frame (a shard's total is its max
    // running sum), so both consumers branch after the window's
    // hash(shard) exchange and exchange reuse keeps ONE corpus
    // scan+tokenize — a groupBy off `toks` would plan its own partial-agg
    // exchange and replay the scan for the totals branch
    val totals = cumed.groupBy(col("shard"))
      .agg(max(col("cum")).as("shard_total"))
    val offsets = totals
      .join(broadcast(totals.select(col("shard").as("s2"),
        col("shard_total").as("t2"))), col("s2") < col("shard"), "left")
      .groupBy(col("shard"))
      .agg(coalesce(sum(col("t2")), lit(0L)).as("shard_offset"))
    cumed
      .join(broadcast(offsets), Seq("shard"))
      .withColumn("chunk_id",
        floor((col("shard_offset") + col("cum") - col("n_tokens"))
          / ChunkBudget).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("chunk_id"))
      .orderBy(col("doc_id"))
  }

  /** q69: overlapping token-window chunking — each doc split into windows of
    * `WindowSize` tokens advancing by `WindowStride` (50% overlap), the
    * boundary layout a RAG / long-context training pass feeds its encoder.
    * Pure per-row arithmetic + a node-local explode (no shuffle until the
    * final presentation sort): the chunk count derives from the token count,
    * so the fan-out never materializes text. Chunk count is
    * 1 + max(ceil((n - WindowSize) / WindowStride), 0) — the last window is
    * the FIRST one whose end reaches n, so every chunk contributes tokens no
    * earlier chunk covers (a ceil(n/stride) bound emits a final chunk that's
    * a strict subset of the penultimate one whenever n > stride). Docs with
    * zero tokens produce zero chunks (both engines drop them in the
    * unnest/explode).
    */
  val WindowSize = 512L
  val WindowStride = 256L

  def q69(spark: SparkSession, dir: String): DataFrame =
    chunkWindows(Tables.documents(spark, dir)
      .select(col("doc_id"), text.tokenCount(col("text")).as("n_tokens")))

  /** The q69 tiling over any (doc_id, n_tokens) frame — split out so specs
    * can drive it with planted multi-chunk token counts (the fixture docs
    * are all <= 1 window).
    */
  def chunkWindows(toks: DataFrame): DataFrame =
    toks
      .withColumn("chunk_idx", explode(when(col("n_tokens") > 0,
        sequence(lit(0L),
          greatest(ceil((col("n_tokens") - WindowSize).cast("double") / WindowStride)
            .cast("long"), lit(0L))))
        .otherwise(typedLit(Array.empty[Long]))))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * WindowStride).as("start_tok"),
        least(col("chunk_idx") * WindowStride + WindowSize, col("n_tokens"))
          .as("end_tok"))
      .withColumn("chunk_tokens", col("end_tok") - col("start_tok"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** q51: stratified deterministic sample — top-K docs per language ordered
    * by content hash (md5 of text, doc_id tie-break): reproducible across
    * runs/engines/cluster sizes, no RNG state, and identical texts sort
    * adjacently so duplicate content can't straddle the sample boundary
    * differently per run. One hash shuffle on the low-cardinality stratum
    * key.
    */
  val SamplePerLang = 50

  def q51(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(md5(col("text").cast("binary")), col("doc_id"))))
      .filter(col("rn") <= SamplePerLang)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("lang"), col("rn"))

  /** q57: benchmark decontamination — flag training documents whose word
    * 3-grams overlap the evaluation set's (every `EvalEvery`-th doc stands
    * in for the benchmark). The canonical pre-training leakage check:
    * contamination = fraction of a train doc's distinct 3-grams that occur
    * anywhere in the eval set.
    *
    * Scale shape: the eval gram set is broadcast — benchmarks are MB-scale
    * by construction while the train corpus is the 100 TB side, so this is
    * THE textbook broadcast join. Train grams explode node-locally (narrow)
    * and the only shuffle is the per-doc count aggregate, which partial-
    * aggregates map-side — gram strings never cross the wire. At corpus
    * scale the gram key would be xxhash64'd (q21's shingle machinery) to
    * make even the broadcast fixed-width.
    */
  val EvalEvery = 50L

  def decontaminate(docs: DataFrame, evalEvery: Long): DataFrame = {
    val grams = docs.select(col("doc_id"),
      array_distinct(graft.functions.expressions.textnative
        .wordNgrams(col("text"), 3)).as("g"))
    val evalGrams = grams.filter(col("doc_id") % evalEvery === 0)
      .select(explode(col("g")).as("gram")).distinct()
      .withColumn("hit", lit(1))
    grams.filter(col("doc_id") % evalEvery =!= 0)
      .select(col("doc_id"), size(col("g")).as("n_grams"),
        explode(col("g")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(col("hit")).as("n_contaminated"))
      .withColumn("contamination", col("n_contaminated") / col("n_grams"))
      .withColumn("is_contaminated", col("n_contaminated") > 0)
      .orderBy(col("doc_id"))
  }

  def q57(spark: SparkSession, dir: String): DataFrame =
    decontaminate(Tables.documents(spark, dir), EvalEvery)

  /** q66: Bloom-prescreened decontamination — q57's exact semantics behind a
    * Bloom-filter prescreen, the shape the leakage check takes when the
    * train side is 100 TB:
    *
    *   1. build ONE Bloom filter over the eval gram set (driver-side sketch
    *      state, ~150 KB of bits — model state like q39's centroids, not
    *      data);
    *   2. prescreen exploded train grams with the native
    *      `bloom.mightContain` predicate (codegen'd, hashes raw UTF-8
    *      bytes) — no false negatives, so nothing real is lost, and
    *      ~(1 - fpp) of non-overlapping grams never reach the join;
    *   3. exact broadcast join on the survivors removes the false
    *      positives; per-doc hit counts re-attach to the (narrow) doc list
    *      by a left join.
    *
    * Result is row-for-row IDENTICAL to q57 (same oracle SQL; equality also
    * asserted in PipelineSpec), but the join+aggregate input shrinks from
    * every-train-gram to bloom-survivors — at corpus scale the prescreen
    * discards the overwhelming share of rows before any wide operator sees
    * them. Costs one extra narrow corpus pass for the per-doc gram counts
    * (at 100 TB that column would come bucketed/persisted from the gram
    * build).
    *
    * If eval grams outgrow `BloomExpectedItems` the fpp degrades but
    * correctness does NOT (step 3 stays exact) — the filter only ever errs
    * toward letting more rows through.
    */
  val BloomExpectedItems = 1L << 17
  val BloomFpp = 0.01

  def q66(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir).select(col("doc_id"),
      array_distinct(graft.functions.expressions.textnative
        .wordNgrams(col("text"), 3)).as("g"))
    val evalGrams = grams.filter(col("doc_id") % EvalEvery === 0)
      .select(explode(col("g")).as("gram")).distinct()
    // own treeAggregate, not stat.bloomFilter: same inserts (putString hashes
    // the UTF-8 bytes the probe side reads), but with a real zero value, so
    // an EMPTY eval set yields an all-zeros filter instead of the stat
    // helper's null-buffer NPE (EmptyInputSpec runs every query on empty
    // tables). Bitset OR is order-independent — the filter is deterministic
    // under any partitioning/merge tree.
    import spark.implicits._
    val bf = evalGrams.as[String].rdd.treeAggregate(
      org.apache.spark.util.sketch.BloomFilter
        .create(BloomExpectedItems, BloomFpp))(
      (f, g) => { f.putString(g); f },
      (a, b) => { a.mergeInPlace(b); a })
    val train = grams.filter(col("doc_id") % EvalEvery =!= 0)
    val hits = train
      .select(col("doc_id"), explode(col("g")).as("gram"))
      .filter(graft.functions.expressions.bloom.mightContain(col("gram"), bf))
      .join(broadcast(evalGrams.withColumn("hit", lit(1))), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("hit")).as("n_contaminated"))
    train
      .select(col("doc_id"), size(col("g")).as("n_grams"))
      .filter(col("n_grams") > 0) // explode drops gram-less docs in q57 too
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination", col("n_contaminated") / col("n_grams"))
      .withColumn("is_contaminated", col("n_contaminated") > 0)
      .orderBy(col("doc_id"))
  }

  /** q59: language mixture weights — the sampling-weight table a
    * multilingual pre-training run feeds its data loader: per-language
    * token mass, its share, and a temperature-smoothed weight
    * sqrt(share)/Z (alpha = 0.5 upweights tail languages; sqrt specifically
    * because IEEE sqrt is correctly rounded in every engine, so the oracle
    * matches bit-for-bit where an arbitrary pow could drift an ulp). Z uses
    * the order-independent fixed-point sum for the same reason. One
    * aggregate over the corpus (language-keyed, partial map-side), then
    * arithmetic on the tiny per-language table — nothing here grows with
    * corpus size except the first groupBy.
    */
  def q59(spark: SparkSession, dir: String): DataFrame = {
    // Corpus total and Z as GLOBAL WINDOWS over the per-language aggregate:
    // aggregate branches (tot, z) would each replay the scan+tokenize
    // lineage — one full corpus pass per branch (measured: 8 scans / 16
    // tokenize projections in the branched plan). The single-partition
    // window exchange is safe here because the windowed frame is the
    // aggregate, bounded by language cardinality, never corpus-sized.
    val w = Window.partitionBy(lit(1))
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(text.tokenCount(col("text"))).as("n_tokens"))
      .withColumn("share",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
      .withColumn("sw", sqrt(col("share")))
      .withColumn("z",
        sum(graft.functions.num.fixed4(col("sw"))).over(w).cast("double")
          / lit(10000))
      // micro-unit integers, not round(x, 6): both engines compute identical
      // doubles up to here (exact longs → one division, one correctly-rounded
      // sqrt), but DECIMAL-style rounding of a double is engine/version-
      // dependent at the cut digit (r4 driver flagged a hash mismatch its
      // local DuckDB build didn't reproduce). floor(x * 1e6) is two more
      // correctly-rounded IEEE ops — bit-identical everywhere — and the hash
      // then compares BIGINTs, never floats.
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        floor(col("share") * lit(1000000)).cast("long").as("share_e6"),
        floor(col("sw") / col("z") * lit(1000000)).cast("long").as("weight_e6"))
      .orderBy(col("lang"))
  }

  /** q75: mixture-weight application — the sampler that closes q59's loop.
    * q59 computes the temperature-scaled target mixture (p_l ∝ √share_l);
    * q75 turns it into per-language keep rates and a deterministic per-doc
    * keep/drop verdict. Downsample-only: rate_l = c · p_l / share_l with c
    * chosen so the most under-represented language keeps everything
    * (max rate = 1) — upsampling is a repeat-factor at training time, not a
    * row operation here.
    *
    * The keep decision must be reproducible across engines and runs, so the
    * per-doc uniform is content-keyed, not RNG: the first 8 hex chars of
    * md5(doc_id) as a 32-bit integer, kept iff below floor(rate · 2^32).
    * Rates reuse q59's bit-identical arithmetic (exact longs → division →
    * correctly-rounded sqrt, fixed-point Z) so the oracle computes the SAME
    * doubles and therefore the same thresholds — the boundary doc cannot
    * flip between engines.
    *
    * Shape for 100 TB: one map-side-combinable per-language aggregate, a
    * language-cardinality window, a broadcast of the ~|languages| rate rows
    * back onto the corpus, and a per-row hash compare — no corpus shuffle
    * at all (the gate's orderBy is presentation).
    */
  def q75(spark: SparkSession, dir: String): DataFrame =
    mixtureSample(Tables.documents(spark, dir))

  /** The q75 core over any (doc_id, lang, text) frame — planted-corpus
    * specs run it directly.
    */
  def mixtureSample(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(lit(1))
    val rates = docs
      .groupBy(col("lang"))
      .agg(sum(text.tokenCount(col("text"))).as("n_tokens"))
      // a zero-token language has share 0, making ratio = sw/z/share a 0/0
      // whose result differs per engine (Spark Divide -> NULL, DuckDB ->
      // NaN/Inf) and would poison max(ratio); exclude it from the mixture
      // entirely (its docs carry no trainable tokens) — the oracle filters
      // identically, and the join then drops its docs in both engines
      .filter(col("n_tokens") > 0)
      .withColumn("share",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
      .withColumn("sw", sqrt(col("share")))
      .withColumn("z",
        sum(graft.functions.num.fixed4(col("sw"))).over(w).cast("double")
          / lit(10000))
      .withColumn("ratio", col("sw") / col("z") / col("share"))
      .withColumn("r", col("ratio") / max(col("ratio")).over(w))
      .select(col("lang"),
        floor(col("r") * lit(4294967296L)).cast("long").as("thr"),
        floor(col("r") * lit(1000000)).cast("long").as("rate_e6"))
    docs
      .join(broadcast(rates), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("rate_e6"),
        (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
          16, 10).cast("long") < col("thr")).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-wide line occurrence threshold: a line appearing this many
    * times or more is boilerplate and removed from EVERY document.
    */
  val LineDupAt = 2

  /** q80: line-level corpus dedup — the CCNet/RefinedWeb cleaning step
    * between doc-level dedup (q18/q76) and span profiling (q74): count each
    * LINE's occurrences corpus-wide and strip every occurrence of lines
    * appearing >= LineDupAt times (navigation chrome, cookie banners,
    * license boilerplate), reassembling the surviving lines in original
    * order. Unlike q74 (which profiles duplicated spans) this MUTATES the
    * corpus — the output is the cleaned text plus kept/total line counts.
    *
    * Shape for 100 TB: one explode + one line-keyed count shuffle + one
    * line-keyed join back + one doc-keyed reassembly shuffle. q80 keys the
    * count/join on the raw line STRING (the oracle's own key); q80b is the
    * production form — same plan, but the key is xxhash64(line), so the
    * count-side shuffle moves (int64, count) pairs instead of raw text and
    * the join compares fixed-width keys (line text rides only the
    * reassembly payload). The two are asserted row-identical in
    * PipelineSpec (collision odds at any realistic corpus: ~N²/2⁶⁴).
    * The fixture's docs are single-line, so the oracle row degenerates to
    * doc-level behavior (q61 precedent) — the multi-line semantics are
    * planted-corpus spec-checked.
    */
  def q80(spark: SparkSession, dir: String): DataFrame =
    lineDedup(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** q80b: the fixed-width-key production form of q80 — identical output,
    * 64-bit hash shuffle keys. Shares q80's oracle SQL verbatim (q66/q70
    * precedent for registered twins).
    */
  def q80b(spark: SparkSession, dir: String): DataFrame =
    lineDedupHashed(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** The q80 core over any (doc_id, text) frame — string-keyed (oracle
    * parity form).
    */
  def lineDedup(docs: DataFrame): DataFrame =
    lineDedupImpl(docs, hashedKey = false)

  /** q80b core: xxhash64(line) as the count/join key. */
  def lineDedupHashed(docs: DataFrame): DataFrame =
    lineDedupImpl(docs, hashedKey = true)

  private def lineDedupImpl(docs: DataFrame, hashedKey: Boolean): DataFrame = {
    val base = docs.select(col("doc_id"),
      split(col("text"), "\n", -1).as("ls"))
    val exploded = base.select(col("doc_id"),
      posexplode(col("ls")).as(Seq("idx", "line")))
    // "k" is the ONLY column the count agg needs: column pruning drops
    // doc_id/idx/line before the count shuffle, so the hashed form's
    // aggregation moves nothing but 8-byte keys
    val lines =
      if (hashedKey) exploded.withColumn("k", xxhash64(col("line")))
      else exploded.withColumn("k", col("line"))
    val counts = lines.groupBy(col("k"))
      .agg(count(lit(1)).as("c"))
    val kept = lines.join(counts, Seq("k"))
      .filter(col("c") < LineDupAt)
    val reassembled = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("idx"), col("line")))),
            p => p.getField("line")),
          "\n").as("cleaned"))
    // size() reads -1 on a null array (non-ANSI default) where the oracle's
    // len(string_split(NULL,...)) propagates NULL — guard so a null-text row
    // reports NULL n_lines on both engines (n_kept/cleaned coalesce to 0/''
    // either way: explode of NULL emits no line rows)
    base.select(col("doc_id"),
      when(col("ls").isNotNull, size(col("ls"))).as("n_lines"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
      .orderBy(col("doc_id"))
  }

  /** Shared oracle for q80 and its hashed-key twin q80b (identical output
    * by construction; the SQL keys on the line string, the only form DuckDB
    * can express).
    */
  val lineDedupOracleSql: String =
    s"""WITH raw AS (
      |  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
      |l AS (
      |  SELECT doc_id, unnest(ls) AS line,
      |    generate_subscripts(ls, 1) AS idx
      |  FROM raw),
      |c AS (SELECT line, COUNT(*) AS c FROM l GROUP BY line),
      |k AS (SELECT l.doc_id, l.idx, l.line
      |      FROM l JOIN c USING (line) WHERE c.c < $LineDupAt),
      |agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    string_agg(line, chr(10) ORDER BY idx) AS cleaned
      |  FROM k GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(len(string_split(d.text, chr(10))) AS INT) AS n_lines,
      |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
      |  coalesce(agg.cleaned, '') AS cleaned
      |FROM documents d LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q79: source-mix report — the per-source profile a curation run reviews
    * before training and feeds into per-source sampling decisions: doc
    * count, token mass and its corpus share, and the within-source exact-dup
    * rate (a high one flags a crawl that should be deduped or down-weighted
    * at the source level before anything touches the mixture). One
    * map-side-combinable aggregate over the corpus (distinct-md5 counted
    * per source via a two-level agg, not count(distinct) — the same partial
    * shape at 100 TB), then arithmetic on the source-cardinality table.
    * Fixed-point e6 integers for the ratios (q59's cross-engine rule: hash
    * BIGINTs, never floats).
    */
  def q79(spark: SparkSession, dir: String): DataFrame =
    sourceMix(Tables.documents(spark, dir))

  /** The q79 core over any (source, text) frame — planted-corpus specs run
    * it directly.
    */
  def sourceMix(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(lit(1))
    docs
      .select(col("source"), md5(col("text").cast("binary")).as("h"),
        text.tokenCount(col("text")).as("n_tokens"))
      // level 1: per (source, text-hash) — collapses exact copies and their
      // token mass map-side before anything source-wide aggregates
      .groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("copies"), sum(col("n_tokens")).as("tok"))
      // level 2: per source
      .groupBy(col("source"))
      .agg(sum(col("copies")).as("n_docs"),
        count(lit(1)).as("n_unique_texts"),
        sum(col("tok")).as("n_tokens"))
      .withColumn("token_share_e6",
        floor(col("n_tokens").cast("double") / sum(col("n_tokens")).over(w)
          * lit(1000000)).cast("long"))
      .withColumn("dup_ratio_e6",
        floor((col("n_docs") - col("n_unique_texts")).cast("double")
          / col("n_docs") * lit(1000000)).cast("long"))
      .select(col("source"), col("n_docs"), col("n_unique_texts"),
        col("n_tokens"), col("token_share_e6"), col("dup_ratio_e6"))
      .orderBy(col("source"))
  }

  /** q63: cleaned-corpus label profile — the post-cleaning sanity check a
    * curation run does before training: join the quality-filtered corpus
    * (q44's gates + content dedup) to its embedding labels and profile the
    * surviving class balance (doc count + mean length per label). The join
    * is corpus × corpus on the shared id — the shape the bucketed-table
    * tier (`sources/Bucketed`) exists for at 100 TB: both sides pre-
    * bucketed on the id join with no exchange; here the plain shuffle join
    * is the declared form.
    */
  def q63(spark: SparkSession, dir: String): DataFrame =
    corpusFilter(Tables.documents(spark, dir))
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label")),
        col("doc_id") === col("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"), avg(col("n_tokens")).as("avg_tokens"))
      .orderBy(col("label"))

  /** Shared oracle CTE for the q44 cleaning gates + dedup (q44 and q63). */
  private val cleanedCte =
    """WITH q AS (
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
      |  WHERE n_tokens >= 20 AND alpha_ratio >= 0.5 AND sw_ratio <= 0.5),
      |cleaned AS (SELECT doc_id, lang, n_tokens FROM f WHERE rn = 1)""".stripMargin

  /** Shared oracle for q57/q66 — both compute the same exact decontamination
    * result (q66's Bloom prescreen never drops a true hit and its verify
    * join removes the false positives).
    */
  private val decontOracleSql: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |                t -> t <> '') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS g
      |  FROM d),
      |ev AS (SELECT DISTINCT unnest(g) AS gram FROM g WHERE doc_id % $EvalEvery = 0),
      |tr AS (SELECT doc_id, CAST(len(g) AS INT) AS n_grams, unnest(g) AS gram
      |       FROM g WHERE doc_id % $EvalEvery <> 0)
      |SELECT tr.doc_id, tr.n_grams,
      |  COUNT(ev.gram) AS n_contaminated,
      |  COUNT(ev.gram) / tr.n_grams AS contamination,
      |  COUNT(ev.gram) > 0 AS is_contaminated
      |FROM tr LEFT JOIN ev ON tr.gram = ev.gram
      |GROUP BY tr.doc_id, tr.n_grams
      |ORDER BY doc_id""".stripMargin

  /** q97: corpus health report — the data-quality monitor a production
    * pipeline runs on every snapshot before (and after) curation: per
    * source plus a ROLLUP total, document count, null-text count,
    * exact-duplicate membership (docs whose md5(text) appears ≥2 anywhere
    * in the corpus — dup CLUSTERS cross sources, so the count is
    * corpus-keyed but reported per source), token and character mass, and
    * per-source language spread. Drift in any column between snapshots is
    * the first alarm for ingest regressions (a feed gone null, a mirror
    * double-ingested, a language filter silently off).
    *
    * Shape for 100 TB: one md5-keyed count (q18's fixed-width-key
    * discipline — texts never shuffle, the hash does), one join back on the
    * same key, then a rollup whose partial aggregates collapse to
    * |sources|+1 rows map-side. Null-text docs hash to NULL and are never
    * dup members (a missing payload is a null-rate fact, not a duplicate).
    */
  def q97(spark: SparkSession, dir: String): DataFrame =
    corpusHealth(Tables.documents(spark, dir))

  /** The q97 core over any documents-shaped frame — planted specs run it
    * directly.
    */
  def corpusHealth(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("lang"), col("n_chars"),
      col("text"), md5(col("text").cast("binary")).as("h"))
    val dupCounts = d.filter(col("h").isNotNull)
      .groupBy(col("h")).agg(count(lit(1)).as("hc"))
    d.join(dupCounts, Seq("h"), "left")
      .select(col("source"), col("lang"), col("n_chars"),
        when(col("text").isNull, 1L).otherwise(0L).as("nullt"),
        (coalesce(col("hc"), lit(0L)) >= 2).cast("long").as("isd"),
        // size(null) = -1 under Spark's legacy default — a null payload
        // must contribute 0 tokens, not subtract one
        when(col("text").isNull, lit(0L))
          .otherwise(text.tokenCount(col("text"))).as("nt"))
      .rollup(col("source"))
      .agg(
        grouping(col("source")).cast("int").as("g_src"),
        count(lit(1)).as("n_docs"),
        sum(col("nullt")).as("n_null_text"),
        sum(col("isd")).as("n_dup_docs"),
        coalesce(sum(col("nt")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
        count_distinct(col("lang")).as("n_langs"))
      .orderBy(col("g_src"), col("source").asc_nulls_first)
  }

  /** Output shards for the q100 training shuffle. Demo-sized; at 100 TB
    * this is ~10^5 (shard ≈ file ≈ a few GB), and nothing below depends on
    * the constant staying small.
    */
  val ShardCount = 64

  /** Shuffle-epoch salt: a new salt is a fresh deterministic permutation
    * (multi-epoch training reshuffles by bumping it).
    */
  val ShuffleSalt = "shuffle:1:"

  /** q100: training-shard assignment — the deterministic global shuffle a
    * pretraining run ends with: every curated doc gets a shard and a
    * position within it, keyed ONLY on md5(salt ‖ doc_id), so the
    * permutation is reproducible (a crashed writer re-runs to the same
    * bytes), re-seedable per epoch ([[ShuffleSalt]]), and independent of
    * input order and of text (null-text docs shuffle like any other — the
    * same class q87 defends). Output carries n_tokens so the shard
    * balance audit is one GROUP BY away.
    *
    * Shape for 100 TB: shard = md5 mod [[ShardCount]] gives one bounded
    * exchange (uniform by construction — no hot shard exists to salt);
    * position is a SHARD-LOCAL sort (each task orders its own ~n/shards
    * rows) — never a global ORDER BY through one partition, which is how
    * naive "shuffle the corpus" jobs die at scale. The writer composes as
    * repartition(shard) + sortWithinPartitions(sk) + partitioned parquet
    * (the `sources/PartitionedParquet` sink), making shard files whose
    * ON-DISK row order IS the training order.
    */
  def q100(spark: SparkSession, dir: String): DataFrame =
    trainShards(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** The q100 core over any (doc_id, text) frame — the model spec runs it
    * directly.
    */
  def trainShards(docs: DataFrame): DataFrame = {
    val keyed = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        // null text = 0 trainable tokens (q97's accounting), NOT the
        // legacy size(null) = -1 the bare tokenCount yields under ANSI-off
        when(col("text").isNull, lit(0L))
          .otherwise(text.tokenCount(col("text"))).as("n_tokens"),
        md5(concat(lit(ShuffleSalt), col("doc_id").cast("string"))
          .cast("binary")).as("sk"))
      .withColumn("shard",
        pmod(conv(substring(col("sk"), 1, 8), 16, 10).cast("long"),
          lit(ShardCount.toLong)).cast("int"))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("sk"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Per-batch token budget for q115: every batch pads its members to the
    * bucket cap, so budget/cap sequences per batch keeps the padded token
    * count constant across buckets — the property that makes bucketed
    * batching GPU-shape-stable.
    */
  val BatchTokenBudget = 8192L

  /** q115's bucket caps: powers of two from the short-doc floor to the
    * training context length; docs past the last cap truncate at train
    * time (pad 0 by [[lengthBucketBatches]]'s least()).
    */
  val BucketCaps: Seq[Long] = Seq(64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L)

  /** q115: length-bucketed batch assembly — the padding-efficiency layout
    * a training dataloader wants (batching by similar sequence length so
    * pad-to-max waste stays small, the dynamic-batching idiom): each doc
    * takes the smallest power-of-two bucket cap ≥ its token count, shuffles
    * deterministically within its (shard, bucket) cell by q100's salted
    * md5 key, and lands in a fixed-budget batch ([[BatchTokenBudget]] /
    * cap sequences per batch — constant padded tokens per batch at every
    * cap). Reported per doc: bucket, batch index, position, and the pad
    * tokens its batch slot wastes — Σpad is the number the layout exists
    * to minimize, and the bucket histogram is the dataloader's shape plan.
    *
    * Composes with q100: shard here IS q100's training shard (same salt,
    * same md5 draw), so batch numbering is SHARD-LOCAL — the q89/q100
    * lesson: never a corpus-wide rank through one partition; every window
    * partition is a md5-uniform 1/[[ShardCount]] slice × one bucket.
    * Epoch reseed = bump [[ShuffleSalt]], exactly as q100. Null text = 0
    * tokens (q97's accounting), bucketed at the floor cap.
    */
  def q115(spark: SparkSession, dir: String): DataFrame =
    lengthBucketBatches(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** The q115 core over any (doc_id, text) frame — specs run it directly.
    * A frame that already carries `n_tokens` (the q115b computed-vocab
    * twin) is used as-is; otherwise counts come from the q35 tokenizer.
    */
  def lengthBucketBatches(docs: DataFrame): DataFrame = {
    val counted =
      if (docs.columns.contains("n_tokens")) docs
      else docs.select(col("doc_id"),
        when(col("text").isNull, lit(0L))
          .otherwise(text.tokenCount(col("text"))).as("n_tokens"))
    val keyed = counted.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("n_tokens"),
        md5(concat(lit(ShuffleSalt), col("doc_id").cast("string"))
          .cast("binary")).as("sk"))
      .withColumn("shard",
        pmod(conv(substring(col("sk"), 1, 8), 16, 10).cast("long"),
          lit(ShardCount.toLong)).cast("int"))
    // smallest cap >= n: an explicit integer CASE chain, never float log2
    // (log2(2^k) exactness is not a cross-engine contract)
    val bucket = BucketCaps.init.reverse.foldLeft(lit(BucketCaps.last)) {
      case (acc, cap) =>
        when(col("n_tokens") <= cap, lit(cap)).otherwise(acc)
    }
    val ranked = keyed.withColumn("bucket", bucket)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("shard"), col("bucket"))
          .orderBy(col("sk"), col("doc_id"))))
    val bsz = (lit(BatchTokenBudget) / col("bucket")).cast("long")
    ranked.select(col("doc_id"), col("n_tokens"), col("shard"), col("bucket"),
      floor((col("rn") - 1).cast("double") / bsz).cast("int").as("batch_idx"),
      pmod(col("rn") - 1, bsz).cast("int").as("pos"),
      (col("bucket") - least(col("n_tokens"), col("bucket")))
        .cast("long").as("pad_tokens"))
      .orderBy(col("shard"), col("bucket"), col("batch_idx"), col("pos"))
  }

  /** q115b (VERDICT r16 #6): q115's layout under the LEARNED vocabulary —
    * q140's computed subword counts replace the q35 whitespace-ish proxy
    * as the budgeted quantity. Same bucketing, same shard draw, same batch
    * arithmetic; what changes is what a "token" is, which is exactly what
    * a dataloader that trained the tokenizer itself would budget with.
    */
  def q115b(spark: SparkSession, dir: String): DataFrame =
    lengthBucketBatches(TextAnalysis.bpeDocTokenCounts(spark, dir))

  /** q124b: q124's packing under the learned vocab (see q115b). */
  def q124b(spark: SparkSession, dir: String): DataFrame =
    packSequences(TextAnalysis.bpeDocTokenCounts(spark, dir))

  /** q135b: q135's budget selection with computed-vocab token costs; the
    * classifier score that RANKS docs is unchanged (see tokenBudgetSelect).
    */
  def q135b(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetSelect(
      Tables.documents(spark, dir).filter(col("doc_id").isNotNull),
      BudgetPct, Some(TextAnalysis.bpeDocTokenCounts(spark, dir)))

  /** The proxy-count `k` CTE (q100's md5 draw + q35 tokenizer counts) —
    * the prelude the q115/q124 oracles always used, now shared with the
    * computed-vocab twins' tails.
    */
  private def proxyCountKCte: String =
    s"""WITH k AS (
    |  SELECT doc_id,
    |    COALESCE(CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
    |                                  t -> t <> '')) AS BIGINT), 0) AS n_tokens,
    |    md5('$ShuffleSalt' || CAST(doc_id AS VARCHAR)) AS sk
    |  FROM documents WHERE doc_id IS NOT NULL)""".stripMargin

  /** The computed-vocab `k` CTE: the q139 learn chain + per-doc counts
    * (TextAnalysis.bpeDocCountsCtes), same md5 draw.
    */
  private def bpeCountKCte: String =
    s"""${TextAnalysis.bpeDocCountsCtes(TextAnalysis.BpeSteps)},
    |k AS (
    |  SELECT d.doc_id, CAST(COALESCE(bc.n_tokens, 0) AS BIGINT) AS n_tokens,
    |    md5('$ShuffleSalt' || CAST(d.doc_id AS VARCHAR)) AS sk
    |  FROM documents d LEFT JOIN bpe_counts bc USING (doc_id)
    |  WHERE d.doc_id IS NOT NULL)""".stripMargin

  /** q115's oracle over any `k(doc_id, n_tokens, sk)` prelude. */
  private def lengthBucketsOracleTail(prelude: String): String = {
    val caseChain = BucketCaps.init
      .map(c => s"WHEN n_tokens <= $c THEN $c").mkString(" ") +
      s" ELSE ${BucketCaps.last}"
    s"""$prelude,
    |s AS (SELECT *,
    |    CAST(CAST('0x' || substr(sk, 1, 8) AS BIGINT) % $ShardCount
    |      AS INTEGER) AS shard,
    |    CAST(CASE $caseChain END AS BIGINT) AS bucket
    |  FROM k),
    |r AS (SELECT *, row_number() OVER (
    |    PARTITION BY shard, bucket ORDER BY sk, doc_id) AS rn FROM s)
    |SELECT doc_id, n_tokens, shard, bucket,
    |  CAST((rn - 1) // ($BatchTokenBudget // bucket) AS INTEGER)
    |    AS batch_idx,
    |  CAST((rn - 1) % ($BatchTokenBudget // bucket) AS INTEGER) AS pos,
    |  CAST(bucket - least(n_tokens, bucket) AS BIGINT) AS pad_tokens
    |FROM r ORDER BY shard, bucket, batch_idx, pos""".stripMargin
  }

  /** q135's oracle: `prelude` opens the WITH chain ("WITH" for the base,
    * the learned-BPE CTE block + "," for the twin); `perCte` supplies
    * per(doc_id, n_tokens, score_milli). Score CTEs are shared verbatim.
    */
  private def tokenBudgetOracleTail(prelude: String, perCte: String): String =
    s"""$prelude t0 AS (
    |  SELECT doc_id,
    |    unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
    |                       t -> t <> '')) AS tok
    |  FROM documents WHERE doc_id IS NOT NULL),
    |w AS (
    |  SELECT doc_id,
    |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 2001 - 1000 AS w
    |  FROM t0),
    |per0 AS (SELECT doc_id, COUNT(*) AS n, SUM(w) AS s FROM w
    |         GROUP BY doc_id),
    |$perCte,
    |tot AS (SELECT CAST(coalesce(SUM(n_tokens), 0) AS BIGINT) AS total
    |        FROM per),
    |r AS (
    |  SELECT doc_id, score_milli, n_tokens,
    |    CAST(SUM(n_tokens) OVER (ORDER BY score_milli DESC, doc_id)
    |      AS BIGINT) AS cum_tokens
    |  FROM per)
    |SELECT doc_id, score_milli, n_tokens, cum_tokens
    |FROM r CROSS JOIN tot
    |WHERE cum_tokens <= (total * $BudgetPct) // 100
    |ORDER BY doc_id""".stripMargin

  /** q124's oracle over any `k` prelude (prelude must carry RECURSIVE). */
  private def seqPackOracleTail(prelude: String): String =
    s"""$prelude,
    |o AS (SELECT doc_id, n_tokens, sk,
    |    CAST(CAST('0x' || substr(sk, 1, 8) AS BIGINT) % $ShardCount
    |      AS INTEGER) AS shard,
    |    least(n_tokens, $SeqTokenBudget) AS cost
    |  FROM k),
    |r AS (SELECT *, row_number() OVER (
    |    PARTITION BY shard ORDER BY sk, doc_id) AS rn FROM o),
    |rec AS (
    |  SELECT shard, rn, doc_id, cost, n_tokens,
    |    0 AS seq_idx, CAST(0 AS BIGINT) AS seq_off
    |  FROM r WHERE rn = 1
    |  UNION ALL
    |  SELECT r.shard, r.rn, r.doc_id, r.cost, r.n_tokens,
    |    CASE WHEN p.seq_off + p.cost + r.cost <= $SeqTokenBudget
    |      THEN p.seq_idx ELSE p.seq_idx + 1 END,
    |    CASE WHEN p.seq_off + p.cost + r.cost <= $SeqTokenBudget
    |      THEN p.seq_off + p.cost ELSE CAST(0 AS BIGINT) END
    |  FROM rec p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
    |SELECT doc_id, shard, CAST(seq_idx AS INTEGER) AS seq_idx,
    |  seq_off, cost, (n_tokens > $SeqTokenBudget) AS truncated
    |FROM rec ORDER BY shard, seq_idx, seq_off, doc_id""".stripMargin

  /** Per-sequence token budget for q124: the training context length the
    * packer fills. Docs past it truncate to exactly one full sequence
    * (q115's least() truncation rule applied at the packing tier).
    */
  val SeqTokenBudget = 2048L

  /** q124: training-sequence packing — the step AFTER q100's shuffle and
    * q115's bucketing in a real dataloader: short documents are
    * CONCATENATED into fixed-[[SeqTokenBudget]] training sequences
    * (the T5/GPT "example packing" idiom — pad waste goes to the tail of
    * each sequence instead of every row), next-fit in q100's training
    * order: walk each shard's salted-md5 order once, append a doc while
    * it fits, else seal the sequence and open the next. Reported per doc:
    * the sequence it lands in, its token offset inside it, its packed
    * cost (truncated docs pay exactly one full sequence), so Σ(budget −
    * seq fill) over sealed sequences — the pad the packer exists to
    * minimize — is one GROUP BY away.
    *
    * Shape for 100 TB: packing is inherently sequential — the ORDER
    * INSIDE a shard is the state — so the parallel unit is the shard,
    * exactly like q100's writer (~10^5 shards at real scale): one bounded
    * exchange on shard of (id, key, count) rows ONLY (text never
    * shuffles), then a per-partition STREAMING walk (sortWithinPartitions
    * + mapPartitions, O(1) state: current fill + sequence index, reset on
    * shard change) — never a corpus-wide window, never a driver loop, and
    * the typed walk carries no doubles so the q117 hash-safety rule is
    * trivially met (every output column is integer arithmetic over
    * integer inputs).
    */
  def q124(spark: SparkSession, dir: String): DataFrame =
    packSequences(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** The q124 core over any (doc_id, text) frame — specs run it directly.
    * A frame already carrying `n_tokens` (q124b) is used as-is.
    */
  def packSequences(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counted =
      if (docs.columns.contains("n_tokens")) docs
      else docs.select(col("doc_id"),
        when(col("text").isNull, lit(0L))
          .otherwise(text.tokenCount(col("text"))).as("n_tokens"))
    val keyed = counted.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("n_tokens"),
        md5(concat(lit(ShuffleSalt), col("doc_id").cast("string"))
          .cast("binary")).as("sk"))
      .withColumn("shard",
        pmod(conv(substring(col("sk"), 1, 8), 16, 10).cast("long"),
          lit(ShardCount.toLong)).cast("int"))
      .withColumn("cost", least(col("n_tokens"), lit(SeqTokenBudget)))
    val walked = keyed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("sk"), col("doc_id"))
      .select(col("doc_id"), col("shard"), col("cost"), col("n_tokens"))
      .as[(Long, Int, Long, Long)]
      .mapPartitions { it =>
        // O(1) state per partition; a partition may hold several whole
        // shards (sorted shard-first), so state resets on shard change
        var curShard = -1; var seq = 0; var fill = 0L
        it.map { case (id, sh, c, nt) =>
          if (sh != curShard) { curShard = sh; seq = 0; fill = 0L }
          else if (fill + c > SeqTokenBudget) { seq += 1; fill = 0L }
          val off = fill
          fill += c
          (id, sh, seq, off, c, nt > SeqTokenBudget)
        }
      }
      .toDF("doc_id", "shard", "seq_idx", "seq_off", "cost", "truncated")
    walked.orderBy(col("shard"), col("seq_idx"), col("seq_off"), col("doc_id"))
  }

  /** q120's anchor-batch size: the registered exact form scores a FIXED
    * number of anchors per run (the md5-lowest pair-members — a uniform
    * deterministic batch, q89's draw idiom), so its cost is
    * cap × corpus — LINEAR like q20's fixed probes, not the growing
    * %-stride quadratic the q82/q92 anchors accept (measured before this
    * cap existed: ×149 at ×10 data; with it the probe side is constant).
    * A real training run wants ALL anchors — that is q92b's IVF
    * generator, which takes the full set because probes explode to cells
    * instead of broadcasting.
    */
  val ContrastiveAnchorCap = 200

  /** Negatives per anchor. */
  val ContrastiveNegK = 3

  /** q120: contrastive training-pair construction — the dataset-building
    * step of a retrieval/embedding training run (SimCSE-supervised /
    * DPR-style batches): for each anchor document that has a text-space
    * near-duplicate (a q21 pair at the 0.8 Jaccard bar — the "naturally
    * occurring positive"), emit the positive (min-id partner) plus the
    * top-[[ContrastiveNegK]] HARD negatives from q92's rank-and-gate tail
    * (most-similar different-label vectors below the dup-suspect
    * ceiling). Composes the two spaces deliberately: positives come from
    * TEXT overlap (cheap, high precision), negatives from EMBEDDING
    * similarity (where hard negatives live).
    *
    * Anchors are a FIXED-SIZE md5-lowest batch
    * ([[ContrastiveAnchorCap]]) so the exact form's cost is cap × corpus
    * — linear at any scale (see the constant's doc for the measured
    * failure of the stride it replaced); the production candidate
    * generator is q92b's IVF tail, which takes the full anchor set
    * because probes explode to cells instead of broadcasting. Anchors
    * without an embedding are dropped (no vector, no negatives —
    * unusable for contrastive training); anchors whose negatives all
    * fail the gates fan back with a null negative (the pair is still a
    * positive-only training example).
    */
  def q120(spark: SparkSession, dir: String): DataFrame =
    contrastivePairs(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("label"),
          graft.functions.vectors.toDouble(col("embedding")).as("v"))
        .filter(col("v").isNotNull))

  /** The q120 core over (doc_id, text) docs and (id, label, v) embeddings
    * — planted specs run it directly.
    */
  def contrastivePairs(docs: DataFrame, emb: DataFrame): DataFrame = {
    val pairs = Dedup.nearDupPairsUnsorted(docs, 0.8)
      .select(col("a_id"), col("b_id")).localCheckpoint()
    val pos = pairs
      .select(col("a_id").as("anchor_id"), col("b_id").as("partner"))
      .union(pairs.select(col("b_id"), col("a_id")))
      .groupBy(col("anchor_id")).agg(min(col("partner")).as("positive_id"))
      // bounded batch: md5-lowest anchors (TakeOrdered, never a stride
      // whose probe count grows with the corpus)
      .orderBy(md5(col("anchor_id").cast("string").cast("binary")),
        col("anchor_id"))
      .limit(ContrastiveAnchorCap)
    val aEmb = emb.join(pos.select(col("anchor_id").as("id")), Seq("id"))
    val negs = Similarity.hardNegatives(aEmb, emb, ContrastiveNegK)
      .withColumnRenamed("probe_id", "anchor_id")
    pos.join(emb.select(col("id").as("anchor_id")), Seq("anchor_id"))
      .join(negs, Seq("anchor_id"), "left")
      .select(col("anchor_id"), col("positive_id"),
        col("rnk").as("neg_rank"), col("cand_id").as("negative_id"),
        col("cosine").as("neg_cosine"))
      .orderBy(col("anchor_id"), col("neg_rank"))
  }

  /** q105's "this crawl's new arrivals" slice: docs with
    * doc_id % DriftHoldout == DriftHoldout − 1 are absent from the
    * previous snapshot — a deterministic 10% stand-in for an incremental
    * crawl, the same bounded-slice idiom as q82/q92/q99's probe strides.
    */
  val DriftHoldout = 10L

  /** q105: curation snapshot drift report — the between-runs diff every
    * periodically-recrawled corpus needs: for each document of the current
    * snapshot, its curation fate NOW vs its fate in the PREVIOUS snapshot
    * (quality gates + exact-dedup keeper — the funnel's deterministic
    * prefix), and the churn class: `arrived` (not in the previous crawl),
    * `stable` (same fate), `changed`. The non-obvious churn this surfaces
    * is REGRADING: a document that was its duplicate-cluster's keeper can
    * LOSE keeper status when a new lower-id copy arrives — its training
    * data disappears without its content changing, which is invisible to
    * any single-snapshot report (q97 included) and is exactly the diff a
    * "why did my corpus shrink" investigation starts from.
    *
    * Shape for 100 TB: two quality passes + two md5-keyed rank exchanges
    * + one id-keyed diff join, all linear; in production the previous
    * side is the prior run's persisted `doc_fates/` artifact (CurationRun
    * writes it), collapsing this to ONE pass + one join — the registered
    * form recomputes both sides from one table so the whole diff is
    * hash-checkable.
    */
  def q105(spark: SparkSession, dir: String): DataFrame =
    snapshotDrift(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** The q105 core over any (doc_id, text) frame — planted specs run it
    * directly.
    */
  def snapshotDrift(docs: DataFrame): DataFrame = {
    val d = docs.filter(col("doc_id").isNotNull)
    fateDrift(
      snapshotFates(
        d.filter(col("doc_id") % DriftHoldout =!= DriftHoldout - 1)),
      snapshotFates(d))
  }

  /** The between-runs diff tail over any prev/cur (doc_id, fate) frames —
    * the collapse q105's scaladoc promises, now a real code path: the
    * registered q105 feeds it two slice-derived fate sets (so the whole
    * diff is hash-checkable from one table), while `CurationRun
    * --prev-run` feeds it the PRIOR RUN'S persisted `verdicts/doc_fates/`
    * against the current run's — one id-keyed FULL-OUTER join, no
    * recomputation of the previous side. Status: `arrived` (absent from
    * prev), `departed` (absent from cur — a crawl losing a source is
    * exactly the event this artifact must surface; a cur-sided left join
    * would silently drop it), `stable` (same fate), `changed` (incl. the
    * regraded-keeper case the q105 doc describes). q105's slice form has
    * prev ⊆ cur by construction, so its oracle hash is unaffected by the
    * departed branch.
    */
  def fateDrift(prev: DataFrame, cur: DataFrame): DataFrame =
    cur.select(col("doc_id"), col("fate").as("cur_fate"))
      .join(prev.select(col("doc_id"), col("fate").as("prev_fate")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("prev_fate"), col("cur_fate"),
        when(col("prev_fate").isNull, lit("arrived"))
          .when(col("cur_fate").isNull, lit("departed"))
          .when(col("prev_fate") === col("cur_fate"), lit("stable"))
          .otherwise(lit("changed")).as("status"))
      .orderBy(col("doc_id"))

  /** Per-doc fate under the funnel's deterministic prefix (q44's quality
    * gates, then min-id exact-dedup keeper AMONG the snapshot's quality
    * survivors): `kept` | `dup_loser` | `quality_dropped`. Ranks are
    * snapshot-local by construction — a doc's fate depends only on the
    * docs present in ITS snapshot, which is what makes the q105 diff
    * meaningful.
    */
  private def snapshotFates(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), col("text"),
      text.tokenCount(col("text")).as("n_tokens"),
      text.alphaRatio(col("text")).as("alpha_ratio"),
      text.tokenSetRatio(col("text"), text.stopwords("en")).as("sw_ratio"))
    val surv = scored
      .filter(col("n_tokens") >= 20 &&
        col("alpha_ratio") >= 0.5 && col("sw_ratio") <= 0.5)
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text").cast("binary")))
          .orderBy(col("doc_id"))))
      .select(col("doc_id"),
        when(col("rn") === 1, lit("kept")).otherwise(lit("dup_loser"))
          .as("fate"))
    scored.select(col("doc_id"))
      .join(surv, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("fate"), lit("quality_dropped")).as("fate"))
  }

  /** One snapshot's fate subquery for the q105 oracle: quality gates from
    * the shared q44 expressions, keeper rank among that snapshot's
    * survivors only.
    */
  private def driftFatesSql(pred: String): String =
    s"""SELECT d.doc_id, coalesce(s.fate, 'quality_dropped') AS fate
       |  FROM (SELECT doc_id FROM qq WHERE $pred) d
       |  LEFT JOIN (
       |    SELECT doc_id,
       |      CASE WHEN row_number() OVER (
       |          PARTITION BY md5(text) ORDER BY doc_id) = 1
       |        THEN 'kept' ELSE 'dup_loser' END AS fate
       |    FROM qq
       |    WHERE ($pred) AND n_tokens >= 20
       |      AND alpha_ratio >= 0.5 AND sw_ratio <= 0.5) s
       |  USING (doc_id)""".stripMargin

  // ---- token-budget data selection (q135) -----------------------------------

  /** Share of the corpus token mass q135 selects, in percent. */
  val BudgetPct = 30L

  /** Score-bucket width for q135's two-phase cumulative sum — buckets are
    * floor(score_milli / width), so the bucket id is monotone in the score
    * and equal scores can never straddle a bucket boundary.
    */
  val BudgetBucketWidth = 1024.0

  /** q135: token-budget data selection — "spend a budget of B tokens on
    * the best-scoring documents": rank the corpus by the q94 quality
    * classifier (score DESC, doc_id), walk down accumulating token mass,
    * keep every document whose inclusive cumulative count fits inside
    * B = [[BudgetPct]]% of the corpus total. This is the DataComp/DsDm
    * selection step — a compute budget fixes how many tokens will be
    * trained on, and the curation job must pick WHICH tokens — distinct
    * from q50 (packs everything in doc_id order) and q75/q51 (sample at
    * rates, no global ordering).
    *
    * The global ordered cumsum is TWO-PHASE so it never funnels one
    * partition (q50's argument, by score instead of doc_id):
    *   1. bucket = floor(score_milli / [[BudgetBucketWidth]]) — monotone in
    *      score, so bucket order == score order and within-bucket windows
    *      partition by bucket;
    *   2. each bucket's offset = token mass of strictly-better buckets,
    *      computed on the tiny per-bucket aggregate via a broadcast
    *      triangular join — no single-partition exchange anywhere.
    * offset + within-bucket cumsum == the global cumsum long for long, so
    * the oracle states the plain global window.
    *
    * Determinism: scores and token counts are q94's exact integers; the
    * budget is exact BIGINT division ((total × pct) DIV 100, matching the
    * oracle's `//` at any magnitude); the window order (score DESC,
    * doc_id) is total. Every output column is an exact BIGINT.
    */
  def q135(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetSelect(
      Tables.documents(spark, dir).filter(col("doc_id").isNotNull),
      BudgetPct)

  /** The q135 core over any documents-shaped frame — planted specs drive
    * it with known scores/token counts and compare against the one-window
    * form.
    *
    * Parallelism note (why THREE levels, not q50's two): the score RANGE
    * does not grow with the corpus — bucket count stays ~O(range/width)
    * while the corpus scales, so a bucket-partitioned row window would cap
    * parallelism at ~#buckets tasks of n/#buckets rows (and a single hot
    * score — every empty doc scores 0 — would funnel one task). Cells are
    * therefore keyed by (EXACT score, doc-id shard): within a cell all
    * rows share the score, so doc_id order is the total order and the
    * shard bound caps every row-level window partition at [[ShardSize]]
    * rows no matter the corpus or the score distribution. Cell offsets are
    * windowed over the CELL AGGREGATE (tiny rows), bucket offsets over the
    * bucket aggregate via the broadcast triangle — the q50 ladder, one
    * level deeper.
    */
  def tokenBudgetSelect(docs: DataFrame, budgetPct: Long,
      tokenCounts: Option[DataFrame] = None): DataFrame = {
    // q135b swaps ONLY the budgeted quantity (computed-vocab counts join
    // in by doc_id); the classifier score that ranks docs is unchanged.
    // `per` feeds FOUR independent subtrees of the final plan (budget agg,
    // cells -> cellTotals -> bucket ladder, cellOffsets, and the final
    // join back) — unmaterialized, each consumer re-executed the whole
    // classifier token-explode scoring pass (r18 baseline plan: the
    // documents scan appeared 10x in q135, 21x in q135b with the BPE
    // chain upstream). localCheckpoint is the q88/q78 lesson applied here:
    // one scoring pass, every consumer re-reads materialized partitions.
    val per = (tokenCounts match {
      case None => TextAnalysis.classifierScoresUnsorted(docs)
        .select(col("doc_id"), col("n_tokens"), col("score_milli"))
      case Some(tc) => TextAnalysis.classifierScoresUnsorted(docs)
        .select(col("doc_id"), col("score_milli"))
        .join(tc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          col("score_milli"))
    }).localCheckpoint()
    // budget = (total × pct) DIV 100: exact BIGINT division (non-negative
    // operands, so truncation == floor) — matches the oracle's `//` at ANY
    // corpus magnitude, where a double quotient could cross an integer
    // boundary once total×pct exceeds ~9e13 (ULP > 0.02). One row,
    // broadcast — never a driver-side collect.
    val budget = per.agg(coalesce(sum(col("n_tokens")), lit(0L)).as("total"))
      .select(expr(s"total * $budgetPct DIV 100").cast("long").as("budget"))
    val cells = per
      .withColumn("bucket",
        floor(col("score_milli").cast("double") / lit(BudgetBucketWidth))
          .cast("long"))
      // truncation == floor for the non-negative ids every fixture and
      // ingest contract carries; shard must stay monotone in doc_id so
      // within-score cell order equals doc_id order
      .withColumn("shard", (col("doc_id") / lit(ShardSize)).cast("long"))
    // level 1 aggregate: one row per (score, shard) cell
    val cellTotals = cells
      .groupBy(col("bucket"), col("score_milli"), col("shard"))
      .agg(sum(col("n_tokens")).as("ct"))
    val bucketTotals = cellTotals.groupBy(col("bucket"))
      .agg(sum(col("ct")).as("bt"))
    // level 3: strictly-better-bucket mass via the broadcast triangle on
    // the tiny bucket aggregate (the q50 offset idiom)
    val bucketOffsets = bucketTotals.select(col("bucket"))
      .join(broadcast(bucketTotals.select(col("bucket").as("b2"),
        col("bt"))), col("b2") > col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("bt")), lit(0L)).as("boff"))
    // level 2: strictly-before-cell mass WITHIN the bucket, windowed over
    // cell-aggregate rows (corpus/ShardSize rows total, not corpus rows)
    val cellOffsets = cellTotals
      .withColumn("coff", coalesce(sum(col("ct")).over(
        Window.partitionBy(col("bucket"))
          .orderBy(col("score_milli").desc, col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(bucketOffsets), Seq("bucket"))
      .select(col("score_milli"), col("shard"),
        (col("boff") + col("coff")).as("off"))
    // level 1: within-cell running sum — every partition ≤ ShardSize rows
    // of one score, where doc_id order IS the global order
    cells.join(cellOffsets, Seq("score_milli", "shard"))
      .withColumn("cum_tokens", col("off") + sum(col("n_tokens")).over(
        Window.partitionBy(col("score_milli"), col("shard"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("doc_id"), col("score_milli"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  // ---- weighted priority sampling (q137) -------------------------------------

  /** Per-source sample size for q137. */
  val PrioritySampleK = 16

  /** Scale of the deterministic uniform draw behind q137's priorities:
    * u ∈ [1, 2^28], so priority = (w << 28) / u stays in BIGINT range for
    * token weights up to ~2^34.
    */
  val PriorityScale = 1L << 28

  /** q137: weighted priority sampling (Duffield–Lund–Thorup) — per source,
    * draw [[PrioritySampleK]] documents with probability increasing in
    * token weight, plus the estimator weights that make the sample usable
    * for UNBIASED subset-sum estimates (Σŵ over any sampled subset
    * estimates that subset's true token mass). priority = w/u with u
    * uniform; the k highest priorities are the sample; τ = the (k+1)-th
    * priority; ŵ = max(w, τ). This is the statistically-correct way to
    * "inspect 16 docs per source, weighted by size" — what q89 (unweighted
    * cap) and q51 (fixed-rate strata) cannot give: per-stratum estimates
    * with provable variance optimality (Szegedy '05: priority sampling is
    * within a factor 1+o(1) of the optimal k+1 variance).
    *
    * Determinism: u = (md5(doc_id)[1..7] as int) + 1 ∈ [1, 2^28] — the q94
    * hash-derived-randomness idiom — and priority = (w × 2^28) DIV u is
    * exact BIGINT division in both engines (non-negative operands, so
    * truncation == floor). Ties break by doc_id; every output column is an
    * exact integer.
    *
    * Shape for 100 TB: the per-source top-(k+1) is TWO-PHASE like q89 — a
    * salted local rank bounds every task at (k+1)×[[CapSaltBuckets]] rows
    * per source before the global rank, so a source holding half the
    * corpus never funnels one task. τ rides the same ranked frame (the
    * rnk = k+1 row), and the sample itself is k rows per source.
    */
  def q137(spark: SparkSession, dir: String): DataFrame =
    prioritySample(
      Tables.documents(spark, dir)
        .filter(col("doc_id").isNotNull && col("source").isNotNull),
      PrioritySampleK)

  /** The q137 core over any documents-shaped frame — planted specs drive
    * it with crafted weights and check the τ/ŵ mechanics directly.
    */
  def prioritySample(docs: DataFrame, k: Int): DataFrame = {
    val pr = docs
      .select(col("doc_id"), col("source"),
        greatest(coalesce(text.tokenCount(col("text")), lit(0L)), lit(1L))
          .as("w"))
      .withColumn("u",
        conv(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 7), 16, 10).cast("long") + lit(1L))
      .withColumn("priority",
        expr(s"w * $PriorityScale DIV u"))
    // phase 1: salted local top-(k+1) bounds every task; phase 2: global
    // rank over the survivors (≤ (k+1)×CapSaltBuckets rows per source)
    val local = pr
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(CapSaltBuckets)))
      .withColumn("lrn", row_number().over(
        Window.partitionBy(col("source"), col("salt"))
          .orderBy(col("priority").desc, col("doc_id"))))
      .filter(col("lrn") <= k + 1)
    val ranked = local
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("priority").desc, col("doc_id"))))
      .filter(col("rnk") <= k + 1)
    val tau = ranked.filter(col("rnk") === k + 1)
      .select(col("source"), col("priority").as("tau"))
    ranked.filter(col("rnk") <= k)
      .join(broadcast(tau), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("w"), col("priority"),
        col("rnk"),
        greatest(col("w"), coalesce(col("tau"), lit(0L))).as("w_hat"))
      .orderBy(col("doc_id"))
  }

  /** q138: priority-sample subset-sum estimation — q137's estimator put to
    * work: estimate each LANGUAGE's token mass from the per-SOURCE
    * priority samples (Σŵ over sampled docs of that language — the
    * Duffield–Lund–Thorup subset-sum estimator, unbiased for ANY subset
    * that doesn't depend on the draw), next to the exact mass and the
    * integer error. This is the report a platform reads to sanity-check
    * its inspection sample before trusting sample-derived stats: language
    * crosses source arbitrarily, so nothing about the per-source sampling
    * aligns with the estimated subsets.
    *
    * Determinism: ŵ and w are q137's exact integers; the per-language sums
    * and the e4 error rate (BIGINT division, truth ≥ 1 because w ≥ 1) are
    * exact in both engines.
    *
    * Shape for 100 TB: the estimate side is k×|sources| rows (the sample);
    * only the truth side scans the corpus — one tokenize pass into a
    * lang-keyed partial aggregate. Estimating from the PERSISTED sample
    * instead of rescanning is the operational point.
    */
  def q138(spark: SparkSession, dir: String): DataFrame =
    sampleEstimate(
      Tables.documents(spark, dir)
        .filter(col("doc_id").isNotNull && col("source").isNotNull),
      PrioritySampleK)

  /** The q138 core over any documents-shaped frame — planted specs drive
    * it with k ≥ every source size, where est ≡ truth exactly.
    */
  def sampleEstimate(docs: DataFrame, k: Int): DataFrame = {
    val langs = docs.select(col("doc_id"), col("lang"))
    val truth = docs
      .select(col("lang"),
        greatest(coalesce(text.tokenCount(col("text")), lit(0L)), lit(1L))
          .as("w"))
      .groupBy(col("lang")).agg(sum(col("w")).as("true_tokens"))
    val est = prioritySample(docs, k)
      .join(langs, Seq("doc_id"))
      .groupBy(col("lang")).agg(sum(col("w_hat")).as("est"))
    truth.join(est, Seq("lang"), "left")
      .select(col("lang"),
        coalesce(col("est"), lit(0L)).as("est_tokens"),
        col("true_tokens"))
      .withColumn("abs_err", abs(col("est_tokens") - col("true_tokens")))
      // integer division, not a double floor: at 100 TB abs_err·10⁴ can
      // pass 2^53 where doubles lose integers; BIGINT division stays
      // exact, and trunc == floor on the non-negative operands
      .withColumn("err_pct_e4", expr("abs_err * 10000 DIV true_tokens"))
      .orderBy(col("lang"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q105_snapshot_drift", q105,
      Some(s"""WITH dd AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
        |qq AS (
        |  SELECT doc_id, text,
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
        |  FROM dd),
        |pv AS (
        |${driftFatesSql(s"doc_id % $DriftHoldout <> ${DriftHoldout - 1}")}),
        |cv AS (
        |${driftFatesSql("TRUE")})
        |SELECT doc_id, pv.fate AS prev_fate, cv.fate AS cur_fate,
        |  CASE WHEN pv.fate IS NULL THEN 'arrived'
        |       WHEN cv.fate IS NULL THEN 'departed'
        |       WHEN pv.fate = cv.fate THEN 'stable'
        |       ELSE 'changed' END AS status
        |FROM cv FULL JOIN pv USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("q120_contrastive_pairs", q120,
      // positives: q83's exact all-pairs-Jaccard CTEs (banded-LSH parity
      // per FIXTURES §4); negatives: q92's gate+rank CTEs restricted to
      // the strided anchors; the same constants interpolated from the
      // engine's own values
      Some(s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |      i -> array_to_string(toks[i:i+2], ' '))) AS sh
        |  FROM t),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM s a, s b
        |  WHERE a.doc_id < b.doc_id
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |pos AS (
        |  SELECT anchor_id, MIN(partner) AS positive_id FROM (
        |    SELECT a_id AS anchor_id, b_id AS partner FROM p
        |    UNION ALL SELECT b_id, a_id FROM p) GROUP BY 1),
        |e AS (SELECT vec_id AS id, label, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE embedding IS NOT NULL),
        |cap AS (SELECT * FROM pos
        |        ORDER BY md5(CAST(anchor_id AS VARCHAR)), anchor_id
        |        LIMIT $ContrastiveAnchorCap),
        |an AS (SELECT cap.anchor_id, cap.positive_id,
        |         e.label AS plabel, e.v AS pv
        |       FROM cap JOIN e ON e.id = cap.anchor_id),
        |sc AS (SELECT an.anchor_id, e.id AS cand_id,
        |         round(list_cosine_similarity(an.pv, e.v), 6) AS c
        |       FROM e JOIN an ON e.label <> an.plabel),
        |r AS (SELECT anchor_id, cand_id, c,
        |        CAST(row_number() OVER (
        |          PARTITION BY anchor_id ORDER BY c DESC, cand_id)
        |          AS INTEGER) AS rnk
        |      FROM sc WHERE c < ${Similarity.NearDupCosine}),
        |neg AS (SELECT * FROM r WHERE rnk <= $ContrastiveNegK)
        |SELECT an.anchor_id, an.positive_id, neg.rnk AS neg_rank,
        |  neg.cand_id AS negative_id, neg.c AS neg_cosine
        |FROM an LEFT JOIN neg USING (anchor_id)
        |ORDER BY anchor_id, neg_rank""".stripMargin)),
    QueryDef("q115_length_buckets", q115,
      // q100's md5 CTEs + an integer CASE bucket chain generated from the
      // same BucketCaps the engine folds; // is DuckDB integer division
      // (the engine's floor-of-double is exact at these magnitudes)
      Some(lengthBucketsOracleTail(proxyCountKCte))),
    // the computed-vocab twin: identical layout oracle, n_tokens spliced
    // from the learned-BPE CTE chain instead of the q35 proxy
    QueryDef("q115b_length_buckets_bpe", q115b,
      Some(lengthBucketsOracleTail(bpeCountKCte))),
    QueryDef("q124_seq_pack", q124,
      // q100's md5 CTEs + a recursive next-fit walk: the packer's state
      // (current fill, sequence index) steps row-by-row in (sk, doc_id)
      // order per shard — depth = max rows per shard, fixture-sized
      Some(seqPackOracleTail(
        s"WITH RECURSIVE${proxyCountKCte.stripPrefix("WITH")}"))),
    QueryDef("q124b_seq_pack_bpe", q124b,
      Some(seqPackOracleTail(
        s"WITH RECURSIVE${bpeCountKCte.stripPrefix("WITH")}"))),
    QueryDef("q100_train_shards", q100,
      Some(s"""WITH k AS (
        |  SELECT doc_id,
        |    COALESCE(CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                                  t -> t <> '')) AS BIGINT), 0) AS n_tokens,
        |    md5('$ShuffleSalt' || CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents WHERE doc_id IS NOT NULL),
        |s AS (SELECT *,
        |    CAST(CAST('0x' || substr(sk, 1, 8) AS BIGINT) % $ShardCount
        |      AS INTEGER) AS shard
        |  FROM k)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY shard ORDER BY sk, doc_id) AS INTEGER) AS pos,
        |  n_tokens
        |FROM s ORDER BY shard, pos""".stripMargin)),
    QueryDef("q97_corpus_health", q97,
      Some("""WITH d AS (
        |  SELECT source, lang, n_chars, text, md5(text) AS h,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                         t -> t <> '')) AS BIGINT) AS nt
        |  FROM documents),
        |c AS (SELECT h, COUNT(*) AS hc FROM d WHERE h IS NOT NULL GROUP BY h),
        |f AS (SELECT d.*, (coalesce(c.hc, 0) >= 2) AS isd
        |      FROM d LEFT JOIN c USING (h))
        |SELECT source,
        |  CAST(GROUPING(source) AS INT) AS g_src,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_text,
        |  CAST(SUM(CASE WHEN isd THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |  CAST(coalesce(SUM(nt), 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
        |  COUNT(DISTINCT lang) AS n_langs
        |FROM f GROUP BY ROLLUP (source)
        |ORDER BY g_src, source NULLS FIRST""".stripMargin)),
    QueryDef("q63_label_profile", q63,
      Some(s"""$cleanedCte
        |SELECT label, COUNT(*) AS n_docs, AVG(n_tokens) AS avg_tokens
        |FROM cleaned JOIN embeddings ON doc_id = vec_id
        |GROUP BY label ORDER BY label""".stripMargin)),
    QueryDef("q59_mix_weights", q59,
      Some(s"""WITH per AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    -- outer CAST matters: DuckDB types an uncast SUM(BIGINT) as
        |    -- HUGEINT (int128) while Spark emits int64 — the r4/r5 q59
        |    -- hash mismatch was this TYPE, not the arithmetic
        |    CAST(SUM(CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                                  t -> t <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |s AS (
        |  SELECT *, CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM per) AS share
        |  FROM per),
        |w AS (SELECT *, sqrt(share) AS sw FROM s),
        |z AS (SELECT ${graft.functions.num.sqlDsum("sw")} AS z FROM w)
        |SELECT lang, n_docs, n_tokens,
        |  CAST(FLOOR(share * 1000000) AS BIGINT) AS share_e6,
        |  CAST(FLOOR(sw / z.z * 1000000) AS BIGINT) AS weight_e6
        |FROM w, z ORDER BY lang""".stripMargin)),
    QueryDef("q75_mixture_sample", q75,
      Some(s"""WITH per AS (
        |  SELECT lang,
        |    CAST(SUM(CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                                  t -> t <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |s AS (
        |  -- zero-token languages are excluded from the mixture (Spark core
        |  -- filters identically); the share denominator is unaffected since
        |  -- they contribute 0 tokens
        |  SELECT *, CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM per) AS share
        |  FROM per WHERE n_tokens > 0),
        |w AS (SELECT *, sqrt(share) AS sw FROM s),
        |z AS (SELECT ${graft.functions.num.sqlDsum("sw")} AS z FROM w),
        |rt AS (SELECT lang, sw / z.z / share AS ratio FROM w, z),
        |m AS (SELECT MAX(ratio) AS mx FROM rt),
        |t AS (SELECT lang,
        |        CAST(FLOOR(ratio / m.mx * 4294967296) AS BIGINT) AS thr,
        |        CAST(FLOOR(ratio / m.mx * 1000000) AS BIGINT) AS rate_e6
        |      FROM rt, m)
        |SELECT d.doc_id, d.lang, t.rate_e6,
        |  (CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |    < t.thr) AS kept
        |FROM documents d JOIN t USING (lang)
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("q83_split_leakage", q83,
      Some("""WITH d AS (
        |  SELECT doc_id, text,
        |    CASE WHEN substr(md5(text), 1, 1) IN ('0', '1')
        |         THEN 'heldout' ELSE 'train' END AS split,
        |    list_distinct(list_transform(
        |      generate_series(1, len(list_filter(
        |        regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) - 2),
        |      i -> array_to_string(list_filter(
        |        regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')[i:i+2], ' ')))
        |      AS sh
        |  FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  a.split AS a_split, b.split AS b_split,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id AND a.split <> b.split
        |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin)),
    QueryDef("q87_split_repair", q87,
      Some("""WITH RECURSIVE d AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(text), 1, 1) IN ('0', '1')
        |         THEN 'heldout' ELSE 'train' END AS split,
        |    list_distinct(list_transform(
        |      generate_series(1, len(list_filter(
        |        regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) - 2),
        |      i -> array_to_string(list_filter(
        |        regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')[i:i+2], ' ')))
        |      AS sh
        |  FROM documents WHERE doc_id IS NOT NULL),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM d a, d b
        |  WHERE a.doc_id < b.doc_id
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM p
        |          UNION ALL SELECT b_id, a_id FROM p),
        |cc(v, lab) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT edges.dst, cc.lab FROM cc JOIN edges ON edges.src = cc.v),
        |rep AS (SELECT v, MIN(lab) AS lab FROM cc GROUP BY v),
        |mixed AS (
        |  SELECT rep.lab FROM rep JOIN d ON d.doc_id = rep.v
        |  GROUP BY rep.lab
        |  HAVING COUNT(DISTINCT d.split) > 1)
        |SELECT d.doc_id, d.split,
        |  CASE WHEN m.lab IS NOT NULL AND d.split = 'train' THEN 'quarantine'
        |       ELSE d.split END AS action
        |FROM d
        |JOIN rep ON rep.v = d.doc_id
        |LEFT JOIN mixed m ON m.lab = rep.lab
        |ORDER BY d.doc_id""".stripMargin)),
    QueryDef("q88_curation_funnel", q88,
      Some(s"""WITH RECURSIVE base AS (
        |  SELECT doc_id, text,
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
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND doc_id % ${EvalEvery} <> 0),
        |qual AS (
        |  SELECT * FROM base
        |  WHERE n_tokens >= 20 AND alpha_ratio >= 0.5 AND sw_ratio <= 0.5),
        |clfs AS (
        |  SELECT doc_id,
        |    CAST(FLOOR(CAST(SUM(CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT)
        |        % 2001 - 1000) AS DOUBLE) * 1000 / COUNT(*)) AS BIGINT) AS m
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '')) AS tok
        |        FROM qual) GROUP BY doc_id),
        |clf AS (
        |  SELECT q.* FROM qual q JOIN clfs USING (doc_id)
        |  WHERE clfs.m >= ${ClassifierFloorE6}),
        |exr AS (
        |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM clf),
        |exs AS (SELECT doc_id, text, n_tokens FROM exr WHERE rn = 1),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, len(list_filter(
        |        regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) - 2),
        |      i -> array_to_string(list_filter(
        |        regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')[i:i+2], ' ')))
        |      AS sh
        |  FROM exs),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM p
        |          UNION ALL SELECT b_id, a_id FROM p),
        |cc(v, lab) AS (
        |  SELECT doc_id, doc_id FROM exs
        |  UNION
        |  SELECT edges.dst, cc.lab FROM cc JOIN edges ON edges.src = cc.v),
        |rep AS (SELECT v, MIN(lab) AS lab FROM cc GROUP BY v),
        |nears AS (
        |  SELECT e.* FROM exs e JOIN rep ON rep.v = e.doc_id
        |  WHERE rep.lab = e.doc_id),
        |ntk AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS toks
        |  FROM nears),
        |evt AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                     t -> t <> '') AS toks
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % ${EvalEvery} = 0),
        |evg AS (
        |  SELECT DISTINCT array_to_string(toks[i:i+${Dedup.SpanTokens - 1}], ' ') AS gram
        |  FROM evt, unnest(generate_series(1, len(toks) - ${Dedup.SpanTokens - 1})) AS t(i)
        |  WHERE len(toks) >= ${Dedup.SpanTokens}),
        |ng AS (
        |  SELECT doc_id, array_to_string(toks[i:i+${Dedup.SpanTokens - 1}], ' ') AS gram
        |  FROM ntk, unnest(generate_series(1, len(toks) - ${Dedup.SpanTokens - 1})) AS t(i)
        |  WHERE len(toks) >= ${Dedup.SpanTokens}),
        |hit AS (SELECT DISTINCT ng.doc_id FROM ng JOIN evg USING (gram)),
        |dec AS (SELECT * FROM nears
        |        WHERE doc_id NOT IN (SELECT doc_id FROM hit))
        |SELECT * FROM (
        |  SELECT CAST(0 AS INT) AS stage_idx, 'raw' AS stage, COUNT(*) AS docs,
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS tokens FROM base
        |  UNION ALL SELECT CAST(1 AS INT), 'quality', COUNT(*),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM qual
        |  UNION ALL SELECT CAST(2 AS INT), 'classifier', COUNT(*),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM clf
        |  UNION ALL SELECT CAST(3 AS INT), 'exact_dedup', COUNT(*),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM exs
        |  UNION ALL SELECT CAST(4 AS INT), 'near_dedup', COUNT(*),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM nears
        |  UNION ALL SELECT CAST(5 AS INT), 'decontaminated', COUNT(*),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM dec)
        |ORDER BY stage_idx""".stripMargin)),
    QueryDef("q89_source_cap", q89,
      Some(s"""SELECT doc_id, source, src_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY coalesce(md5(text), ''), doc_id) AS INT) AS src_rank
        |  FROM documents WHERE doc_id IS NOT NULL)
        |WHERE src_rank <= $SourceCap
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("q90_eval_contam_report", q90,
      Some(s"""WITH base AS (
        |  SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id IS NOT NULL),
        |evg AS (
        |  SELECT DISTINCT doc_id AS eval_id,
        |    array_to_string(toks[i:i+${Dedup.SpanTokens - 1}], ' ') AS gram
        |  FROM base, unnest(generate_series(1, len(toks) - ${Dedup.SpanTokens - 1})) AS t(i)
        |  WHERE doc_id % ${EvalEvery} = 0 AND len(toks) >= ${Dedup.SpanTokens}),
        |tg AS (
        |  SELECT DISTINCT doc_id AS train_id,
        |    array_to_string(toks[i:i+${Dedup.SpanTokens - 1}], ' ') AS gram
        |  FROM base, unnest(generate_series(1, len(toks) - ${Dedup.SpanTokens - 1})) AS t(i)
        |  WHERE doc_id % ${EvalEvery} <> 0 AND len(toks) >= ${Dedup.SpanTokens}),
        |hit AS (SELECT evg.eval_id, tg.train_id, evg.gram
        |        FROM evg JOIN tg USING (gram)),
        |per AS (SELECT eval_id, count(DISTINCT gram) AS nl,
        |               count(DISTINCT train_id) AS nt
        |        FROM hit GROUP BY 1),
        |tot AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_windows
        |        FROM evg GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(coalesce(t.n_windows, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(p.nl, 0) AS BIGINT) AS n_leaked_windows,
        |  round(CAST(coalesce(p.nl, 0) AS DOUBLE) /
        |    greatest(coalesce(t.n_windows, 0), 1), 4) AS leak_ratio,
        |  CAST(coalesce(p.nt, 0) AS BIGINT) AS n_train_docs
        |FROM base b
        |LEFT JOIN tot t ON t.eval_id = b.doc_id
        |LEFT JOIN per p ON p.eval_id = b.doc_id
        |WHERE b.doc_id % ${EvalEvery} = 0
        |ORDER BY b.doc_id""".stripMargin)),
    QueryDef("q80_line_dedup", q80, Some(lineDedupOracleSql)),
    // q80b computes q80's EXACT result with 64-bit hash shuffle keys, so
    // the oracle is shared verbatim (q66/q57 precedent)
    QueryDef("q80b_line_dedup_hashed", q80b, Some(lineDedupOracleSql)),
    QueryDef("q79_source_mix", q79,
      Some("""WITH g AS (
        |  SELECT source, md5(text) AS h, COUNT(*) AS copies,
        |    CAST(SUM(CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                                  t -> t <> '')) AS BIGINT)) AS BIGINT) AS tok
        |  FROM documents GROUP BY source, h),
        |s AS (
        |  SELECT source, CAST(SUM(copies) AS BIGINT) AS n_docs,
        |    COUNT(*) AS n_unique_texts, CAST(SUM(tok) AS BIGINT) AS n_tokens
        |  FROM g GROUP BY source)
        |SELECT source, n_docs, n_unique_texts, n_tokens,
        |  CAST(FLOOR(CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM s)
        |    * 1000000) AS BIGINT) AS token_share_e6,
        |  CAST(FLOOR(CAST(n_docs - n_unique_texts AS DOUBLE) / n_docs
        |    * 1000000) AS BIGINT) AS dup_ratio_e6
        |FROM s ORDER BY source""".stripMargin)),
    QueryDef("q57_decontaminate", q57, Some(decontOracleSql)),
    // q66 computes q57's EXACT result behind the Bloom prescreen (no false
    // negatives + exact verify join), so the oracle is shared verbatim.
    QueryDef("q66_bloom_decontaminate", q66, Some(decontOracleSql)),
    QueryDef("q44_corpus_filter", q44,
      Some(s"""$cleanedCte
        |SELECT doc_id, lang, n_tokens FROM cleaned
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("q45_hash_split", q45,
      Some("""SELECT doc_id,
        |  substr(md5(text), 1, 1) AS bucket_hex,
        |  CASE WHEN substr(md5(text), 1, 1) IN ('0', '1')
        |       THEN 'heldout' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("q127_doc_line_dedup", q127,
      // first-wins rank per (doc, line), ordered string_agg rebuild; the
      // range-unnest gives 1-based positions (Spark's are 0-based) — both
      // only ORDER within their own engine, so parity holds
      Some("""WITH d AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
        |l AS (SELECT doc_id, string_split(text, chr(10)) AS ls
        |      FROM d WHERE text IS NOT NULL),
        |e AS (SELECT doc_id, ls[i] AS line, i AS pos
        |      FROM l, unnest(range(1, len(ls) + 1)) AS r(i)),
        |m AS (SELECT doc_id, line, pos, row_number() OVER (
        |        PARTITION BY doc_id, line ORDER BY pos) AS rn
        |      FROM e),
        |r AS (SELECT doc_id, count(*) AS n_lines,
        |        CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_kept,
        |        string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
        |                   ORDER BY pos) AS clean_text
        |      FROM m GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.n_lines, 0) AS n_lines,
        |  coalesce(r.n_kept, 0) AS n_kept, r.clean_text
        |FROM d LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin)),
    QueryDef("q114_markup_strip", q114,
      // the identical replace chain, generated from the same pattern list
      // the engine folds (Java-regex ∩ RE2 subset; 'g' = Spark's
      // always-global); entity replacements SQL-quote-escaped
      Some {
        var x = "coalesce(text, '')"
        text.markupPatterns
          .foreach(p => x = s"regexp_replace($x, '$p', ' ', 'g')")
        text.markupEntities.foreach { case (e, r) =>
          x = s"regexp_replace($x, '$e', '${r.replace("'", "''")}', 'g')"
        }
        x = s"trim(regexp_replace($x, '[ \\t\\n\\r\\f]+', ' ', 'g'))"
        s"""WITH c AS (
        |  SELECT doc_id, coalesce(text, '') AS t0, $x AS ct
        |  FROM documents)
        |SELECT doc_id, ct AS clean_text,
        |  CAST(length(t0) - length(ct) AS BIGINT) AS n_removed
        |FROM c ORDER BY doc_id""".stripMargin
      }),
    QueryDef("q49_redact", q49,
      Some(s"""SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '$UrlRe')) AS INT) AS n_urls,
        |  CAST(len(regexp_extract_all(text, '$LongNumRe')) AS INT) AS n_longnums,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text, '$UrlRe', '<URL>', 'g'),
        |      '$EmailRe', '<EMAIL>', 'g'),
        |    '$LongNumRe', '<NUM>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("q50_pack_chunks", q50,
      Some(s"""WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                         x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(floor((SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
        |    / $ChunkBudget) AS BIGINT) AS chunk_id
        |FROM t ORDER BY doc_id""".stripMargin)),
    QueryDef("q69_chunk_windows", q69,
      Some(s"""WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                         x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    unnest(generate_series(0,
        |      greatest(CAST(ceil(CAST(n_tokens - $WindowSize AS DOUBLE)
        |                         / $WindowStride) AS BIGINT), 0)))
        |      AS chunk_idx
        |  FROM t WHERE n_tokens > 0)
        |SELECT doc_id, chunk_idx,
        |  chunk_idx * $WindowStride AS start_tok,
        |  least(chunk_idx * $WindowStride + $WindowSize, n_tokens) AS end_tok,
        |  least(chunk_idx * $WindowStride + $WindowSize, n_tokens)
        |    - chunk_idx * $WindowStride AS chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),
    QueryDef("q51_stratified_sample", q51,
      Some(s"""SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang, CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY md5(text), doc_id) AS INTEGER) AS rn
        |  FROM documents)
        |WHERE rn <= $SamplePerLang
        |ORDER BY lang, rn""".stripMargin)),
    QueryDef("q135_token_budget", q135,
      // per = q94's CTEs verbatim; the oracle states the plain global
      // window the engine's two-phase bucket cumsum equals long for long
      Some(tokenBudgetOracleTail("WITH",
        s"""per AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(per0.n, 0) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(per0.s, 0) AS BIGINT) AS score_milli
        |  FROM documents d LEFT JOIN per0 USING (doc_id)
        |  WHERE d.doc_id IS NOT NULL)""".stripMargin))),
    // computed-vocab twin: the ranking score CTEs are untouched; only the
    // budgeted n_tokens joins in from the learned-BPE chain
    QueryDef("q135b_token_budget_bpe", q135b,
      Some(tokenBudgetOracleTail(
        s"${TextAnalysis.bpeDocCountsCtes(TextAnalysis.BpeSteps)},",
        s"""per AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(bc.n_tokens, 0) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(per0.s, 0) AS BIGINT) AS score_milli
        |  FROM documents d LEFT JOIN per0 USING (doc_id)
        |                   LEFT JOIN bpe_counts bc USING (doc_id)
        |  WHERE d.doc_id IS NOT NULL)""".stripMargin))),
    QueryDef("q137_priority_sample", q137,
      // integer priorities (w·2^28 // u, u md5-derived) and integer τ/ŵ —
      // the oracle states the plain per-source window the engine's salted
      // two-phase rank equals row for row
      Some(s"""WITH per AS (
        |  SELECT doc_id, source,
        |    greatest(coalesce(len(list_filter(
        |      regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '')), 0), 1) AS w
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND source IS NOT NULL),
        |pr AS (
        |  SELECT doc_id, source, w,
        |    (w * $PriorityScale) //
        |      (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)
        |        AS BIGINT) + 1) AS priority
        |  FROM per),
        |r AS (SELECT *, CAST(row_number() OVER (
        |    PARTITION BY source ORDER BY priority DESC, doc_id) AS INTEGER)
        |      AS rnk
        |  FROM pr),
        |t AS (SELECT source,
        |        max(CASE WHEN rnk = ${PrioritySampleK + 1} THEN priority END)
        |          AS tau
        |      FROM r GROUP BY source)
        |SELECT r.doc_id, r.source, CAST(r.w AS BIGINT) AS w,
        |  CAST(r.priority AS BIGINT) AS priority, r.rnk,
        |  CAST(greatest(r.w, coalesce(t.tau, 0)) AS BIGINT) AS w_hat
        |FROM r JOIN t USING (source)
        |WHERE rnk <= $PrioritySampleK
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("q138_sample_estimate", q138,
      // q137's CTEs verbatim feed the estimate side; the truth side is one
      // lang-keyed exact sum; everything an integer (incl. the e4 error
      // rate — BIGINT division, truth ≥ 1 because w ≥ 1)
      Some(s"""WITH per AS (
        |  SELECT doc_id, source, lang,
        |    greatest(coalesce(len(list_filter(
        |      regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '')), 0), 1) AS w
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND source IS NOT NULL),
        |pr AS (
        |  SELECT doc_id, source, lang, w,
        |    (w * $PriorityScale) //
        |      (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)
        |        AS BIGINT) + 1) AS priority
        |  FROM per),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY source ORDER BY priority DESC, doc_id) AS rnk
        |  FROM pr),
        |t AS (SELECT source,
        |        max(CASE WHEN rnk = ${PrioritySampleK + 1} THEN priority END)
        |          AS tau
        |      FROM r GROUP BY source),
        |s AS (SELECT r.lang,
        |        greatest(r.w, coalesce(t.tau, 0)) AS w_hat
        |      FROM r JOIN t USING (source)
        |      WHERE rnk <= $PrioritySampleK),
        |est AS (SELECT lang, CAST(SUM(w_hat) AS BIGINT) AS est
        |        FROM s GROUP BY lang),
        |tr AS (SELECT lang, CAST(SUM(w) AS BIGINT) AS true_tokens
        |       FROM per GROUP BY lang)
        |SELECT tr.lang,
        |  CAST(coalesce(est.est, 0) AS BIGINT) AS est_tokens,
        |  tr.true_tokens,
        |  CAST(abs(coalesce(est.est, 0) - tr.true_tokens) AS BIGINT)
        |    AS abs_err,
        |  CAST(abs(coalesce(est.est, 0) - tr.true_tokens) * 10000
        |    // tr.true_tokens AS BIGINT) AS err_pct_e4
        |FROM tr LEFT JOIN est USING (lang)
        |ORDER BY lang""".stripMargin)))
}
