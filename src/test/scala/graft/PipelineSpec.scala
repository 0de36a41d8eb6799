package graft

import graft.operators.Pipeline
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
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

  test("decontamination flags exactly the train docs sharing eval 3-grams") {
    import spark.implicits._
    // doc 0 is the eval doc (0 % evalEvery == 0); 1 copies one of its
    // trigrams verbatim, 2 shares only bigrams (no full trigram), 3 is clean
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "x y alpha beta gamma z w"),
      (2L, "beta gamma then alpha beta stop it"),
      (3L, "one two three four five six")
    ).toDF("doc_id", "text")
    val rows = Pipeline.decontaminate(docs, Pipeline.EvalEvery)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getBoolean(4)))).toMap
    // doc 1: grams {x y alpha, y alpha beta, alpha beta gamma, beta gamma z,
    // gamma z w} — exactly one ("alpha beta gamma") is an eval gram
    assert(rows(1L) === ((5, 1L, true)))
    assert(rows(2L)._3 === false, "shared bigrams alone must not flag")
    assert(rows(3L) === ((4, 0L, false)))
    assert(!rows.contains(0L), "eval docs are not scored")
  }

  test("bloom-prescreened decontamination equals the exact form row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val exact = Pipeline.q57(spark, dir).collect().toSeq
    val bloomed = Pipeline.q66(spark, dir).collect().toSeq
    assert(bloomed.nonEmpty)
    // no false negatives (every contaminated doc survives the prescreen) and
    // the verify join killed every false positive: results are identical
    assert(bloomed === exact)
  }

  test("redaction scrubs planted PII and counts each kind") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or visit https://ex.com/a?b=1 now"),
      (2L, "call 12345678 ref 9876543210 code 123"), // two long runs, one short
      (3L, "clean text with no pii at all"),
      // mixed-case PII must not escape the (?i) patterns
      (4L, "mail Bob@Example.COM or HTTPS://Ex.COM/Path today"),
      // a URL at end-of-line must stop at the newline, not swallow the
      // following lines up to the next space
      (5L, "see https://ex.com/docs\nsecond line stays\nthird line too"))
      .toDF("doc_id", "text")
    val rows = Pipeline.redact(docs).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(byId(1L)._1 === 1 && byId(1L)._2 === 1)
    assert(byId(1L)._4 === "contact <EMAIL> or visit <URL> now")
    assert(byId(2L)._3 === 2)
    assert(byId(2L)._4 === "call <NUM> ref <NUM> code 123")
    assert(byId(3L) === ((0, 0, 0, "clean text with no pii at all")))
    assert(byId(4L)._1 === 1 && byId(4L)._2 === 1)
    assert(byId(4L)._4 === "mail <EMAIL> or <URL> today")
    assert(byId(5L)._4 === "see <URL>\nsecond line stays\nthird line too")
  }

  test("chunk packing never splits a doc and respects the running budget") {
    val rows = Pipeline.q50(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      val (n, chunk) = (r.getLong(1), r.getLong(2))
      assert(chunk === cum / Pipeline.ChunkBudget, s"doc ${r.getLong(0)}")
      cum += n
    }
  }

  test("chunk windows tile every doc: stride offsets, full coverage, bounded size") {
    import spark.implicits._
    val stride = graft.operators.Pipeline.WindowStride
    val size = graft.operators.Pipeline.WindowSize
    // fixture docs are all <= 1 window (~100 tokens), so the multi-chunk
    // path needs PLANTED token counts straddling every boundary: exactly
    // one window, one window + 1 (the r5 formula emitted a redundant
    // trailing chunk here), mid-range, and deep multi-chunk
    val planted = Seq(1L, 100L, stride, stride + 1, size - 1, size, size + 1,
      300L, 600L, 1100L, 4 * size + 7)
      .zipWithIndex.map { case (n, i) => (1000L + i, n) }
    val fixture = graft.operators.Pipeline.q69(spark, "/root/testdata/sf0.001")
      .select("doc_id", "chunk_idx", "start_tok", "end_tok", "chunk_tokens")
      .collect()
    val synth = graft.operators.Pipeline.chunkWindows(
      planted.toDF("doc_id", "n_tokens")).collect()
    val byDoc = (fixture ++ synth)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(byDoc.nonEmpty)
    // the planted counts DO hit the multi-chunk path
    assert(byDoc(planted(8)._1).length === 2)  // 600  → 1 + ceil(88/256)
    assert(byDoc(planted(9)._1).length === 4)  // 1100 → 1 + ceil(588/256)
    assert(byDoc(planted(10)._1).length === 8) // 2055 → 1 + ceil(1543/256)
    val plantedTokens = planted.toMap
    byDoc.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_._2)
      // contiguous indices from 0, each starting at idx*stride
      assert(sorted.map(_._2).toSeq === (0L until sorted.length.toLong))
      sorted.foreach { case (_, idx, start, end, n) =>
        assert(start === idx * stride)
        assert(n === end - start)
        assert(n > 0 && n <= size, s"doc $doc chunk $idx size $n")
      }
      // full coverage: the final window reaches the doc's last token...
      plantedTokens.get(doc).foreach { n =>
        assert(sorted.last._4 === n, s"doc $doc truncated")
      }
      // ...and no earlier window does — no chunk is redundant
      val lastEnd = sorted.last._4
      assert(sorted.init.forall(_._4 < lastEnd), s"doc $doc redundant chunk")
      // consecutive windows leave no gap (stride < size ⇒ overlap)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 < a._4, s"doc $doc gap at ${b._2}")
        case _           =>
      }
    }
  }

  test("q69 cross-engine dump: planted multi-chunk docs + engine output parquet") {
    // The FIXTURE docs are all <= 1 window, so the driver's DuckDB gate never
    // executes the multi-chunk branch of q69's own oracle SQL. This test
    // plants real documents that straddle every window boundary and dumps
    // (a) the planted table and (b) the engine's q69 over it to
    // target/q69_cross/; `tools/q69_cross_check.py` then runs the REGISTERED
    // oracle SQL (from a Verify dump's oracle_sql.json) against the planted
    // table in DuckDB and diffs — cross-ENGINE equality on the multi-chunk
    // branch, not just the engine vs its own Scala model.
    import spark.implicits._
    val size = Pipeline.WindowSize
    val counts = Seq(0L, 1L, size - 1, size, size + 1, 600L, 1100L,
      4 * size + 7)
    val docs = counts.zipWithIndex.map { case (n, i) =>
      val text = if (n == 0) "!!!" else (0L until n).map(j => s"w$j").mkString(" ")
      (1000L + i, text, "en", "planted", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = "target/q69_cross"
    docs.coalesce(1).write.mode("overwrite").parquet(s"$base/fixture/documents.parquet")
    val engine = Pipeline.q69(spark, s"$base/fixture")
    engine.coalesce(1).write.mode("overwrite").parquet(s"$base/engine")
    val byDoc = engine.collect().groupBy(_.getLong(0))
    assert(byDoc.get(1000L).isEmpty)           // 0 tokens → no chunks
    assert(byDoc(1005L).length === 2)          // 600 → multi-chunk
    assert(byDoc(1007L).length === 8)          // 2055 → deep multi-chunk
  }

  test("mixture sampler rebalances toward the sqrt-tempered target, downsample-only") {
    import spark.implicits._
    // 90/10 token split over two languages, equal-length docs. sqrt temper:
    // p_a ∝ √.9, p_b ∝ √.1 → p=(.75, .25). Downsample-only rates:
    // ratio_a = .75/.9 = .833, ratio_b = .25/.1 = 2.5, c = 1/2.5 →
    // r_a = 1/3, r_b = 1 — the minority language must keep EVERYTHING.
    val docs = ((0 until 900).map(i => (i.toLong, "aa", "tok " * 10)) ++
      (900 until 1000).map(i => (i.toLong, "bb", "tok " * 10)))
      .toDF("doc_id", "lang", "text")
    val got = graft.operators.Pipeline.mixtureSample(docs).collect()
    val byLang = got.groupBy(_.getString(1))
    val rateA = byLang("aa").head.getLong(2)
    val rateB = byLang("bb").head.getLong(2)
    assert(rateB === 1000000L, s"minority lang must keep all, rate_e6=$rateB")
    assert(math.abs(rateA - 333333L) <= 1, s"rate_a should be ~1/3, got $rateA")
    val keptA = byLang("aa").count(_.getBoolean(3))
    assert(byLang("bb").forall(_.getBoolean(3)), "minority doc dropped")
    // md5-uniform keep at r=1/3 over 900 docs: expect ~300, allow 3.5 sigma
    assert(math.abs(keptA - 300) < 50, s"kept $keptA of 900 at rate 1/3")
    // determinism: the verdicts are content-keyed, not RNG
    val again = graft.operators.Pipeline.mixtureSample(docs).collect()
    assert(got.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("stratified sample takes at most K per language, deterministically") {
    val a = Pipeline.q51(spark, "/root/testdata/sf0.001").collect()
    val b = Pipeline.q51(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val perLang = a.groupBy(_.getString(1)).view.mapValues(_.length)
    perLang.foreach { case (l, n) =>
      assert(n <= Pipeline.SamplePerLang, s"lang $l oversampled")
    }
    assert(a.nonEmpty)
  }

  test("source mix: within-source dup rate counts exact copies only") {
    // srcA: 4 docs, 2 byte-identical -> 3 unique, dup_ratio 25%;
    // srcB: 2 distinct docs -> 0%. 17 corpus tokens total (12 + 5).
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma", "srcA"),
      (2L, "alpha beta gamma", "srcA"),
      (3L, "delta epsilon", "srcA"),
      (4L, "zeta eta theta iota", "srcA"),
      (5L, "one two three", "srcB"),
      (6L, "four five", "srcB")).toDF("doc_id", "text", "source")
    val got = Pipeline.sourceMix(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // token_share_e6 = floor(tok/17 * 1e6); dup_ratio_e6 = floor(dups/n * 1e6)
    assert(got("srcA") === ((4L, 3L, 12L,
      math.floor(12.0 / 17 * 1e6).toLong, 250000L)))
    assert(got("srcB") === ((2L, 2L, 5L,
      math.floor(5.0 / 17 * 1e6).toLong, 0L)))
  }

  /** q83 against a plain-Scala model: generate a seeded corpus with planted
    * near-dup pairs, compute the EXPECTED crossing pairs in the JVM (exact
    * 3-gram Jaccard + md5-nibble split, the same definitions the engine
    * uses), and require the engine to find exactly that set.
    */
  test("split leakage audit matches a plain-Scala model on planted near-dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"w$i")
    def doc() = Seq.fill(90)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (0 until 12).map(i => i.toLong -> doc())
    val nears = bases.map { case (id, t) =>
      val a = t.split(" "); a(7) = "zz"
      (id + 100) -> a.mkString(" ")
    }
    val corpus = bases ++ nears
    def split(text: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      val hex = "%02x".format(md(0) & 0xff)
      if (hex(0) == '0' || hex(0) == '1') "heldout" else "train"
    }
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      ga = grams(ta); gb = grams(tb)
      j = (ga & gb).size.toDouble / (ga | gb).size
      if j >= 0.8 && split(ta) != split(tb)
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "seed must plant at least one crossing pair")
    val got = Pipeline.splitLeakage(corpus.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  /** q87 against a plain-Scala model: same seeded corpus as the q83 spec,
    * expected actions computed in the JVM (exact 3-gram Jaccard pairs →
    * union-find components → quarantine train members of mixed components).
    * The seed plants crossing pairs, so quarantines MUST occur; heldout
    * docs must never be reassigned.
    */
  test("split repair quarantines exactly the train members of mixed components") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"w$i")
    def doc() = Seq.fill(90)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (0 until 12).map(i => i.toLong -> doc())
    val nears = bases.map { case (id, t) =>
      val a = t.split(" "); a(7) = "zz"
      (id + 100) -> a.mkString(" ")
    }
    // exact copies exercise the rep-collapse path: members must inherit
    // their group's component action, including a quarantine earned by a
    // near-dup edge only the REP participates in
    val copies = Seq(200L -> bases(0)._2, 201L -> bases(0)._2,
      202L -> nears(1)._2)
    val corpus = bases ++ nears ++ copies
    def split(text: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      val hex = "%02x".format(md(0) & 0xff)
      if (hex(0) == '0' || hex(0) == '1') "heldout" else "train"
    }
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val pairs = for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      ga = grams(ta); gb = grams(tb)
      j = (ga & gb).size.toDouble / (ga | gb).size
      if j >= 0.8
    } yield (a, b)
    // union-find over doc ids
    val parent = scala.collection.mutable.Map(corpus.map(c => c._1 -> c._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val byComp = corpus.groupBy(c => find(c._1))
    val expected = corpus.map { case (id, t) =>
      val s = split(t)
      val comp = byComp(find(id)).map(c => split(c._2)).toSet
      val action = if (s == "train" && comp.contains("heldout")) "quarantine" else s
      id -> ((s, action))
    }.toMap
    assert(expected.values.exists(_._2 == "quarantine"),
      "seed must plant at least one quarantine")
    val got = Pipeline.splitRepair(corpus.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got === expected)
    // the benchmark side is immutable by construction
    assert(got.values.forall { case (s, a) => s != "heldout" || a == "heldout" })
  }

  /** Null-text docs have a NULL md5: an equi-join on the group key would
    * silently drop them from the member fan-back (2 of 5 vanished before the
    * coalesce fix). They must come back as 'train'/'train' singletons —
    * exactly what the oracle's CASE over md5(text) resolves NULL to — and
    * every non-null doc's verdict must be untouched by their presence.
    */
  test("split repair keeps null-text docs as train singletons") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, null.asInstanceOf[String]),
      (3L, "completely different words live in this second document body"),
      (4L, null.asInstanceOf[String]),
      (5L, "a third unrelated text keeps the pair generator honest here"))
      .toDF("doc_id", "text")
    val got = Pipeline.splitRepair(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.length === 5, "every input doc must surface in the verdict")
    Seq(2L, 4L).foreach { id =>
      val row = got.find(_._1 == id).get
      assert(row === ((id, "train", "train")), s"null-text doc $id")
    }
  }

  /** q88 curation funnel: one doc planted per knife — quality-fail,
    * classifier-fail (25 copies of "xe", whose md5 stand-in weight is -985
    * milli so the mean sits far below [[Pipeline.ClassifierFloorE6]]; its
    * vocabulary is disjoint from every other doc so it is no one's dup,
    * near-dup, or contamination), exact copy, near-dup,
    * benchmark-contaminated — plus one clean survivor, with hand-computed
    * doc/token counts at every stage. The a/a2/b docs' mean weights sit
    * well inside the floor (≈ -92k/-101k/-21k e6-units vs -300k), so only
    * the planted doc dies at the model gate.
    */
  test("curation funnel counts every stage's planted fates") {
    import spark.implicits._
    def w(i: Int) = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    def v(i: Int) = s"${('m' + i / 26).toChar}${('m' + i % 26).toChar}"
    val a = (0 until 90).map(w).mkString(" ")
    val a2 = { val t = (0 until 90).map(w).toArray; t(7) = "zz"; t.mkString(" ") }
    val evalSpan = (1 to 8).map(i => s"e$i").mkString(" ")
    val b = ((0 until 82).map(v) :+ evalSpan).mkString(" ")
    val docs = Seq(
      (10L, evalSpan), // eval side (id % 10 == 0): the benchmark
      (1L, "too short"), // fails the 20-token gate
      (6L, Seq.fill(25)("xe").mkString(" ")), // fails the classifier gate
      (2L, a), (3L, a), // exact pair — min id 2 survives
      (4L, a2), // near-dup of 2 (3-gram j ≈ 0.93) — component min 2 survives
      (5L, b)) // clean until the eval window at its tail contaminates it
      .toDF("doc_id", "text")
    val got = Pipeline.curationFunnel(docs, 10L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      (0, "raw", 6L, 387L),
      (1, "quality", 5L, 385L),
      (2, "classifier", 4L, 360L),
      (3, "exact_dedup", 3L, 270L),
      (4, "near_dedup", 2L, 180L),
      (5, "decontaminated", 1L, 90L)))
  }

  /** A null-text doc is a raw DOC (it arrived) but contributes NULL — not
    * size(null) = -1 — to the raw token SUM, matching the oracle's
    * NULL-skipping SUM (the q80/q84/q86/q90 null-parity contract).
    */
  test("curation funnel: null text counts as a raw doc but adds no tokens") {
    import spark.implicits._
    def w(i: Int) = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val a = (0 until 90).map(w).mkString(" ")
    val docs = Seq((1L, a), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Pipeline.curationFunnel(docs, 10L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      (0, "raw", 2L, 90L),
      (1, "quality", 1L, 90L),
      (2, "classifier", 1L, 90L),
      (3, "exact_dedup", 1L, 90L),
      (4, "near_dedup", 1L, 90L),
      (5, "decontaminated", 1L, 90L)))
  }

  /** q89 source cap, exactness of the salted two-phase rank: on the real
    * fixture it must equal the naive single-window form row for row (both
    * keep columns AND rank values), at a cap that actually cuts (fixture
    * sources hold 25 docs; cap 20).
    */
  test("salted two-phase source cap equals the plain per-source window") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("source"))
    val naive = docs.filter(col("doc_id").isNotNull)
      .withColumn("src_rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(
          coalesce(md5(col("text").cast("binary")), lit("")), col("doc_id"))))
      .filter(col("src_rank") <= Pipeline.SourceCap)
      .select(col("doc_id"), col("source"), col("src_rank"))
      .orderBy(col("doc_id"))
    val got = Pipeline.sourceCap(docs, Pipeline.SourceCap).collect().toSeq
    val want = naive.collect().toSeq
    assert(want.nonEmpty && want.size < docs.count(), "cap did not cut")
    assert(got === want)
  }

  /** q89 planted model check: ranks follow (md5(text), doc_id) order per
    * source, computed independently with java.security MessageDigest.
    */
  test("source cap keeps the cap lowest md5 keys per source") {
    import spark.implicits._
    val docs = (1L to 9L).map(i => (i, s"doc number $i", s"s${i % 2}"))
      .toDF("doc_id", "text", "source")
    def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (1L to 9L).map(i => (i, s"s${i % 2}", hex(s"doc number $i")))
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (r._3, r._1)).take(3).zipWithIndex
          .map { case (r, k) => (r._1, r._2, k + 1) }
      }.sortBy(_._1)
    val got = Pipeline.sourceCap(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got === want)
  }

  /** q90 eval-integrity report: one eval doc quoted by two train docs (one
    * of its three 8-token windows), one clean eval doc, one too short to
    * have any window — every count and ratio hand-computed.
    */
  test("eval contamination report counts leaked windows and quoting train docs") {
    import spark.implicits._
    val e1 = (1 to 10).map(i => s"w$i")     // 3 distinct 8-token windows
    val window = e1.take(8).mkString(" ")   // the quoted one
    val docs = Seq(
      (10L, e1.mkString(" ")),
      (20L, (1 to 9).map(i => s"c$i").mkString(" ")), // 2 windows, unquoted
      (30L, "tiny eval doc here now"),                // < 8 tokens: 0 windows
      (1L, s"train quote begins $window train quote ends"),
      (2L, s"$window another quoter tail tails"),
      (3L, "unrelated train content with no shared windows at all"))
      .toDF("doc_id", "text")
    val got = Pipeline.evalContamReport(docs, 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(got === Array(
      (10L, 3L, 1L, 0.3333, 2L),
      (20L, 2L, 0L, 0.0, 0L),
      (30L, 0L, 0L, 0.0, 0L)))
  }

  test("line dedup strips corpus-duplicated lines, keeps order, empties boilerplate-only docs") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter"
    val df = Seq(
      (1L, s"unique alpha\n$boiler\nunique beta"),
      (2L, s"$boiler\nanother original line"),
      (3L, boiler), // boilerplate-only -> cleaned empty
      (4L, "standalone doc with one line"),
      (5L, "repeated inside one doc\nrepeated inside one doc\ntail line"))
      .toDF("doc_id", "text")
    val got = Pipeline.lineDedup(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((3, 2L, "unique alpha\nunique beta")))
    assert(got(2L) === ((2, 1L, "another original line")))
    assert(got(3L) === ((1, 0L, ""))) // every line was boilerplate
    assert(got(4L) === ((1, 1L, "standalone doc with one line")))
    // within-doc repetition counts toward the corpus threshold too
    assert(got(5L) === ((3, 1L, "tail line")))
  }

  /** q80b (xxhash64 line keys) must be row-identical to q80 (string keys)
    * on a corpus with real cross-doc and within-doc line duplication —
    * the "same plan, fixed-width keys" claim as an executable assertion.
    * Collision odds at any realistic corpus are ~N²/2⁶⁴; at fixture scale
    * they are nil, so any divergence is a logic bug, not a collision.
    */
  test("hashed-key line dedup equals the string-keyed form") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter"
    val df = Seq(
      (1L, s"unique alpha\n$boiler\nunique beta"),
      (2L, s"$boiler\nanother original line"),
      (3L, boiler),
      (4L, "standalone doc with one line"),
      (5L, "repeated inside one doc\nrepeated inside one doc\ntail line"))
      .toDF("doc_id", "text")
    val a = Pipeline.lineDedup(df).collect().toSeq
    val b = Pipeline.lineDedupHashed(df).collect().toSeq
    assert(a === b)
    // sanity: the corpus actually exercises dedup (not all lines unique)
    assert(a.exists(r => r.getLong(2) < r.getInt(1)))
  }

  /** Null-input parity with the q80 oracle: len(string_split(NULL)) is NULL
    * there, so n_lines must propagate NULL (not size()'s -1) while
    * n_kept/cleaned coalesce to 0/'' on both engines.
    */
  test("line dedup reports NULL n_lines (not -1) for a null-text doc") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "only line"), (2L, null))
      .toDF("doc_id", "text")
    val got = Pipeline.lineDedup(df).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getInt(1)),
          r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((Some(1), 1L, "only line")))
    assert(got(2L) === ((None, 0L, "")))
  }

  /** q97 corpus health: a planted corpus with a CROSS-source dup pair, a
    * within-source dup pair, null texts, and mixed langs — every report
    * column hand-computed. Dup membership is corpus-keyed ("aa bb" in web
    * and books are BOTH dups); null-text docs count in n_null_text but
    * never as dups, even though two share the null "value".
    */
  test("corpus health report: per-source and rollup rows hand-computed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb", "en", "web", 5L),      // dup with 4 (cross-source)
      (2L, "cc dd ee", "en", "web", 8L),   // unique
      (3L, null, "de", "web", 0L),         // null text
      (4L, "aa bb", "en", "books", 5L),    // dup with 1
      (5L, "ff gg", "fr", "books", 5L),    // dup with 6 (within-source)
      (6L, "ff gg", "fr", "books", 5L),    // dup with 5
      (7L, null, null, "books", 0L))       // null text AND lang
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Pipeline.corpusHealth(docs).collect()
      .map(r => ((if (r.isNullAt(0)) "<total>" else r.getString(0)), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))).toMap
    // (n_docs, n_null_text, n_dup_docs, n_tokens, sum_chars, n_langs)
    assert(got(("web", 0)) === ((3L, 1L, 1L, 5L, 13L, 2L)))
    assert(got(("books", 0)) === ((4L, 1L, 3L, 6L, 15L, 2L)))
    assert(got(("<total>", 1)) === ((7L, 2L, 4L, 11L, 28L, 3L)))
  }

  /** q100 training-shard assignment against a plain-Scala model: shard =
    * first 8 md5 hex digits of (salt ‖ doc_id) mod ShardCount, position =
    * rank of (md5, doc_id) within the shard — computed independently with
    * MessageDigest. The fixture plants a null-text doc (counts 0-token but
    * must shuffle like any other), input rows arrive in scrambled order
    * (the permutation must not care), and the whole assignment must be a
    * permutation: every input doc exactly once, positions contiguous from
    * 1 within each shard.
    */
  test("training shards match the md5 model and form a permutation") {
    import spark.implicits._
    def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = (1L to 40L).toSeq
    val docs = scala.util.Random.shuffle(
      ids.map(i => (i, if (i == 7L) null else s"tok " * i.toInt)))
      .toDF("doc_id", "text")
    val model = ids.map { i =>
      val sk = hex(Pipeline.ShuffleSalt + i)
      val shard = (java.lang.Long.parseLong(sk.take(8), 16) %
        Pipeline.ShardCount).toInt
      (i, shard, sk, if (i == 7L) 0L else i)
    }
    val want = model.groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
      rows.sortBy(r => (r._3, r._1)).zipWithIndex.map { case (r, k) =>
        (r._1, shard, k + 1, r._4)
      }
    }.sortBy(r => (r._2, r._3))
    val got = Pipeline.trainShards(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got === want)
    assert(got.map(_._1).sorted === ids, "not a permutation of the input")
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.size),
        s"shard $shard positions not contiguous") }
  }

  /** q105 snapshot drift on a planted corpus. The load-bearing case is
    * REGRADING: doc 14 was its duplicate cluster's keeper in the previous
    * snapshot; the current crawl adds doc 9 (identical text, lower id,
    * id % 10 == 9 so it is genuinely new) which takes keeper status —
    * doc 14 flips kept → dup_loser with status `changed` while its content
    * never changed. Around it: a stable keeper, a stable quality drop, a
    * stable dup_loser, and two arrivals (the usurper and a unique doc).
    */
  test("snapshot drift classifies arrivals, stable fates, and the regraded keeper") {
    import spark.implicits._
    def good(tag: String): String =
      (1 to 25).map(i => s"${tag}word$i").mkString(" ")
    val shared = good("dup")
    val docs = Seq(
      (1L, good("a")),   // kept in both snapshots -> stable
      (3L, "short"),     // fails the token floor in both -> stable
      (14L, shared),     // prev keeper, regraded by arriving doc 9
      (21L, shared),     // dup_loser in both -> stable
      (9L, shared),      // NEW: takes the cluster's keeper slot
      (19L, good("z")))  // NEW: unique, kept
      .toDF("doc_id", "text")
    val got = Pipeline.snapshotDrift(docs).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1),
          r.getString(2), r.getString(3)))).toMap
    assert(got.size === 6)
    assert(got(1L) === (("kept", "kept", "stable")))
    assert(got(3L) === (("quality_dropped", "quality_dropped", "stable")))
    assert(got(14L) === (("kept", "dup_loser", "changed")))
    assert(got(21L) === (("dup_loser", "dup_loser", "stable")))
    assert(got(9L) === ((null, "kept", "arrived")))
    assert(got(19L) === ((null, "kept", "arrived")))
  }

  /** q114 on real markup (the fixture texts carry none): script/style
    * content drops wholesale including tags nested inside it, comments and
    * balanced tags strip, the entity table decodes with &amp; last (so
    * escaped entities stay literal text), unterminated tags survive, and
    * whitespace collapses. Every expectation a hand-written literal.
    */
  test("markup strip: planted HTML cleans to the exact hand-computed text") {
    import spark.implicits._
    val html = "<html><head><script a=\"b\">var x = \"<p>hi</p>\";" +
      "</script><style>.a{}</style></head><body><!-- c -->" +
      "<h1>Title &amp; Co</h1><p>1 &lt; 2,&nbsp;&quot;it&#39;s&quot;</p>" +
      "</body></html>"
    val docs = Seq(
      1L -> html,
      2L -> "x &amp;lt; y",     // escaped entity: ONE decode, stays literal
      3L -> "a <b c",           // unterminated tag survives
      4L -> "plain text",       // untouched
      5L -> null.asInstanceOf[String])
      .toDF("doc_id", "text")
    val got = Pipeline.markupStrip(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val want1 = "Title & Co 1 < 2, \"it's\""
    assert(got(1L) === ((want1, (html.length - want1.length).toLong)))
    assert(got(2L) === (("x &lt; y", 4L)))
    assert(got(3L) === (("a <b c", 0L)))
    assert(got(4L) === (("plain text", 0L)))
    assert(got(5L) === (("", 0L)))
  }

  /** q115: bucket caps and pads at every edge (exact cap, cap+1, past the
    * top cap, null text), then the structural batching contract on every
    * (shard, bucket) cell: positions stay under the fixed-budget batch
    * size and (batch_idx, pos) is the gapless sequence 0..n-1 — the
    * property that makes the layout loadable without a directory.
    */
  test("length buckets: caps, pads, and contiguous fixed-budget batches") {
    import spark.implicits._
    val docs = ((1L to 300L).map { i =>
      i -> Seq.fill((i % 97).toInt)("tok").mkString(" ")
    } ++ Seq(
      1001L -> ("x " * 64).trim,          // exactly the floor cap
      1002L -> ("x " * 65).trim,          // one past -> next bucket
      1003L -> ("x " * 9000).trim,        // past the top cap: truncates
      1004L -> null.asInstanceOf[String], // 0 tokens at the floor
      1005L -> "")).toDF("doc_id", "text")
    val got = Pipeline.lengthBucketBatches(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getLong(6)))
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1001L)._4 === 64L && byId(1001L)._7 === 0L)
    assert(byId(1002L)._4 === 128L && byId(1002L)._7 === 63L)
    assert(byId(1003L)._4 === 8192L && byId(1003L)._7 === 0L)
    assert(byId(1004L)._2 === 0L && byId(1004L)._4 === 64L &&
      byId(1004L)._7 === 64L)
    assert(byId(1005L)._4 === 64L && byId(1005L)._7 === 64L)
    got.foreach { case (id, n, _, b, _, _, pad) =>
      val want = Pipeline.BucketCaps.find(_ >= n)
        .getOrElse(Pipeline.BucketCaps.last)
      assert(b === want, s"bucket of doc $id (n=$n)")
      assert(pad === b - math.min(n, b), s"pad of doc $id")
    }
    got.groupBy(t => (t._3, t._4)).foreach { case ((sh, b), rows) =>
      val bsz = (Pipeline.BatchTokenBudget / b).toInt
      assert(rows.forall(_._6 < bsz), s"pos >= batch size in ($sh, $b)")
      val flat = rows.map(t => t._5 * bsz + t._6).sorted.toVector
      assert(flat === (0 until rows.length).toVector,
        s"gapped batch numbering in ($sh, $b)")
    }
  }

  /** q127: within-doc line dedup on planted shapes — repeated lines keep
    * their FIRST occurrence in original order, unique docs round-trip
    * byte-identically (incl. a trailing newline), repeated EMPTY lines
    * collapse like any line, and null text fans back with zero counts.
    */
  test("doc line dedup keeps first occurrences in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a\nb\na\nc\nb"),              // dups of a and b drop
      (2L, "one\ntwo\nthree"),            // untouched
      (3L, "x\n"),                        // trailing newline round-trips
      (4L, "a\n\n\nb"),                   // repeated empty line collapses
      (5L, null.asInstanceOf[String]))    // nothing to clean
      .toDF("doc_id", "text")
    val got = Pipeline.docLineDedup(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(got(1L) === ((5L, 3L, Some("a\nb\nc"))))
    assert(got(2L) === ((3L, 3L, Some("one\ntwo\nthree"))))
    assert(got(3L) === ((2L, 2L, Some("x\n"))))
    assert(got(4L) === ((4L, 3L, Some("a\n\nb"))))
    assert(got(5L) === ((0L, 0L, None)))
  }

  /** q124: a uniform corpus packs to the arithmetic answer whatever md5
    * order the walk sees (600×3 fits the 2048 budget, +600 does not → 3
    * docs per sealed sequence), then the structural packing contracts on
    * a mixed corpus: per-sequence fill ≤ budget, offsets are the gapless
    * running sum in walk order, sequences seal ONLY when the next doc
    * would overflow (the next-fit law), and an over-budget doc truncates
    * to exactly one full sequence at offset 0.
    */
  test("sequence packing: budget, offsets, next-fit seal, truncation") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      Pipeline.packSequences(df).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5)))
    val uni = rows((1L to 100L).map(i =>
      i -> Seq.fill(600)("tok").mkString(" ")).toDF("doc_id", "text"))
    assert(uni.length === 100)
    val uniShardMax = uni.groupBy(_._2).map { case (sh, rs) =>
      sh -> rs.map(_._3).max }
    uni.groupBy(t => (t._2, t._3)).foreach { case ((sh, sq), rs) =>
      assert(rs.map(_._4).sorted.toVector ===
        (0 until rs.length).map(_ * 600L).toVector, s"offsets in ($sh, $sq)")
      if (sq < uniShardMax(sh))
        assert(rs.length === 3, s"sealed sequence ($sh, $sq) not full")
      else assert(rs.length <= 3, s"overfull tail sequence ($sh, $sq)")
    }
    // mixed: varied sizes (all ≥ 1 token so walk order == offset order),
    // one over-budget doc
    val mixed = rows(((1L to 200L).map { i =>
      i -> Seq.fill((i % 97).toInt + 1)("tok").mkString(" ")
    } :+ (1001L -> ("x " * 9000).trim)).toDF("doc_id", "text"))
    val big = mixed.find(_._1 == 1001L).get
    assert(big._4 === 0L && big._5 === Pipeline.SeqTokenBudget && big._6,
      "over-budget doc must fill its own sequence from offset 0")
    assert(mixed.filter(_._6).map(_._1).toSeq === Seq(1001L))
    val byShard = mixed.groupBy(_._2)
    byShard.foreach { case (sh, rs) =>
      val bySeq = rs.groupBy(_._3).map { case (sq, g) =>
        sq -> g.sortBy(_._4) }
      bySeq.foreach { case (sq, g) =>
        assert(g.map(_._5).sum <= Pipeline.SeqTokenBudget,
          s"overfull sequence ($sh, $sq)")
        g.zipWithIndex.foreach { case (t, k) =>
          assert(t._4 === g.take(k).map(_._5).sum,
            s"gapped offset for doc ${t._1} in ($sh, $sq)")
        }
      }
      (0 until bySeq.keys.max).foreach { sq =>
        val fill = bySeq(sq).map(_._5).sum
        assert(fill + bySeq(sq + 1).head._5 > Pipeline.SeqTokenBudget,
          s"sequence ($sh, $sq) sealed early — next doc would have fit")
      }
    }
  }

  /** q120 on a planted two-space corpus (all pair-members fit the anchor
    * cap): the embeddable near-dup pair emits with its min-id positive
    * and the model's gated, ranked negatives (the ≥ 0.35-cosine dup
    * suspect excluded, k = 3 cutting the weakest); pairs without
    * embeddings emit nothing; an all-same-label embedding space fans
    * anchors back with null negatives (positive-only examples).
    */
  test("contrastive pairs: positives, gated negatives, cap and fan-back") {
    import spark.implicits._
    def alpha(n: Int): String = n.toString.map(c => ('a' + (c - '0')).toChar)
    def nd(i: Int): (String, String) = {
      val t = (0 until 80).map(j => s"w${alpha(i)}x${alpha(j)}").toArray
      val u = t.clone(); u(10) = "wzzxa"; u(40) = "wzzxb"
      (t.mkString(" "), u.mkString(" "))
    }
    val (a1, a2) = nd(1); val (b1, b2) = nd(2); val (c1, c2) = nd(3)
    val docs = Seq(10L -> a1, 25L -> a2, // the embeddable anchor pair
      11L -> b1, 13L -> b2,              // near-dups, no embeddings
      15L -> c1, 20L -> c2)              // near-dups, no embeddings
      .toDF("doc_id", "text")
    val emb = Seq(
      (10L, 0, Seq(1.0, 0.0, 0.0)), (25L, 0, Seq(1.0, 0.01, 0.0)),
      (41L, 1, Seq(0.3, 0.954, 0.0)), (42L, 1, Seq(0.2, 0.98, 0.0)),
      (43L, 1, Seq(0.1, 0.995, 0.0)), (44L, 1, Seq(0.34, 0.94, 0.0)),
      (46L, 1, Seq(0.5, 0.87, 0.0))) // cos ~0.498: the gated dup suspect
      .toDF("id", "label", "v")
    val got = Pipeline.contrastivePairs(docs, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.map(_._1).toSet === Set(10L, 25L),
      "exactly the embeddable anchors emit")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def cos(a: Seq[Double], b: Seq[Double]): Double = r6(
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    val vecs = Map(10L -> Seq(1.0, 0.0, 0.0), 25L -> Seq(1.0, 0.01, 0.0),
      41L -> Seq(0.3, 0.954, 0.0), 42L -> Seq(0.2, 0.98, 0.0),
      43L -> Seq(0.1, 0.995, 0.0), 44L -> Seq(0.34, 0.94, 0.0),
      46L -> Seq(0.5, 0.87, 0.0))
    for ((anchor, positive) <- Seq(10L -> 25L, 25L -> 10L)) {
      val want = Seq(41L, 42L, 43L, 44L, 46L)
        .map(id => id -> cos(vecs(anchor), vecs(id)))
        .filter(_._2 < graft.operators.Similarity.NearDupCosine)
        .sortBy { case (id, c) => (-c, id) }
        .take(Pipeline.ContrastiveNegK)
      val rows = got.filter(_._1 == anchor).sortBy(_._3)
      assert(rows.forall(_._2 == positive), s"positive of $anchor")
      assert(rows.map(_._4).toSeq === want.map(_._1), s"negatives of $anchor")
      assert(want.size === Pipeline.ContrastiveNegK &&
        !want.map(_._1).contains(46L), "the dup suspect must be gated")
    }
    // all-same-label space: anchors fan back with null negatives
    val sameLabel = emb.withColumn("label",
      org.apache.spark.sql.functions.lit(0))
    val got2 = Pipeline.contrastivePairs(docs, sameLabel).collect()
    assert(got2.length === 2 && got2.forall(_.isNullAt(2)),
      "positive-only examples must survive with null negatives")
  }

  /** q135 exactness of the two-phase bucket cumsum: on the real fixture it
    * must equal the naive one-window form (global ORDER BY score DESC,
    * doc_id) row for row, including the cumulative values — and the budget
    * must actually cut the corpus.
    */
  test("token-budget selection equals the plain global window") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id").isNotNull)
    val per = graft.operators.TextAnalysis.classifierScoresUnsorted(docs)
      .select(col("doc_id"), col("n_tokens"), col("score_milli"))
    // exact integer division, matching both the engine and the oracle's //
    val budget = per.agg(coalesce(sum(col("n_tokens")), lit(0L)).as("total"))
      .select(expr(s"total * ${Pipeline.BudgetPct} DIV 100")
        .cast("long").as("budget"))
    val naive = per
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        Window.orderBy(col("score_milli").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("doc_id"), col("score_milli"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col("doc_id"))
    val got = Pipeline.tokenBudgetSelect(docs, Pipeline.BudgetPct)
      .collect().toSeq
    val want = naive.collect().toSeq
    assert(want.nonEmpty && want.size < docs.count(), "budget did not cut")
    assert(got === want)
  }

  /** q135 model check: the selection is the longest prefix of the
    * (score DESC, doc_id) order whose token mass fits the budget —
    * recomputed with a plain Scala fold over the scored corpus, including
    * a zero-token doc (selected for free wherever the order puts it).
    */
  test("token-budget selection takes the longest affordable prefix") {
    import spark.implicits._
    val docs = ((1 to 40).map { i =>
      (i.toLong, ((i * 7) to (i * 7 + i)).map(j => s"w${j % 97}")
        .mkString(" "))
    } :+ (99L, "")).toDF("doc_id", "text")
    val scored = graft.operators.TextAnalysis.classifierScoresUnsorted(docs)
      .select("doc_id", "n_tokens", "score_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = scored.map(_._2).sum
    val budgetTok = total * Pipeline.BudgetPct / 100
    var cum = 0L
    val want = scored.sortBy { case (id, _, s) => (-s, id) }.flatMap {
      case (id, n, s) =>
        cum += n
        if (cum <= budgetTok) Some((id, s, n, cum)) else None
    }.sortBy(_._1).toSeq
    val got = Pipeline.tokenBudgetSelect(docs, Pipeline.BudgetPct).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(want.nonEmpty && want.size < scored.length, "budget did not cut")
    assert(got === want)
  }

  /** q135 degenerate-score skew: when EVERY doc carries the same score
    * (one score cell — the hot-key case the (score, shard) cells exist
    * for), selection must still equal the naive global window, and the
    * order inside the run is pure doc_id.
    */
  test("token-budget selection survives an all-equal-score corpus") {
    import spark.implicits._
    val text = (1 to 9).map(i => s"same tokens here w$i").mkString(" ")
    val docs = (1L to 60L).map(i => (i, text)).toDF("doc_id", "text")
    val got = Pipeline.tokenBudgetSelect(docs, Pipeline.BudgetPct).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // equal scores -> selection is the doc_id prefix; 30% of 60 equal-mass
    // docs = the first 18, cum strictly increasing by the shared size
    assert(got.map(_._1).toSeq === (1L to 18L))
    val sz = got.head._2
    assert(got.map(_._2).toSeq === (1L to 18L).map(_ * sz))
  }

  /** q137 exactness of the salted two-phase rank: on the real fixture the
    * sample must equal the naive single-window form row for row, columns
    * AND estimator weights.
    */
  test("priority sample equals the plain per-source window") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id").isNotNull && col("source").isNotNull)
    val k = Pipeline.PrioritySampleK
    val pr = docs.select(col("doc_id"), col("source"),
        greatest(coalesce(graft.functions.text.tokenCount(col("text")),
          lit(0L)), lit(1L)).as("w"))
      .withColumn("u", conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 7), 16, 10)
        .cast("long") + lit(1L))
      .withColumn("priority", expr(s"w * ${Pipeline.PriorityScale} DIV u"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("priority").desc, col("doc_id"))))
    val tau = pr.filter(col("rnk") === k + 1)
      .select(col("source"), col("priority").as("tau"))
    val naive = pr.filter(col("rnk") <= k)
      .join(broadcast(tau), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("w"), col("priority"),
        col("rnk"), greatest(col("w"), coalesce(col("tau"), lit(0L)))
          .as("w_hat"))
      .orderBy(col("doc_id"))
    val got = Pipeline.prioritySample(docs, k).collect().toSeq
    val want = naive.collect().toSeq
    assert(want.nonEmpty && want.size < docs.count(), "sample did not cut")
    assert(got === want)
  }

  /** q137 planted model check: u/priority/τ/ŵ recomputed independently with
    * java.security MessageDigest. srcA has k+2 docs (τ exists, ŵ = max(w,
    * τ)); srcB has 2 docs < k (no τ, ŵ == w, all sampled).
    */
  test("priority sampling: τ and ŵ mechanics from planted weights") {
    import spark.implicits._
    val k = 4
    val docs = ((1 to 6).map(i =>
      (i.toLong, (1 to i * 3).map(j => s"t$j").mkString(" "), "srcA")) ++
      Seq((21L, "one two", "srcB"), (22L, "one two three", "srcB")))
      .toDF("doc_id", "text", "source")
    def md5u(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(7), 16) + 1L
    }
    val model = Seq(
      (1 to 6).map(i => (i.toLong, "srcA", (i * 3).toLong)),
      Seq((21L, "srcB", 2L), (22L, "srcB", 3L))).flatten
      .map { case (id, s, w) =>
        (id, s, w, w * Pipeline.PriorityScale / md5u(id))
      }
    val want = model.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val ranked = rows.sortBy { case (id, _, _, p) => (-p, id) }
      val tau = if (ranked.length > k) Some(ranked(k)._4) else None
      ranked.take(k).zipWithIndex.map { case ((id, s, w, p), i) =>
        (id, s, w, p, i + 1, math.max(w, tau.getOrElse(0L)))
      }
    }.sortBy(_._1)
    val got = Pipeline.prioritySample(docs, k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5))).toSeq
    assert(got === want)
    // srcB is exhaustively sampled with ŵ == w (no τ below k members)
    got.filter(_._2 == "srcB").foreach { case (_, _, w, _, _, wHat) =>
      assert(wHat === w)
    }
    assert(got.count(_._2 == "srcB") === 2)
  }

  /** q138 exactness anchor: with k ≥ every source size the sample is
    * exhaustive, no τ exists, ŵ ≡ w — so every language's estimate equals
    * its true token mass with zero error, even though language crosses
    * source arbitrarily.
    */
  test("sample estimate is exact when the sample is exhaustive") {
    import spark.implicits._
    val docs = (1 to 12).map { i =>
      (i.toLong, (1 to i + 1).map(j => s"t$j").mkString(" "),
        s"src${i % 3}", if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "source", "lang")
    val got = Pipeline.sampleEstimate(docs, k = 16).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length === 2)
    got.foreach { case (_, est, truth, absErr, errPct) =>
      assert(est === truth && absErr === 0L && errPct === 0L)
    }
    // and the truth side is the plain per-lang token mass
    val want = (1 to 12).groupBy(i => if (i % 2 == 0) "en" else "de")
      .view.mapValues(_.map(i => (i + 1).toLong).sum).toMap
    got.foreach { case (lang, _, truth, _, _) =>
      assert(truth === want(lang))
    }
  }

  /** q138 under-sampled: one hot source (20 docs, k = 4) — estimates stay
    * positive integers, and a subset fully inside the sampled set is still
    * estimated EXACTLY when its members all exceed τ... here we assert the
    * structural invariants (est ≥ 0, err = |est − truth|) against an
    * independent Scala model of the full estimator.
    */
  test("sample estimate matches the plain-Scala estimator model under-sampled") {
    import spark.implicits._
    val k = 4
    val docs = (1 to 20).map { i =>
      (i.toLong, (1 to 3 * i).map(j => s"t$j").mkString(" "),
        "hot", if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "source", "lang")
    def md5u(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(7), 16) + 1L
    }
    val model = (1 to 20).map { i =>
      val w = 3L * i
      (i.toLong, if (i % 2 == 0) "en" else "de", w,
        w * Pipeline.PriorityScale / md5u(i.toLong))
    }
    val ranked = model.sortBy { case (id, _, _, p) => (-p, id) }
    val tau = ranked(k)._4
    val est = ranked.take(k).groupBy(_._2).view
      .mapValues(_.map { case (_, _, w, _) => math.max(w, tau) }.sum).toMap
    val truth = model.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toMap
    val got = Pipeline.sampleEstimate(docs, k).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    Seq("en", "de").foreach { lang =>
      val (e, t, a, pct) = got(lang)
      assert(e === est.getOrElse(lang, 0L), s"$lang estimate")
      assert(t === truth(lang))
      assert(a === math.abs(e - t))
      assert(pct === a * 10000 / t)
    }
  }
}
