package graft

import java.nio.file.Files

import graft.operators.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation run against the sf0.001 fixture: one command must
  * produce sink artifacts whose funnel rows match q88's (the driver's
  * oracle gate for the same six stages), plus the run-only extension
  * stages and verdict tables consistent with the corpus it wrote.
  */
class CurationRunSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val outDir = {
    val d = Files.createTempDirectory("curation_run").toString
    CurationRun.run(spark, sfDir, d).collect() // materialize once
    d
  }

  test("manifest's first six rows equal q88's funnel (the oracle surface)") {
    val manifest = spark.read.parquet(s"$outDir/manifest")
      .orderBy(col("stage_idx")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val q88 = Pipeline.q88(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(manifest.take(6) === q88, "funnel drift vs the q88 oracle surface")
    assert(manifest.map(_._1).toSeq === (0 until 11),
      "eleven stages, contiguous indices")
    assert(manifest.map(_._2).contains("sem_dedup"), "SemDeDup stage missing")
    // every knife only removes: docs and tokens are monotone non-increasing
    // after the raw stage (raw counts null-text docs that quality drops)
    manifest.sliding(2).drop(1).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"stage ${b._2} grew vs ${a._2}")
    }
  }

  test("sem_dedup's doc_id == vec_id keying contract holds on the fixture") {
    // the SemDeDup stage joins documents to embeddings on doc_id == vec_id
    // (one embedding per doc, same key — the declared CurationRun
    // contract); if a fixture or schema change broke the alignment the
    // stage would silently become a pass-through, so assert the join is
    // non-trivial here
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    val hits = docs.join(Tables.embeddings(spark, sfDir),
      col("doc_id") === col("vec_id")).count()
    assert(hits > 0, "documents ⋈ embeddings on doc_id == vec_id is empty — " +
      "the sem_dedup stage's keying contract is broken")
  }

  test("corpus artifact is lang-partitioned and matches the final stage row") {
    val corpus = spark.read.parquet(s"$outDir/corpus")
    val last = spark.read.parquet(s"$outDir/manifest")
      .orderBy(col("stage_idx").desc).head()
    assert(last.getString(1) === "sampled")
    assert(corpus.count() === last.getLong(2), "corpus rows != manifest docs")
    assert(corpus.agg(sum(col("n_tokens"))).head().getLong(0) ===
      last.getLong(3), "corpus tokens != manifest tokens")
    val langDirs = new java.io.File(s"$outDir/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("lang=")),
      "corpus must be Hive-partitioned by lang")
  }

  test("verdict tables agree with the corpus") {
    val corpusIds = spark.read.parquet(s"$outDir/corpus")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // every shipped doc was kept by the sampler…
    val keptIds = spark.read.parquet(s"$outDir/verdicts/sample")
      .filter(col("kept")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(corpusIds.subsetOf(keptIds), "shipped doc the sampler rejected")
    // …and survived the source cap
    val cappedIds = spark.read.parquet(s"$outDir/verdicts/source_cap")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(corpusIds.subsetOf(cappedIds), "shipped doc over the source cap")
    // doc fates cover every raw doc and agree on the shipped set
    val fates = spark.read.parquet(s"$outDir/verdicts/doc_fates")
    val rawDocs = spark.read.parquet(s"$outDir/manifest")
      .filter(col("stage") === "raw").head().getLong(2)
    assert(fates.count() === rawDocs, "doc_fates must cover every raw doc")
    val shipped = fates.filter(col("last_stage") === "sampled")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(shipped === corpusIds, "doc_fates 'sampled' set != corpus")
  }

  /** Round-13 #1: the run persists the coarse codebook it used
    * (`model/coarse`), and a second run reusing it produces an IDENTICAL
    * manifest with the fit skipped — the train-once/serve-many contract
    * that makes two snapshots' semantic-dedup verdicts comparable.
    */
  test("a reuse-models rerun loads the prior codebook and reproduces the manifest exactly") {
    // the first run (outDir) must have written its model artifact
    val stored = graft.sources.ModelStore.loadQuantizer(
      spark, s"$outDir/model/coarse")
    assert(stored.nCells > 0, "first run wrote an empty codebook")
    val reuseDir = Files.createTempDirectory("curation_run_reuse").toString
    CurationRun.run(spark, sfDir, reuseDir,
      CurationParams(reuseModels = Some(outDir))).collect()
    def rows(d: String) = spark.read.parquet(s"$d/manifest")
      .orderBy(col("stage_idx")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows(reuseDir) === rows(outDir),
      "manifest drift under a reused codebook — verdicts not comparable")
    // the reused run re-publishes the codebook it served from, so ANY run
    // can seed the next; it must be the same model bit-for-bit
    val republished = graft.sources.ModelStore.loadQuantizer(
      spark, s"$reuseDir/model/coarse")
    (stored, republished) match {
      case (graft.operators.FlatQuantizer(a), graft.operators.FlatQuantizer(b)) =>
        assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq,
          "republished codebook drifted")
      case _ => fail("fixture-scale quantizer should be flat on both runs")
    }
    // provenance: the reuse source is recorded in run_params
    val rp = spark.read.parquet(s"$reuseDir/run_params").head()
    assert(rp.getAs[String]("reused_models_from") === outDir)
  }

  /** Stage 10 (q100): the shards artifact must be a PERMUTATION of the
    * shipped corpus — every corpus doc exactly once, shard dirs
    * Hive-partitioned, positions contiguous from 1 within each shard, and
    * each doc's (shard, pos) equal to what q100's registered core assigns
    * (the writer may not drift from the assignment the oracle hashes).
    */
  test("shards artifact is a training-ready permutation of the corpus") {
    val corpusIds = spark.read.parquet(s"$outDir/corpus")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val shards = spark.read.parquet(s"$outDir/shards")
      .select(col("doc_id"), col("shard"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(shards.map(_._1).toSet === corpusIds, "shards != corpus doc set")
    assert(shards.length === corpusIds.size, "a doc appears twice")
    shards.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.size).toArray,
        s"shard $shard positions not contiguous") }
    val shardDirs = new java.io.File(s"$outDir/shards").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(shardDirs.nonEmpty && shardDirs.forall(_.startsWith("shard=")),
      "shards must be Hive-partitioned by shard")
    import spark.implicits._
    val want = Pipeline.trainShards(
        spark.read.parquet(s"$outDir/corpus").select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("shard"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(shards.toSet === want, "written shards drifted from q100's assignment")
  }
}
