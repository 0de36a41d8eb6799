package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipeline, Similarity}
import graft.sources.PartitionedParquet

/** The end-to-end curation RUN: every stage of the shipped curation family,
  * chained as ONE artifact-writing job (reference: the pipeline a
  * `mapreduce.c`-style engine would run as separate driver programs over
  * intermediate files; here the whole chain is one lazily-planned Spark job
  * graph with explicit materialization points).
  *
  *   q44 gates → q94 classifier gate → q18 exact dedup → q21+q56 near-dup
  *   resolution → q57-style
  *   eval-window doc drop   (= q88's six funnel stages, BY CONSTRUCTION:
  *   the run consumes [[Pipeline.curationStages]]'s own frames, so the
  *   manifest's first six rows hash-match the q88 oracle without any
  *   re-implementation)
  *   → q85 semantic dedup (SemDeDup, over survivors carrying embeddings)
  *   → q80b corpus-duplicated line strip (hashed production form)
  *   → q84 duplicated-span surgery
  *   → q89 per-source cap (salted two-phase)
  *   → q75 language-mixture sampling
  *   → q100 training-shard assignment (the `shards/` artifact).
  *
  * q86's eval-window CUT is deliberately absent: the funnel's stage 5
  * already DROPS every doc sharing an eval window (q88's doc-drop policy),
  * so the surgical cut over its survivors flags nothing by construction —
  * a run that prefers surgery to dropping would swap stage 5 for q86, not
  * run both.
  *
  * Artifacts under `outDir`:
  *   - `corpus/` — the cleaned corpus, Hive-partitioned by `lang` and
  *     doc_id-sorted within files ([[PartitionedParquet]]): (doc_id, lang,
  *     source, text, n_tokens)
  *   - `verdicts/source_cap/` — q89's kept set (doc_id, source, src_rank)
  *   - `verdicts/sample/` — q75's per-doc verdict (doc_id, lang, rate_e6,
  *     kept), losers included (the run's sampling audit trail)
  *   - `verdicts/doc_fates/` — every raw doc with the LAST stage it
  *     survived (doc_id, last_stage_idx, last_stage): the per-document
  *     "why did my doc disappear" answer
  *   - `manifest/` — the q88 funnel extended with the run-only stages:
  *     (stage_idx, stage, docs, tokens), one row per stage.
  *
  * Shape for 100 TB: per-stage costs are the member operators' own (each
  * documented at its definition); the chain adds only (a) localCheckpoints
  * at frames consumed by 2+ downstream branches (stat + next stage — q78's
  * between-stages lesson: re-reading materialized partitions beats
  * re-executing a gram-explode or CC lineage per branch), and (b) id-only
  * joins to fan dimension columns (lang, source) back onto survivor frames
  * — text never rides a join it doesn't need. The doc-fates table is a
  * fold of id-only left joins (eleven frames of strictly nested survivor
  * sets), never a text shuffle.
  */
object CurationRun {

  /** Stage-wall timer for the scale audits (SCALE.md's CurationRun table):
    * every stage boundary in [[run]] is an EAGER materialization
    * (localCheckpoint / sink write), so wrapping the block bounds that
    * stage's wall. stderr-only observability — no data-path effect.
    */
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(
      f"[curation-run] stage-wall $label%-12s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  /** Execute the chain over `sfDir`'s documents table, write all sink
    * artifacts under `outDir`, and return the manifest (also written).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String): DataFrame = {
    // one parquet scan feeds the funnel AND both dimension fan-backs
    val docs = timed("scan") {
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .localCheckpoint()
    }
    // curationStages materializes its member frames eagerly, so this block
    // carries the quality-gate + exact-dedup + near-dedup wall
    val funnel = timed("funnel") {
      Pipeline.curationStages(
        docs.select(col("doc_id"), col("text")), Pipeline.EvalEvery)
    }
    // decontaminated survivors: stat + line-dedup input (gram-join lineage
    // behind it — materialize, q78 precedent)
    val dec = timed("decon_ckpt") { funnel.last._2.localCheckpoint() }

    // stage 6: semantic dedup (q85, the SemDeDup step) over survivors that
    // CARRY embeddings — text dedup cannot see a paraphrased copy, the
    // embedding space can. CONTRACT: the embeddings table is keyed so that
    // vec_id == the doc_id of the document it embeds (TESTDATA.md's
    // one-embedding-per-doc layout) — the join below depends on it, and
    // CurationRunSpec asserts a non-trivial hit count so a schema drift
    // that breaks the alignment fails loudly instead of silently turning
    // this stage into a pass-through. Docs without an embedding pass
    // through unjudged (they were never clusterable); each ≥ 0.95-cosine
    // component keeps its min doc_id. The drop set is an id-only
    // left-anti join — text never rides the vector machinery.
    val semdeduped = timed("sem_dedup") {
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("doc_id"),
          graft.functions.vectors.toDouble(col("embedding")).as("v"))
        .filter(col("v").isNotNull)
      val subject = dec.select(col("doc_id")).join(emb, Seq("doc_id"))
      val verdict = Similarity.semanticDedup(
        subject.select(col("doc_id").as("vec_id")),
        subject.select(col("doc_id").as("vec_id"), col("v")),
        Similarity.SemDedupCosine)
      dec.join(
          verdict.filter(!col("is_kept"))
            .select(col("vec_id").as("doc_id")),
          Seq("doc_id"), "left_anti")
        .localCheckpoint()
    }

    // stage 7: strip corpus-duplicated lines (q80b's 64-bit-key form);
    // boilerplate-only docs empty out and leave the corpus here
    val lined = timed("line_dedup") {
      Pipeline.lineDedupHashed(semdeduped.select(col("doc_id"), col("text")))
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("cleaned").as("text"))
        .withColumn("n_tokens", graft.functions.text.tokenCount(col("text")))
        .localCheckpoint()
    }

    // stage 8: cut corpus-duplicated 8-token spans (q84); span-only docs
    // leave. Post-cut token count is exact arithmetic on spanCut's own
    // columns (kept = n_tokens - n_cut), not a re-tokenize.
    val cut = timed("span_cut") {
      Dedup.spanCut(lined.select(col("doc_id"), col("text")))
        .filter(col("n_tokens") - col("n_cut") > 0)
        .select(col("doc_id"), col("cleaned").as("text"),
          (col("n_tokens") - col("n_cut")).as("n_tokens"))
        .localCheckpoint()
    }

    // stage 9: per-source cap (q89's salted two-phase rank — the verdict
    // frame is the artifact; the survivor frame is an id-only semi join)
    val (capVerdict, capped) = timed("source_cap") {
      val v = Pipeline.sourceCap(
        cut.join(docs.select(col("doc_id"), col("source")), Seq("doc_id")),
        Pipeline.SourceCap).localCheckpoint()
      (v, cut.join(v.select(col("doc_id")), Seq("doc_id")).localCheckpoint())
    }

    // stage 10: language-mixture sampling (q75) — verdict keeps the losers
    // (audit trail); the corpus keeps the winners
    val (sampleVerdict, sampled) = timed("sampled") {
      val v = Pipeline.mixtureSample(
        capped.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("text"))).localCheckpoint()
      (v, capped
        .join(v.filter(col("kept")).select(col("doc_id")), Seq("doc_id"))
        .localCheckpoint())
    }

    // the funnel's last frame is re-read by the manifest stat AND the fates
    // fold — swap in the checkpointed copy so neither re-executes the
    // gram-explode decontamination lineage
    val stages = (funnel.init :+ (funnel.last._1 -> dec)) ++
      Seq("sem_dedup" -> semdeduped, "line_dedup" -> lined, "span_cut" -> cut,
        "source_cap" -> capped, "sampled" -> sampled)
    val manifest = stages.zipWithIndex
      .map { case ((name, df), i) => Pipeline.funnelStat(df, i, name) }
      .reduce(_.union(_))
      .orderBy(col("stage_idx"))

    // per-doc fate: survivor sets are strictly nested, so the last stage a
    // doc appears in is its fate — a fold of id-only left joins
    val fates = stages.zipWithIndex.tail.foldLeft(
      stages.head._2.select(col("doc_id"),
        lit(0).as("last_stage_idx"), lit(stages.head._1).as("last_stage"))) {
      case (acc, ((name, df), i)) =>
        acc.join(df.select(col("doc_id"), lit(true).as("hit")),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("hit"), lit(i)).otherwise(col("last_stage_idx"))
              .as("last_stage_idx"),
            when(col("hit"), lit(name)).otherwise(col("last_stage"))
              .as("last_stage"))
    }

    val corpus = sampled
      .join(docs.select(col("doc_id"), col("lang"), col("source")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("n_tokens"))

    // stage 11: training-shard assignment (q100) over the survivors — the
    // run's OUTPUT is a training-READY corpus: shard-partitioned files
    // whose on-disk row order (pos within shard) IS the deterministic
    // training order, re-runnable to identical bytes and epoch-reseedable
    // via Pipeline.ShuffleSalt
    val sharded = timed("shards") {
      corpus.join(
          Pipeline.trainShards(sampled.select(col("doc_id"), col("text")))
            .select(col("doc_id"), col("shard"), col("pos")),
          Seq("doc_id"))
        .select(col("shard"), col("pos"), col("doc_id"), col("lang"),
          col("source"), col("text"), col("n_tokens"))
    }
    timed("artifacts") {
      PartitionedParquet.write(corpus, s"$outDir/corpus", "lang", "doc_id")
      PartitionedParquet.write(sharded, s"$outDir/shards", "shard", "pos")
      capVerdict.write.mode("overwrite").parquet(s"$outDir/verdicts/source_cap")
      sampleVerdict.write.mode("overwrite").parquet(s"$outDir/verdicts/sample")
      fates.write.mode("overwrite").parquet(s"$outDir/verdicts/doc_fates")
      manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    }
    manifest
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurationRun <sfDir> <outDir>")
    val spark = Sessions.local("graft-curation-run")
    val t0 = System.nanoTime()
    val manifest = run(spark, args(0), args(1))
    val rows = manifest.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    rows.foreach(r => println(
      f"[curation-run] stage ${r.getInt(0)}%d ${r.getString(1)}%-15s docs=${r.getLong(2)}%d tokens=${r.getLong(3)}%d"))
    println(f"[curation-run] wrote ${args(1)} in $secs%.1f s")
    spark.stop()
  }
}
