package graft.streaming

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-visible Structured Streaming evidence (SURVEY §2.8): q55 replays
  * the `events` parquet through a REAL file-streaming source and drains the
  * watermarked tumbling aggregation — the execution path is
  * `StreamingQuery`/micro-batch, not batch, yet the drained result equals
  * the batch twin q14 by construction (same transform, complete-mode sink),
  * so q14's oracle SQL hash-checks it.
  *
  * Scale shape: the file source is incremental (maxFilesPerTrigger bounds a
  * micro-batch at cluster scale), state is the watermarked window store
  * (O(open windows × event types), never O(history)); the memory sink holds
  * only the aggregated result, which is what any production sink would
  * receive.
  */
object StreamReplay {

  private val runSeqs =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  // schema per events path, validated by a content signature: the batch
  // footer read that seeds the file-stream source is immutable per fixture
  // version, but a resident session (bench settle runs × 5 replay queries)
  // was paying it on every invocation. One entry per path (superseded
  // signatures are REPLACED, not accumulated), and the signature folds the
  // mtime+length of every part file for a directory-form fixture — a
  // directory whose part files are rewritten in place under the same names
  // keeps its own mtime, so a directory-level stat alone could serve a
  // stale schema after an in-place regen.
  private val sourceMeta = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, org.apache.spark.sql.types.StructType)]()

  /** A fixture table as a REAL file-stream source. File-stream sources
    * need an explicit schema: one metadata-only batch read supplies it.
    * The source's basePath must be a DIRECTORY: a directory-form
    * `<table>.parquet` (the normal Spark/cluster layout) streams directly,
    * while the driver fixture's single-FILE form streams the parent
    * directory with pathGlobFilter selecting just that file — the glob
    * matches leaf file names only, so it must never be applied to the
    * directory form (it would match no part-files and silently stream
    * nothing).
    */
  private def replayTable(spark: SparkSession, dir: String,
      table: String): DataFrame = {
    val path = s"$dir/$table.parquet"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val status = fs.getFileStatus(hPath)
    val isDir = status.isDirectory
    // cheap per-call signature: single file → its own (mtime, len); directory
    // → fold over the direct children so in-place part rewrites invalidate
    val sig =
      if (isDir)
        fs.listStatus(hPath).foldLeft(status.getModificationTime) {
          (acc, s) => acc * 31 + s.getModificationTime * 31 + s.getLen
        }
      else status.getModificationTime * 31 + status.getLen
    val schema = sourceMeta.compute(path, (_, cur) =>
      if (cur != null && cur._1 == sig) cur
      else (sig, spark.read.parquet(path).schema))._2
    if (isDir) spark.readStream.schema(schema).parquet(path)
    else spark.readStream.schema(schema)
      .option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }

  /** The `events` table as a file stream (ts normalized through
    * Tables.withEventTime, exactly as in Tables.events).
    */
  private def replayEvents(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.withEventTime(replayTable(spark, dir, "events"))

  /** Stateful-operator partition count for the replays. Each micro-batch
    * pays a fixed commit cost PER state-store instance (= shuffle
    * partitions × stateful operators: q73's dual join state at 32
    * partitions spent 7.3 s where 8 partitions spend 2.6 s on identical
    * data — measured, settled, same session). The replay fixture's state is
    * tiny, so fewer, fuller stores win; at cluster scale this is the same
    * sizing decision as the batch shuffle knob — partitions proportional to
    * state volume, not a constant.
    */
  val StatePartitions = 8

  /** Diagnostic only (lastCcRounds precedent): state-operator metrics of
    * the most recent drain in this JVM — (operatorName, numRowsTotal,
    * numRowsUpdated, numRowsDroppedByWatermark) summed/maxed over
    * micro-batches. Measurement probes (tools/stream_skew_probe.scala) read
    * it to assert state stays O(distinct keys) on dup-heavy replays; not
    * part of the query surface.
    */
  @volatile var lastStateOps: Seq[(String, Long, Long, Long)] = Nil

  private def drain(df: DataFrame, sinkPrefix: String, mode: String): DataFrame = {
    val spark = df.sparkSession
    // a memory sink registers a temp view per run; drop the previous run's
    // so a resident session (bench reruns, spec suites) doesn't accumulate
    // one pinned result table per execution
    val seq = runSeqs.computeIfAbsent(sinkPrefix,
      _ => new java.util.concurrent.atomic.AtomicInteger(0))
    val prev = seq.get()
    if (prev > 0) spark.catalog.dropTempView(s"${sinkPrefix}_$prev")
    val sink = s"${sinkPrefix}_${seq.incrementAndGet()}"
    // partition count binds at query start; restore after the (synchronous)
    // drain so batch plans in the same session keep the session sizing.
    // Serialized on this object: suites run sequentially today (forked JVM,
    // testForkedParallel off), but a concurrent drain would race the
    // session-global conf save/restore — the lock closes that class of bug
    // outright (drains are sub-second-to-seconds; contention is irrelevant).
    StreamReplay.synchronized {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", StatePartitions)
      try {
        val query = df.writeStream
          .format("memory")
          .queryName(sink)
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
        try query.awaitTermination()
        finally {
          // capture per-operator state metrics before stop clears progress:
          // numRowsTotal is a gauge (max over batches), the others counters
          lastStateOps = query.recentProgress.toSeq
            .flatMap(_.stateOperators.toSeq)
            .groupBy(_.operatorName)
            .map { case (op, ps) =>
              (op, ps.map(_.numRowsTotal).max, ps.map(_.numRowsUpdated).sum,
                ps.map(_.numRowsDroppedByWatermark).sum)
            }.toSeq
          query.stop()
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
    spark.table(sink)
  }

  def q55(spark: SparkSession, dir: String): DataFrame =
    drain(EventStreams.tumblingCounts(replayEvents(spark, dir)),
      "q55_replay_sink", "complete")
      .orderBy(col("bucket_ms"), col("event_type"))

  /** q61: streaming ingest dedup, driver-visible — the replayed events run
    * through the watermark-evicting dropDuplicatesWithinWatermark state
    * (append mode: rows emit as they arrive, so unlike session output the
    * drained result does not depend on the final watermark). The fixture's
    * event_ids are unique, so the drained stream must equal the table
    * row-for-row; the duplicate-suppression behavior itself is
    * planted-dup-checked in StreamingSpec.
    */
  def q61(spark: SparkSession, dir: String): DataFrame =
    drain(EventStreams.dedupEvents(replayEvents(spark, dir))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value")),
      "q61_dedup_sink", "append")
      .orderBy(col("event_id"))

  /** q70: custom-state sessionizer, driver-visible — the replayed file
    * stream runs through the flatMapGroupsWithState sessionizer
    * (`StatefulSessions`) and the drained CLOSED sessions hash-match q15's
    * batch oracle.
    *
    * Sessions only emit when the event-time watermark passes their gap
    * horizon, so the replay unions a single far-future SENTINEL row (one
    * driver-side row via MemoryStream — the data itself still streams from
    * the file source): after the data batch, the watermark jumps past every
    * session's end+gap and the trailing no-data micro-batch fires the
    * event-time timeouts that flush the tail sessions. The sentinel user's
    * own open session never emits (nothing outlives the sentinel) and is
    * filtered defensively. session_id is assigned post-drain by start
    * order per user — a presentation window over the (small) session list,
    * matching the batch idiom's cumulative numbering.
    */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = replayEvents(spark, dir)
      .select(col("ts"), col("user_id"))
      // planted-null robustness: a null event time cannot sessionize (the
      // batch form degenerates too — the gate's fixture has no null ts)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
    val sentinel =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long)]
    sentinel.addData(Seq((java.sql.Timestamp.valueOf("2100-01-01 00:00:00"), -1L)))
    val union = src.unionByName(sentinel.toDF().toDF("ts", "user_id"))
    val drained = drain(
      StatefulSessions.sessionizeWithState(union).toDF(),
      "q70_sessions_sink", "append")
    drained.filter(col("user_id") >= 0)
      .withColumn("session_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("start_us"))).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("dur_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q72: sliding-window replay — q40's watermarked 1 h/30 min counts
    * drained through the same real file-stream path as q55 (complete-mode
    * sink; each event updates its two overlapping windows in the state
    * store). Completes the driver-visible streaming quartet: tumbling agg
    * (q55), stateful dedup (q61), custom-state sessions (q70), sliding agg
    * (q72) — every streaming-tier operator family has an oracle-checked
    * micro-batch execution row.
    */
  def q72(spark: SparkSession, dir: String): DataFrame =
    drain(EventStreams.slidingCounts(replayEvents(spark, dir)),
      "q72_sliding_sink", "complete")
      .orderBy(col("bucket_ms"), col("event_type"))

  /** q73: stream-stream range join, driver-visible — the replayed file
    * stream self-joins through `EventStreams.clicksBeforePurchase` (clicks
    * within the hour before each purchase by the same user). Both sides are
    * watermarked and the time-range predicate bounds the join state: a
    * buffered click is droppable once the purchase-side watermark passes
    * click_ts + 1 h, so state is O(events in the lateness horizon), never
    * O(history). Append mode is the only output mode stream-stream joins
    * support; with Trigger.AvailableNow every match emits before the drain
    * returns, so a plain batch self-join SQL is the oracle. Completes the
    * streaming evidence set: tumbling (q55), dedup (q61), sessions (q70),
    * sliding (q72), stream-stream join (q73).
    */
  def q73(spark: SparkSession, dir: String): DataFrame =
    drain(EventStreams.clicksBeforePurchase(replayEvents(spark, dir)),
      "q73_ssjoin_sink", "append")
      .orderBy(col("user_id"), col("purchase_id"), col("click_id"))

  /** q106: streaming model-serve drift monitor — the ONLINE member of the
    * train-once/serve-many family (q104 is the batch one). A codebook
    * trained offline (the q39b deterministic lowest-id seeds, so the whole
    * path is SQL-mirrorable) goes through the [[graft.sources.ModelStore]]
    * save→load seam, and the corpus then streams through a REAL
    * file-stream source with the LOADED quantizer assigning every arrival
    * to its IVF cell inside the micro-batch: plan-literal assignment in
    * codegen, a stream-static broadcast join fetching the assigned
    * centroid, and a per-cell running aggregate of arrivals and quantized
    * centroid affinity (floor(round(cos, 6)·10⁶) — exact integers, so the
    * complete-mode sums are micro-batch-split-independent and the DuckDB
    * batch mirror hashes them). This is the serving-side monitor a
    * production ANN/dedup deployment runs at ingest: cell-mass shift and
    * falling mean affinity are exactly the "distribution left the trained
    * quantizer behind — retrain" signal (q105 reports drift between batch
    * snapshots; q106 watches it arrive).
    *
    * Scale shape: state is the per-cell aggregate — O(k cells), never
    * O(arrivals); the centroid join broadcasts KB-scale model state; the
    * payload vectors die inside the micro-batch (only (cell, qc) reaches
    * the state store). At 100 TB/day ingest the same plan holds with the
    * aggregate keyed by (window, cell) under a watermark; the fixture
    * replay needs the all-time totals to stay batch-mirrorable.
    */
  def q106(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{FlatQuantizer, Similarity}
    val base = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        graft.functions.vectors.toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
    // offline train: the K lowest-id vectors ARE the codebook (q39b's
    // init-free idiom; KB-scale model state, not a data-path collect)
    val seeds = base.orderBy(col("vec_id")).limit(Similarity.IvfCells)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    if (seeds.isEmpty) return emptyMonitor(spark)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-q106-model").toString
    graft.sources.ModelStore.saveQuantizer(spark, FlatQuantizer(seeds),
      s"$tmp/coarse")
    val quant = graft.sources.ModelStore.loadQuantizer(spark, s"$tmp/coarse")
    val centroids = quant match { case FlatQuantizer(cs) => cs; case _ => seeds }
    import spark.implicits._
    val centroidDf = centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "c")
    val stream = replayTable(spark, dir, "embeddings")
      .select(graft.functions.vectors.toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
    val assigned = stream
      .select(quant.assign(col("v")).as("cell"), col("v"))
      .join(broadcast(centroidDf), Seq("cell"))
      .select(col("cell"),
        floor(round(graft.functions.expressions.vecexprs
            .cosineSim(col("v"), col("c")), Similarity.ScoreDp) *
          lit(1000000L)).cast("long").as("qc"))
    drain(assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sum(col("qc")).as("sum_cos_e6")),
      "q106_monitor_sink", "complete")
      .select(col("cell"), col("n"), col("sum_cos_e6"),
        floor(col("sum_cos_e6").cast("double") / col("n"))
          .cast("long").as("mean_cos_e6"))
      .orderBy(col("cell"))
  }

  /** q107: streaming near-dup index, served — the ONLINE member of the
    * near-dedup family (batch: MinHash-LSH q21, SimHash q22, cosine-LSH
    * q24; online exact dedup: q61). The corpus streams through a REAL
    * file-stream source; every arrival's MinHash LSH band keys are computed
    * INSIDE the micro-batch by one codegen'd expression
    * ([[graft.functions.expressions.MdBandKeysExpr]] — 3-token shingles,
    * 8 bands × 2 rows), and the state store maintains the banded dedup
    * INDEX a production ingest pipeline keeps: per band key, the arrival
    * count and the keeper (lowest doc_id). After the drain, the registered
    * output is the SERVE step: each doc's bands looked up in the index,
    * `near_dup` = some colliding band has a lower-id keeper, `min_keeper`
    * = that cluster representative. Keeper-by-lowest-id (not arrival
    * order) makes the result micro-batch-split-independent, so one batch
    * SQL mirror hashes the whole online path — the md5 hash family exists
    * exactly for that (see mdBandKeys; the production batch family is the
    * XXH64 minhashBandKeys with the identical plan shape, q21).
    *
    * Scale shape: state is the band index — O(distinct bands) ≤ 8×docs of
    * (string key, two longs), the inherent floor for ingest dedup (you
    * must remember what you've seen; q61's exact-dedup state is the same
    * O(seen) class) and ~KB per thousand docs vs the corpus' MBs: text
    * never enters the state store. The serve join is band-keyed ids-only
    * (band string + two longs), map-side combinable on both aggregates;
    * no broadcast is assumed — at 100 TB the index IS the big side and
    * the join shuffles ids, never payloads.
    */
  def q107(spark: SparkSession, dir: String): DataFrame = {
    val bandsOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => graft.functions.expressions.sketch.mdBandKeys(t, 3, 8, 2)
    val batchDocs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val stream = replayTable(spark, dir, "documents")
      .select(col("doc_id"), explode(bandsOf(col("text"))).as("band"))
    val index = drain(stream.groupBy(col("band"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper")),
      "q107_neardup_sink", "complete")
    val docBands = batchDocs
      .select(col("doc_id"), explode(bandsOf(col("text"))).as("band"))
    val hits = docBands
      .join(index.filter(col("n") > 1), Seq("band"))
      .filter(col("keeper") < col("doc_id"))
      .groupBy(col("doc_id")).agg(min(col("keeper")).as("min_keeper"))
    batchDocs.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("min_keeper").isNotNull.as("near_dup"),
        col("min_keeper"))
      .orderBy(col("doc_id"))
  }

  /** Empty, schema-correct q106 result — the monitor for a corpus no
    * codebook can be trained on.
    */
  private def emptyMonitor(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("cell", IntegerType), StructField("n", LongType),
        StructField("sum_cos_e6", LongType),
        StructField("mean_cos_e6", LongType))))
  }

  val defs: Seq[QueryDef] = Seq(
    // the whole online path is hash-mirrorable because MdBandKeysExpr is
    // cross-engine by construction: tokenization ≡ the regexp_split mirror
    // (the TokenXxh64Expr-documented identity), the 60-bit md5 draw ≡ the
    // q94 '0x'||substr(md5) idiom, and keeper-by-lowest-id is
    // arrival-order-free
    QueryDef("q107_stream_neardup_serve", q107,
      Some("""WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                t -> t <> '') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id, list_transform(range(0, len(tk) - 2), i ->
        |      array_to_string(list_slice(tk, i + 1, i + 3), ' ')) AS sh
        |  FROM tk WHERE len(tk) >= 3),
        |mh AS (
        |  SELECT doc_id, list_transform(range(0, 16), j ->
        |      list_min(list_transform(sh, s ->
        |        CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || s), 1, 15)
        |          AS BIGINT)))) AS mhs
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, CAST(b AS VARCHAR) || ':' ||
        |      CAST(mhs[2*b + 1] AS VARCHAR) || ':' ||
        |      CAST(mhs[2*b + 2] AS VARCHAR) AS band
        |  FROM mh CROSS JOIN (SELECT unnest(range(0, 8)) AS b)),
        |idx AS (SELECT band, COUNT(*) AS n, MIN(doc_id) AS keeper
        |        FROM bands GROUP BY band),
        |hits AS (
        |  SELECT bands.doc_id, MIN(idx.keeper) AS min_keeper
        |  FROM bands JOIN idx USING (band)
        |  WHERE idx.keeper < bands.doc_id
        |  GROUP BY bands.doc_id)
        |SELECT d.doc_id, (h.min_keeper IS NOT NULL) AS near_dup, h.min_keeper
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),
    // the assignment CTEs are q39b's verbatim (same seeds, same argmin +
    // lowest-cell tie-break); the affinity quantization is hash-safe
    // because round(x, 6) is already proven IEEE-identical cross-engine
    // by q39b's hashed score column, and *1e6/floor are exact IEEE ops
    QueryDef("q106_stream_cell_monitor", q106,
      Some(s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |s AS (SELECT v AS sv,
        |        CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
        |          AS cell
        |      FROM e ORDER BY vec_id LIMIT ${graft.operators.Similarity.IvfCells}),
        |nd AS (SELECT e.vec_id, s.cell, list_distance(e.v, s.sv) AS d
        |       FROM e CROSS JOIN s),
        |a AS (SELECT vec_id, cell,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY d, cell)
        |          AS rn
        |      FROM nd),
        |asg AS (SELECT vec_id, cell FROM a WHERE rn = 1),
        |q AS (SELECT asg.cell,
        |        CAST(FLOOR(round(list_cosine_similarity(e.v, s.sv),
        |          ${graft.operators.Similarity.ScoreDp}) * 1000000) AS BIGINT) AS qc
        |      FROM asg JOIN e USING (vec_id) JOIN s USING (cell))
        |SELECT cell, COUNT(*) AS n, CAST(SUM(qc) AS BIGINT) AS sum_cos_e6,
        |  CAST(FLOOR(CAST(SUM(qc) AS DOUBLE) / COUNT(*)) AS BIGINT)
        |    AS mean_cos_e6
        |FROM q GROUP BY cell ORDER BY cell""".stripMargin)),
    QueryDef("q73_stream_stream_join", q73,
      Some("""WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events)
        |SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  c.event_id AS click_id
        |FROM e p JOIN e c ON c.user_id = p.user_id
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.us >= p.us - 3600000000 AND c.us <= p.us
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin)),
    QueryDef("q72_sliding_replay", q72,
      Some(graft.operators.TimeWindows.slidingOracleSql)),
    QueryDef("q70_stream_sessions", q70,
      Some(graft.operators.TimeWindows.sessionOracleSql)),
    // same result contract as q14 — the oracle is intentionally identical
    QueryDef("q55_stream_replay", q55,
      Some(s"""SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
        |  event_type, COUNT(*) AS n,
        |  ${graft.functions.num.sqlDsum("value")} AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_ms, event_type""".stripMargin)),
    QueryDef("q61_stream_dedup", q61,
      Some("""SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin)))
}
