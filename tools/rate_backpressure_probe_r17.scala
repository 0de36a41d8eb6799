// Round-17 #2: sustained backpressure under an unbounded rate source.
// The round-16 trigger-sizing probe measured the ~0.5 s/batch commit floor
// on a FINITE file replay; this probe drives the q107 band-index core from
// a true `rate` source (Kafka-shaped: rowsPerSecond wall-clock arrival)
// at a rate far above what one commit interval absorbs, so every
// micro-batch is sized by the BACKLOG accumulated during the previous
// commit — the regime the sizing rule in SCALE.md is for. Evidence
// recorded: sustained throughput (ticks/s over the whole drain), max and
// mean micro-batch size (adaptive batching absorbing the backlog), state
// rows vs distinct bands (state stays O(distinct bands) under 10x
// duplicate arrivals), and the band-index checksum vs the batch mirror.
// Run:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/rate_backpressure_probe_r17.scala < /dev/null
import org.apache.spark.sql.functions._

val sp = graft.Sessions.local("rate-backpressure-probe")

val dir = "/root/testdata/sf0.1"
val docs = graft.streaming.RateIngest.docsBySeq(sp, dir).cache()
val n = docs.count()
val mirror = graft.streaming.RateIngest.bandIndex(docs).cache()
val distinctBands = mirror.count()
println(s"PROBE docs=$n distinct_bands=$distinctBands")

val Repeats = 10      // 10x duplicate arrivals: state must not grow with them
val Rate = 5000       // ticks/s; >> what a ~0.5 s commit interval admits at
                      // one tick per row, so the backlog regime is forced
val target = Repeats * n

val (idx, stats) = graft.streaming.RateIngest.drainUntil(sp,
  graft.streaming.RateIngest.bandIndex(
    graft.streaming.RateIngest.deliver(
      graft.streaming.RateIngest.rateTicks(sp, Rate), docs, Repeats)),
  "rate_bp_idx", "complete", targetInput = target, timeoutMs = 300000L)

val sustained = stats.inputRows / stats.wallSec
val meanBatch = stats.inputRows.toDouble / stats.batches
println(f"PROBE ticks=${stats.inputRows} batches=${stats.batches} " +
  f"wall=${stats.wallSec}%.2fs sustained=${sustained}%.0f ticks/s " +
  f"max_batch=${stats.maxBatchRows} mean_batch=${meanBatch}%.0f " +
  f"state_rows=${stats.maxStateRows}")

// state O(distinct bands) under 10x arrivals
assert(stats.maxStateRows == distinctBands,
  s"state ${stats.maxStateRows} != distinct bands $distinctBands")
// the backlog regime actually happened: some batch absorbed far more than
// one second of arrivals could explain under a fixed-size trigger
assert(stats.maxBatchRows > Rate / 2,
  s"max batch ${stats.maxBatchRows} too small — arrival never outpaced the commit floor")
// result equality vs the batch mirror (counts scale by Repeats exactly)
def canon(df: org.apache.spark.sql.DataFrame) =
  df.collect().map(_.toSeq.toVector).toVector.sortBy(_.mkString("|"))
assert(canon(idx.select(col("band"),
    (col("n") / Repeats).cast("long").as("n"), col("keeper")))
  == canon(mirror), "rate-driven index != batch mirror")
println("PROBE PASS: backpressure regime measured, state bounded, checksum equal")
System.exit(0)
