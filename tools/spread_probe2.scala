// A/B probe round 2: documentPostings (q01/q02) and q34 fingerprint spread.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
val sfDir = "/root/testdata/sf0.1"
spark.read.parquet(s"$sfDir/documents.parquet").count()

def docs = graft.Tables.documents(spark, sfDir)
def spreadDocs = docs.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))

def postings(d: DataFrame) = d
  .select(col("doc_id"), posexplode(graft.functions.text.tokens(col("text"))).as(Seq("pos0", "token")))
  .filter(col("token") =!= "")
  .select(col("token"), col("doc_id"), (col("pos0") + 1).cast("int").as("pos"))

def q01body(d: DataFrame) = postings(d)
  .groupBy(col("token"))
  .agg(sort_array(collect_list(struct(col("doc_id"), col("pos")))).as("ps"))
  .select(col("token"), size(col("ps")).cast("long").as("n_postings"),
    concat_ws(", ", transform(col("ps"), p =>
      format_string("(%d: %d)", p.getField("doc_id"), p.getField("pos")))).as("postings"))
  .orderBy(col("token"))

def q02body(d: DataFrame) = postings(d)
  .groupBy(col("token").as("word")).agg(count(lit(1)).as("n")).orderBy(col("word"))

def q34body(d: DataFrame) = d
  .select(col("doc_id"),
    graft.functions.expressions.sketch.winnowFingerprints(col("text"), 8, 4).as("fps"))
  .select(col("doc_id"), size(col("fps")).as("n_fps"), element_at(col("fps"), 1).as("min_fp"))
  .orderBy(col("doc_id"))

val cases: Seq[(String, () => DataFrame)] = Seq(
  ("q01_spread", () => q01body(spreadDocs)),
  ("q01_plain", () => q01body(docs)),
  ("q02_spread", () => q02body(spreadDocs)),
  ("q02_plain", () => q02body(docs)),
  ("q34_spread", () => q34body(spreadDocs)),
  ("q34_plain", () => q34body(docs)))
for ((n, f) <- cases) {
  val times = (1 to 6).map { _ =>
    val t0 = System.nanoTime()
    f().write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"PROBE $n%-12s min=${times.drop(2).min}%.3f  " + times.map(t => f"$t%.2f").mkString(" "))
}
println("PROBE_DONE")
System.exit(0)
