// A/B probe: do the single-split payload repartitions pay for themselves?
// Usage: spark-shell --driver-class-path target/scala-2.13/classes ... -I tools/spread_probe.scala
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
val sfDir = "/root/testdata/sf0.1"
Seq("documents", "embeddings").foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())

def docs = graft.Tables.documents(spark, sfDir)
def spreadDocs = docs.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))

def q28body(d: DataFrame) = d
  .select(col("doc_id").as("media_id"), col("text").cast("binary").as("media"))
  .select(col("media_id"), length(col("media")).as("n_bytes"), md5(col("media")).as("media_md5"),
    lower(hex(substring(col("media"), 1, 8))).as("head_hex"))
  .orderBy(col("media_id"))

def q26body(d: DataFrame) = {
  val sigs = graft.functions.text.qualitySignals(col("text"))
  d.select(col("doc_id") +: sigs.map { case (n, c) => c.as(n) }: _*).orderBy(col("doc_id"))
}

def q19body(d: DataFrame) = d
  .select(explode(graft.functions.text.cleanTokens(col("text"))).as("token"))
  .groupBy(col("token")).agg(count(lit(1)).as("n"))
  .orderBy(col("n").desc, col("token")).limit(100)

def emb = graft.Tables.embeddings(spark, sfDir)
def spreadEmb = emb.repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
def q24body(e: DataFrame) = {
  import graft.operators.Similarity.{Planes, NTables, NearDupCosine}
  import graft.functions.expressions.vecexprs
  val base = e.select(col("vec_id"), graft.functions.vectors.toDouble(col("embedding")).as("v"))
  val bucketed = base.select(col("vec_id"),
    explode(vecexprs.hyperplaneBuckets(col("v"), Planes, NTables)).as("bucket"))
  val pairs = bucketed.select(col("bucket"), col("vec_id").as("a_id"))
    .join(bucketed.select(col("bucket"), col("vec_id").as("b_id")), Seq("bucket"))
    .filter(col("a_id") < col("b_id")).select(col("a_id"), col("b_id")).distinct()
  pairs
    .join(base.select(col("vec_id").as("a_id"), col("v").as("av")), Seq("a_id"))
    .join(base.select(col("vec_id").as("b_id"), col("v").as("bv")), Seq("b_id"))
    .select(col("a_id"), col("b_id"),
      round(vecexprs.cosineSim(col("av"), col("bv")), 6).as("cosine"))
    .filter(col("cosine") >= NearDupCosine)
    .orderBy(col("a_id"), col("b_id"))
}

val cases: Seq[(String, () => DataFrame)] = Seq(
  ("q28_spread", () => q28body(spreadDocs)),
  ("q28_plain", () => q28body(docs)),
  ("q26_spread", () => q26body(spreadDocs)),
  ("q26_plain", () => q26body(docs)),
  ("q19_spread", () => q19body(spreadDocs)),
  ("q19_plain", () => q19body(docs)),
  ("q24_spread", () => q24body(spreadEmb)),
  ("q24_plain", () => q24body(emb)))
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
