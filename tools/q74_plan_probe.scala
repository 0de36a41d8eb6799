// Plan probe for q74: after execution (AQE final plan), the totals branch
// must reuse the multiplicity branch's gh exchange (ReusedExchange) instead
// of planning a second scan+tokenize+explode+shuffle.
// Usage: spark-shell --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.adaptive.enabled=true -I tools/q74_plan_probe.scala
val df = graft.operators.Dedup.q74(spark, "/root/testdata/sf0.01")
df.collect()
println(df.queryExecution.explainString(
  org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
