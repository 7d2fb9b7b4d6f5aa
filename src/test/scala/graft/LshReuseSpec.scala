package graft

import graft.operators.Dedup

/** The LSH banding self-join's two sides are the same signature
  * pipeline. In the at-scale (sort-merge) shape, Spark must REUSE the
  * shuffle stage so the expensive sketch computation runs once — this
  * pins that property. (With broadcast enabled at test scale the
  * question doesn't arise: one side is the broadcast build.)
  */
class LshReuseSpec extends SparkSpec {

  test("minhash banding self-join reuses the signature shuffle") {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
                    "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // other specs cache the documents table; a cached relation
      // changes the exchange shape this test pins
      spark.catalog.clearCache()
      val docs = Tables.load(spark, sfDir, "documents")
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      cand.collect()
      val plan = cand.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("ReusedQueryStage") || plan.contains("ReusedExchange"),
        s"signature pipeline computed twice:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
