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

  test("bucket-cap guard reuses the banding exchange, adds none of its own") {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
                    "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.catalog.clearCache()
      val docs = Tables.load(spark, sfDir, "documents")
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text",
        maxBucketSize = 8)
      cand.collect()
      val plan = cand.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the banded side must be exchanged once and reused for the
      // other self-join side, and the guard's count aggregate must be
      // reused for the second semi filter — at 100 TB the cap must
      // not pay a second banding shuffle
      val reused = "ReusedExchange|ReusedQueryStage".r
        .findAllIn(plan).size
      assert(reused >= 2,
        s"expected banded + count exchanges reused, found $reused:\n$plan")
      // both semi filters align on the banding key — no repartition of
      // the banded side for the guard: exactly two REAL banding-key
      // exchanges (banded rows + bucket counts), the rest reuses
      // (a ReusedExchange line repeats the original's description, so
      // count per line, excluding reuse markers)
      val realBandExchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(band") &&
          !l.contains("ReusedExchange"))
      assert(realBandExchanges <= 2,
        s"guard introduced extra banding exchanges ($realBandExchanges):\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
