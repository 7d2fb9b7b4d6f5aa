package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with one join key holding most of the
  * rows, adaptive execution must split the skewed partition instead
  * of letting one task straggle — the property that keeps a 100 TB
  * fact⋈fact join from serializing on its hottest key.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // thresholds scaled down so test-sized data triggers the path
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      import spark.implicits._
      // 95% of left rows share key 0 → one hot shuffle partition
      val left = spark.range(0, 200000)
        .select((when($"id" % 20 =!= 0, 0L).otherwise($"id")).as("k"),
                concat(lit("payload-"), $"id").as("pl"))
      val right = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, "k")
      // act on THIS DataFrame: write() builds a separate
      // QueryExecution, leaving joined's plan unfinalized
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"), s"skew handling did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
