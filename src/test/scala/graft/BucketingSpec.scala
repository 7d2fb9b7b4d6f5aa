package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: the 100 TB answer to repeated
  * fact⋈fact joins on the same key. Writing both sides bucketed by the
  * join key lets Spark plan a SortMergeJoin with NO shuffle exchange —
  * the bucketing IS the shuffle, paid once at write time.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without shuffle exchanges") {
    // (warehouse dir is a temp dir, set at session build in SparkSpec)
    // disable broadcast so the join shape is the large-large case
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sfDir, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      Tables.load(spark, sfDir, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      // AQE's toString prints both final and initial plans; audit the
      // final one only
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      // the join itself must not shuffle; only the small post-join
      // aggregation exchanges
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(exchanges <= 1, s"join should be exchange-free, got $exchanges:\n$plan")

      // same result as the unbucketed join
      val plain = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assertSameRows(joined, plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
