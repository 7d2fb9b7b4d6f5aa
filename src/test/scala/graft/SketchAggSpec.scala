package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Approximate/sketch aggregates and skew tools: value is bounded
  * error at a fraction of the shuffle cost, so the assertions are
  * accuracy bounds against exact twins.
  */
class SketchAggSpec extends SparkSpec {

  private lazy val li = Tables.load(spark, sfDir, "lineitem")

  test("approx_count_distinct (HLL) within 5% of exact") {
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("approx percentile brackets the exact median") {
    val approx = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("salted aggregation equals direct aggregation") {
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"),
           count(col("l_orderkey")).as("n"))
      .orderBy("l_returnflag")
    val salted = Skew.saltedAggregate(
        li.withColumn("l_qty_dec", col("l_quantity").cast("decimal(18,2)")),
        keys = Seq("l_returnflag"),
        aggs = Map("qty" -> ("l_qty_dec", "sum"), "n" -> ("l_orderkey", "count")),
        saltBuckets = 16)
      .select(col("l_returnflag"), col("qty"), col("n"))
      .orderBy("l_returnflag")
    assertSameRows(direct, salted)
    // deterministic-salt path: xxhash64 of a per-row key
    val saltedDet = Skew.saltedAggregate(
        li.withColumn("l_qty_dec", col("l_quantity").cast("decimal(18,2)")),
        keys = Seq("l_returnflag"),
        aggs = Map("qty" -> ("l_qty_dec", "sum"), "n" -> ("l_orderkey", "count")),
        saltBuckets = 16, saltBy = Seq("l_orderkey", "l_linenumber"))
      .select(col("l_returnflag"), col("qty"), col("n"))
      .orderBy("l_returnflag")
    assertSameRows(direct, saltedDet)
  }

  test("moment-derived stddev/corr agree with Spark's native aggregates") {
    // q41 derives stats from exact decimal power sums (partition-order
    // independent); Spark's native stddev_samp/corr stream doubles.
    // Both estimate the same statistic — agreement within the query's
    // OUTPUT ROUNDING granularity (4 decimals for means/stds, 6 for
    // corr; added so big-decimal→double cast wobble can't flip an
    // oracle bit cross-engine) validates the derivation without
    // inheriting the native aggregates' partition-order sensitivity.
    val derived = graft.queries.Relational.all
      .find(_.name == "q41_stats_moments").get.build(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(4), r.getDouble(5))).toMap
    val native = li.groupBy("l_returnflag").agg(
        stddev_samp(col("l_quantity")).as("sq"),
        stddev_samp(col("l_extendedprice")).as("sp"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(derived.keySet == native.keySet)
    for ((flag, (sq, sp, c)) <- derived) {
      val (nsq, nsp, nc) = native(flag)
      assert(math.abs(sq - nsq) < 1e-4, s"$flag std_qty $sq vs $nsq")
      assert(math.abs(sp - nsp) < 1e-4, s"$flag std_price $sp vs $nsp")
      assert(math.abs(c - nc) < 1e-6, s"$flag corr $c vs $nc")
    }
  }

  test("salted aggregation plan has two exchanges, keyed then salted") {
    val out = Skew.saltedAggregate(li,
      keys = Seq("l_returnflag"),
      aggs = Map("n" -> ("l_orderkey", "count")), saltBuckets = 16,
      saltBy = Seq("l_orderkey", "l_linenumber"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt missing from plan:\n$plan")
    assert(plan.contains("xxhash64"),
      s"deterministic salt (xxhash64) missing from plan:\n$plan")
  }

  test("salted aggregation salt is a pure function of row content") {
    // retry-safety: with saltBy, re-evaluating the salted projection
    // (as a recomputed map task would) yields the identical bucket for
    // every row — no dependence on partition layout or row order.
    // deterministic row subset: an unordered limit can pick different
    // rows on each execution and fail this test for unrelated reasons
    val a = li.orderBy("l_orderkey", "l_linenumber").limit(200)
    val salt = pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(16L))
    val once  = a.select(col("l_orderkey"), col("l_linenumber"), salt.as("s"))
    val twice = a.repartition(7).select(
      col("l_orderkey"), col("l_linenumber"), salt.as("s"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
