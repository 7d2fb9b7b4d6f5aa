package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bitsFor/hashesFor follow the classic bounds and clamp") {
    // 10k keys @ 1% fpp → ~95.8k bits → next power of two 131072, k≈9
    assert(BloomPrune.bitsFor(10000, 0.01) == 131072)
    val k = BloomPrune.hashesFor(131072, 10000)
    assert(k >= 7 && k <= 10)
    assert(BloomPrune.bitsFor(1, 0.5) == 1024)          // lower clamp
    // upper clamp keeps the plan-literal word array ≤ 16 MiB
    assert(BloomPrune.bitsFor(Long.MaxValue, 1e-9) == (1 << 27))
  }

  test("mightContain has no false negatives") {
    val keys = (0L until 2000L).map(_ * 7919L)
    val df = keys.toDF("k")
    val words = BloomPrune.buildBitset(df, col("k"), 1 << 15, 7)
    val misses = df.where(!BloomPrune.mightContain(col("k"), words, 7)).count()
    assert(misses == 0, "a bloom filter must never reject an inserted key")
  }

  test("false-positive rate is near the sized target") {
    val present = (0L until 5000L).toDF("k")
    val numBits = BloomPrune.bitsFor(5000, 0.01)
    val numHashes = BloomPrune.hashesFor(numBits, 5000)
    val words = BloomPrune.buildBitset(present, col("k"), numBits, numHashes)
    val absent = (1000000L until 1020000L).toDF("k")
    val fp = absent.where(BloomPrune.mightContain(col("k"), words, numHashes))
      .count()
    val rate = fp.toDouble / 20000
    assert(rate < 0.03, s"fp rate $rate far above the 1% sizing target")
  }

  test("pruneJoin is bit-identical to the plain join") {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val urgent = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.pruneJoin(lineitem, urgent,
      "l_orderkey", "o_orderkey", expectedBuildRows = 1000)
    val plain = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey"))
    assertSameRows(pruned, plain)
  }

  test("undersized filter stays exact (false positives absorbed)") {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val urgent = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    // expectedBuildRows=1 → m clamps to 1024 bits → filter saturates;
    // the equi-join must still produce the exact result
    val pruned = BloomPrune.pruneJoin(lineitem, urgent,
      "l_orderkey", "o_orderkey", expectedBuildRows = 1)
    val plain = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey"))
    assertSameRows(pruned, plain)
  }

  test("pruneJoinAuto sizes from the true build count; measured fpp ≤ 2× target") {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val urgent = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.pruneJoinAuto(lineitem, urgent,
      "l_orderkey", "o_orderkey", fpp = 0.01)
    val plain = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey"))
    assertSameRows(pruned, plain)
    // measured fpp on a known-miss probe set: keys guaranteed absent
    // from the build side, sized from its true cardinality
    val n = urgent.count()
    val nb = BloomPrune.bitsFor(n, 0.01)
    val nh = BloomPrune.hashesFor(nb, n)
    val words = BloomPrune.buildBitset(urgent, col("o_orderkey"), nb, nh)
    val misses = (1000000000L until 1000020000L).toDF("k")
    val fp = misses.where(BloomPrune.mightContain(col("k"), words, nh)).count()
    val rate = fp.toDouble / 20000
    assert(rate <= 0.02, s"measured fpp $rate above 2x the 1% sizing target")
  }

  test("pruneJoin resolves identically-named keys to their source frames") {
    val probe = (0L until 1000L).toDF("k")
    val build = Seq(3L, 7L, 500L, 999L).toDF("k")
    val pruned = BloomPrune.pruneJoin(probe, build, "k", "k",
      expectedBuildRows = 4)
    assert(pruned.count() == 4)
    assert(pruned.select(probe("k")).as[Long].collect().sorted
      .sameElements(Array(3L, 7L, 500L, 999L)))
  }

  test("null probe keys are pruned, matching equi-join semantics") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val probe = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L), Row(null), Row(2L), Row(99L)),
      StructType(Seq(StructField("k", LongType))))
    val build = Seq(1L, 2L).toDF("b")
    val words = BloomPrune.buildBitset(build, col("b"), 1 << 10, 5)
    val kept = probe.where(BloomPrune.mightContain(col("k"), words, 5))
      .collect().map(r => Option(r.get(0))).toSet
    assert(!kept.contains(None), "null key must not pass the bloom test")
    assert(kept.contains(Some(1L)) && kept.contains(Some(2L)))
  }

  test("bloom prune runs below the probe-side exchange") {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val urgent = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    val words = {
      val nb = BloomPrune.bitsFor(1000)
      BloomPrune.buildBitset(urgent, col("o_orderkey"), nb,
        BloomPrune.hashesFor(nb, 1000))
    }
    val nb = BloomPrune.bitsFor(1000)
    val nh = BloomPrune.hashesFor(nb, 1000)
    // force the large-large shape bloom pruning exists for
    val joined = lineitem
      .where(BloomPrune.mightContain(col("l_orderkey"), words, nh))
      .hint("merge")
      .join(urgent.hint("merge"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    // the Filter containing the bloom's xxhash64 probes must sit in the
    // scan stage (below Exchange), not above the join
    val lines = plan.linesIterator.toVector
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    val bloomIdx = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("xxhash64"))
    assert(exchangeIdx >= 0 && bloomIdx >= 0, plan)
    assert(bloomIdx > exchangeIdx,
      s"bloom filter should be below (printed after) the first Exchange:\n$plan")
  }
}
