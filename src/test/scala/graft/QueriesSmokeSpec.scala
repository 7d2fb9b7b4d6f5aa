package graft

/** Executes every SparkEntry query at sf0.001: catches a broken entry
  * at `sbt test` time instead of the driver's verify run. Row counts
  * are asserted only where emptiness would indicate breakage (the
  * tiny SF legitimately yields zero near-dup pairs for some LSH
  * settings).
  */
class QueriesSmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set(
    "d02_dedup_minhash", "d03_dedup_simhash", "d04_dedup_jaccard",
    "d05_dedup_embedding", "q02_filter", "q24_having")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key matches a query key") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
