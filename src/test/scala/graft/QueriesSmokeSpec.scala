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

  test("t28: weights are floor-scaled sqrt shares; allocation is flatter than uniform-budget") {
    val rows = SparkEntry.queries("t28_mix_temperature")(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    rows.foreach { r =>
      val expect = math.floor(math.sqrt(
        r.getAs[Long]("n_tokens").toDouble / total.toDouble) * 1e9).toLong
      assert(r.getAs[Long]("w_temp") == expect, s"weight drift on $r")
      assert(r.getAs[Double]("rate") <= 1.0)
    }
    val sorted = rows.sortBy(_.getAs[Long]("n_tokens"))
    val (small, big) = (sorted.head, sorted.last)
    if (rows.length >= 2 && small.getAs[Double]("rate") < 1.0 &&
        big.getAs[Double]("rate") < 1.0) {
      // T = 2 contract: the rate ratio between the smallest and
      // largest source is ≈ sqrt of the uniform-budget (∝ 1/tokens)
      // ratio — temperature flattens, it doesn't erase, the skew
      val ratio = small.getAs[Double]("rate") / big.getAs[Double]("rate")
      val uniform = big.getAs[Long]("n_tokens").toDouble /
        small.getAs[Long]("n_tokens").toDouble
      assert(ratio <= uniform && ratio >= math.sqrt(uniform) * 0.9,
        s"expected ≈sqrt($uniform), got $ratio")
    }
  }

  test("c04: ≤100 per domain, contiguous ranks, quality non-increasing, no doc twice") {
    val rows = SparkEntry.queries("c04_domain_cap")(spark, sfDir).collect()
    rows.groupBy(_.getAs[String]("domain")).foreach { case (dom, rs) =>
      assert(rs.length <= 100, s"$dom over cap")
      val byRank = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).toSeq == (1 to rs.length),
        s"$dom ranks not contiguous")
      val quals = byRank.map(_.getAs[Double]("qual")).toSeq
      assert(quals.zip(quals.tail).forall { case (a, b) => a >= b },
        s"$dom quality not non-increasing: $quals")
    }
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
  }
}
