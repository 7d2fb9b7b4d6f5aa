package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sqlgen.SqlGen

/** Seeded random-pipeline fuzz for the plan→SQL generator: compose
  * filters, joins, projections, aggregates, distinct and sort+limit in
  * random order and demand every pipeline round-trips. Hand-picked
  * roundtrip specs pin the shapes we know about; the fuzzer hunts the
  * compositions we didn't think of (it is how the
  * projection-over-nested-join and GROUP-BY-position interactions get
  * continuous coverage). Deterministic: fixed seed, fixed case count.
  */
class SqlGenFuzzSpec extends SparkSpec {

  test("20 seeded random graphs: duplicateClusters ≡ its WITH RECURSIVE twin") {
    // property fuzz for the round-9 iterative-plan provenance: random
    // undirected graphs (cycles, chains, self-contained cliques,
    // singletons-by-omission) must produce identical (id, cluster)
    // labelings from the operator's min-label loop and the emitted
    // level-bounded recursive CTE — the equality the d06/d08
    // roundtrips rest on, hunted beyond the hand-picked shapes
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (case_ <- 1 to 20) {
      val n = 4 + rnd.nextInt(12)           // node universe 4..15
      val m = 1 + rnd.nextInt(2 * n)        // edge count 1..2n
      val pairs = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b) + (if (a == b) 1 else 0))
      }.distinct.toDF("id_a", "id_b")
      pairs.createOrReplaceTempView("_fz_pairs")
      val op = graft.operators.Dedup.duplicateClusters(pairs)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val viaSql = spark.sql(graft.operators.Dedup.duplicateClustersSql(
          "SELECT id_a, id_b FROM _fz_pairs"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(op == viaSql,
        s"case $case_ (n=$n m=$m): operator $op != recursive SQL $viaSql")
    }
  }

  test("60 seeded random plan pipelines roundtrip through SqlGen") {
    Tables.register(spark, sfDir)
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(20260812L)
    val nation = Tables.load(spark, sfDir, "nation")
    val region = Tables.load(spark, sfDir, "region")

    def rndPred(): Column = {
      val base = rnd.nextInt(4) match {
        case 0 => col("n_nationkey") < lit(rnd.nextInt(30))
        case 1 => col("n_regionkey") === lit(rnd.nextInt(5))
        case 2 => col("n_name").startsWith(lit(('A' + rnd.nextInt(5)).toChar.toString))
        case 3 => col("n_nationkey") % lit(rnd.nextInt(5) + 2) === lit(0)
      }
      rnd.nextInt(3) match {
        case 0 => base
        case 1 => base && (col("n_regionkey") =!= lit(rnd.nextInt(5)))
        case 2 => base || (col("n_nationkey") > lit(rnd.nextInt(20)))
      }
    }

    def rndPipeline(): DataFrame = {
      var df = nation
      if (rnd.nextBoolean()) df = df.where(rndPred())
      if (rnd.nextBoolean()) df = df.union(nation.where(rndPred()))
      if (rnd.nextBoolean())
        df = df.join(region, df("n_regionkey") === region("r_regionkey"))
      df = rnd.nextInt(5) match {
        case 0 => df.select(col("n_nationkey"), col("n_name"),
          (col("n_regionkey") * 2 + 1).as("rk2"))
        case 1 => df.groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n"), max(col("n_name")).as("mx"))
        case 2 => df.select(col("n_nationkey"),
          when(col("n_regionkey") > 2, lit("hi")).otherwise(lit("lo")).as("b"))
        case 3 => df.select(col("n_nationkey"), col("n_regionkey"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("n_regionkey"))
            .orderBy(col("n_nationkey"))).as("rn"))
        // lambda HOF chain — covers the arrow-syntax printer under
        // random upstream compositions (q47 pins the fixed shape)
        case 4 => df.select(col("n_nationkey"),
          aggregate(
            filter(sequence(lit(1L), col("n_nationkey") % 5 + 1),
              x => x % 2 === 0),
            lit(0L), (a, x) => a + x).as("hof"))
      }
      if (rnd.nextBoolean()) df = df.distinct()
      if (rnd.nextBoolean()) {
        // total order over ALL columns keeps LIMIT deterministic as a
        // multiset even with duplicate keys
        df = df.orderBy(df.columns.map(col).toIndexedSeq: _*)
          .limit(rnd.nextInt(20) + 1)
      }
      df
    }

    for (i <- 1 to 60) {
      val df = rndPipeline()
      val sql =
        try SqlGen.toSql(df)
        catch {
          case e: Throwable =>
            fail(s"case $i: toSql failed for plan:\n" +
              s"${df.queryExecution.analyzed}\n$e")
        }
      try assertSameRows(df, spark.sql(sql))
      catch {
        case e: org.scalatest.exceptions.TestFailedException =>
          fail(s"case $i roundtrip mismatch; sql=$sql\n${e.getMessage}")
        case e: Throwable =>
          fail(s"case $i re-parse failed; sql=$sql\n${e.getMessage}")
      }
    }
  }

  test("20 seeded generator (explode/posexplode) pipelines roundtrip through SqlGen") {
    // t17's posexplode landed Generate in a driver query; this walks
    // the neighborhood: explode vs posexplode vs explode_outer over
    // string-split / sequence / literal arrays, with random filters,
    // aggregation, distinct and sort+limit downstream
    Tables.register(spark, sfDir)
    val rnd = new scala.util.Random(20260813L)
    val nation = Tables.load(spark, sfDir, "nation")

    def rndGen(): DataFrame = {
      val arr = rnd.nextInt(3) match {
        case 0 => split(col("n_name"), "A")
        case 1 => sequence(lit(1L), col("n_nationkey") % 4 + 1)
        case 2 => array(col("n_nationkey"), col("n_regionkey"), lit(7L))
      }
      var df = rnd.nextInt(3) match {
        case 0 => nation.select(col("n_nationkey"), explode(arr).as("e"))
        case 1 => nation.select(col("n_nationkey"),
          posexplode(arr).as(Seq("p", "e")))
        case 2 => nation.select(col("n_nationkey"), explode_outer(arr).as("e"))
      }
      if (rnd.nextBoolean())
        df = df.where(col("n_nationkey") % lit(rnd.nextInt(3) + 2) === 0)
      df = rnd.nextInt(3) match {
        case 0 => df
        case 1 => df.groupBy(col("n_nationkey")).agg(count(lit(1)).as("n"))
        case 2 => df.distinct()
      }
      if (rnd.nextBoolean())
        df = df.orderBy(df.columns.map(col).toIndexedSeq: _*)
          .limit(rnd.nextInt(15) + 1)
      df
    }

    for (i <- 1 to 20) {
      val df = rndGen()
      val sql =
        try SqlGen.toSql(df)
        catch {
          case e: Throwable =>
            fail(s"case $i: toSql failed for plan:\n" +
              s"${df.queryExecution.analyzed}\n$e")
        }
      try assertSameRows(df, spark.sql(sql))
      catch {
        case e: org.scalatest.exceptions.TestFailedException =>
          fail(s"case $i roundtrip mismatch; sql=$sql\n${e.getMessage}")
        case e: Throwable =>
          fail(s"case $i re-parse failed; sql=$sql\n${e.getMessage}")
      }
    }
  }

  test("40 seeded subquery and grouping-set pipelines roundtrip through SqlGen") {
    // round-4 added subquery-expression printing and grouping-set
    // reconstruction; this extends the fuzz space to those surfaces —
    // correlated scalar/EXISTS/IN subqueries (region inner, nation
    // outer: same-table correlation is a documented SqlGen error) and
    // ROLLUP/CUBE with grouping()/grouping_id(), composed with random
    // filters, distinct and sort+limit.
    Tables.register(spark, sfDir)
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(20260813L)
    val nation = Tables.load(spark, sfDir, "nation")

    def letter(): String = ('A' + rnd.nextInt(26)).toChar.toString

    def rndBase(): DataFrame = rnd.nextInt(6) match {
      case 0 => spark.sql(
        "SELECT n_name, (SELECT count(*) FROM region " +
          s"WHERE r_regionkey = n_regionkey AND r_name LIKE '${letter()}%')" +
          " AS c FROM nation")
      case 1 => spark.sql(
        "SELECT n_name, n_regionkey FROM nation WHERE n_regionkey IN " +
          s"(SELECT r_regionkey FROM region WHERE r_name LIKE '${letter()}%')")
      case 2 => spark.sql(
        "SELECT n_name FROM nation WHERE EXISTS (SELECT 1 FROM region " +
          s"WHERE r_regionkey = n_regionkey AND r_name LIKE '${letter()}%')")
      case 3 => spark.sql(
        "SELECT n_name, n_nationkey FROM nation WHERE NOT EXISTS " +
          "(SELECT 1 FROM region WHERE r_regionkey = n_regionkey AND " +
          s"r_regionkey > ${rnd.nextInt(4)})")
      case 4 => spark.sql(
        s"SELECT n_nationkey FROM nation WHERE n_nationkey < " +
          s"(SELECT max(r_regionkey) FROM region) * ${rnd.nextInt(5) + 1}")
      case 5 =>
        val g =
          if (rnd.nextBoolean()) nation.rollup(col("n_regionkey"))
          else nation.cube(col("n_regionkey"))
        g.agg(count(lit(1)).as("n"),
          (if (rnd.nextBoolean()) grouping(col("n_regionkey"))
           else grouping_id(col("n_regionkey"))).as("g"))
    }

    for (i <- 1 to 40) {
      var df = rndBase()
      if (rnd.nextBoolean()) df = df.distinct()
      if (rnd.nextBoolean())
        df = df.orderBy(df.columns.map(col).toIndexedSeq: _*)
          .limit(rnd.nextInt(20) + 1)
      val sql =
        try SqlGen.toSql(df)
        catch {
          case e: Throwable =>
            fail(s"case $i: toSql failed for plan:\n" +
              s"${df.queryExecution.analyzed}\n$e")
        }
      try assertSameRows(df, spark.sql(sql))
      catch {
        case e: org.scalatest.exceptions.TestFailedException =>
          fail(s"case $i roundtrip mismatch; sql=$sql\n${e.getMessage}")
        case e: Throwable =>
          fail(s"case $i re-parse failed; sql=$sql\n${e.getMessage}")
      }
    }
  }

  test("30 seeded LATERAL and interval-frame pipelines roundtrip through SqlGen") {
    // round-5 added LateralJoin printing (comma + JOIN LATERAL forms)
    // and interval RANGE frames, pinned by goldens and the fixed q48/
    // q49 roundtrips; this composes them RANDOMLY — lateral body
    // aggregate/predicate, join form, interval unit/width, frame
    // bounds, downstream distinct/sort/limit — so the printer paths
    // get the same continuous composition coverage as the rest.
    Tables.register(spark, sfDir)
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(20260815L)

    def rndLateral(): DataFrame = {
      val agg = Seq("max", "min", "count", "sum")(rnd.nextInt(4))
      val pred = rnd.nextInt(3) match {
        case 0 => ""
        case 1 => s" AND r_regionkey > ${rnd.nextInt(3)}"
        case 2 => s" AND r_name LIKE '${('A' + rnd.nextInt(6)).toChar}%'"
      }
      val body = s"(SELECT $agg(r_regionkey) AS x FROM region " +
        s"WHERE r_regionkey = n_regionkey$pred) t"
      rnd.nextInt(3) match {
        case 0 => spark.sql( // comma (inner) form
          s"SELECT n_name, n_regionkey, t.x FROM nation, LATERAL $body")
        case 1 => spark.sql( // outer form, ON TRUE
          s"SELECT n_name, t.x FROM nation LEFT JOIN LATERAL $body ON TRUE")
        case 2 => spark.sql( // join form with a real ON condition
          s"SELECT n_name, t.x FROM nation JOIN LATERAL $body " +
            "ON t.x IS NOT NULL")
      }
    }

    def rndIntervalWindow(): DataFrame = {
      val unit = Seq("MINUTE", "HOUR", "DAY")(rnd.nextInt(3))
      val n = rnd.nextInt(5) + 1
      val agg = Seq("count(*)", "sum(event_id)", "min(event_id)")(rnd.nextInt(3))
      val frame = rnd.nextInt(3) match {
        case 0 => s"RANGE BETWEEN INTERVAL $n $unit PRECEDING AND CURRENT ROW"
        case 1 => s"RANGE BETWEEN CURRENT ROW AND INTERVAL $n $unit FOLLOWING"
        case 2 => s"RANGE BETWEEN INTERVAL $n $unit PRECEDING " +
          s"AND INTERVAL ${n + rnd.nextInt(3)} $unit FOLLOWING"
      }
      spark.sql("SELECT event_id, user_id, " +
        s"$agg OVER (PARTITION BY user_id ORDER BY ts $frame) AS w " +
        "FROM events WHERE event_id < 2000")
    }

    for (i <- 1 to 30) {
      var df = if (rnd.nextBoolean()) rndLateral() else rndIntervalWindow()
      if (rnd.nextBoolean()) df = df.distinct()
      if (rnd.nextBoolean())
        df = df.orderBy(df.columns.map(col).toIndexedSeq: _*)
          .limit(rnd.nextInt(20) + 1)
      val sql =
        try SqlGen.toSql(df)
        catch {
          case e: Throwable =>
            fail(s"case $i: toSql failed for plan:\n" +
              s"${df.queryExecution.analyzed}\n$e")
        }
      try assertSameRows(df, spark.sql(sql))
      catch {
        case e: org.scalatest.exceptions.TestFailedException =>
          fail(s"case $i roundtrip mismatch; sql=$sql\n${e.getMessage}")
        case e: Throwable =>
          fail(s"case $i re-parse failed; sql=$sql\n${e.getMessage}")
      }
    }
  }

  test("20 seeded array-agg (collect/sort/slice/topk) pipelines roundtrip") {
    // e06 landed collect_list + sort_array + slice + array_join and
    // s09 landed topk_rows + posexplode; the goldens pin those two
    // exact texts — this walks the neighborhood: random array
    // aggregate, random post-processing chain, random group key and
    // downstream distinct/sort+limit
    Tables.register(spark, sfDir)
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(20260814L)
    val nation = Tables.load(spark, sfDir, "nation")

    def rndArrayAgg(): DataFrame = {
      val key = if (rnd.nextBoolean()) col("n_regionkey") else
        (col("n_nationkey") % 3).as("k3")
      var df = rnd.nextInt(3) match {
        case 0 => nation.groupBy(key)
          .agg(collect_list(col("n_name")).as("xs"))
          .select(col("xs"), lit(1).as("tag"))
        case 1 => nation.groupBy(key)
          .agg(sort_array(collect_list(col("n_nationkey"))).as("xs"))
          .select(col("xs"), lit(2).as("tag"))
        case 2 => nation.groupBy(key)
          .agg(graft.functions.TopK.topk(
            col("n_nationkey").cast("double"), col("n_nationkey"),
            rnd.nextInt(3) + 1).as("t"))
          .select(posexplode(col("t")).as(Seq("p", "w")))
          .select(col("p"), col("w.id").as("id"))
      }
      if (df.columns.contains("xs")) {
        df = rnd.nextInt(3) match {
          case 0 => df.select(
            array_join(slice(sort_array(col("xs")), 1,
              rnd.nextInt(4) + 1), ">").as("s"), col("tag"))
          case 1 => df.select(size(col("xs")).as("n"), col("tag"))
          case 2 => df.select(explode_outer(col("xs")).as("e"), col("tag"))
        }
      }
      if (rnd.nextBoolean()) df = df.distinct()
      if (rnd.nextBoolean())
        df = df.orderBy(df.columns.map(col).toIndexedSeq: _*)
          .limit(rnd.nextInt(10) + 1)
      df
    }

    for (i <- 1 to 20) {
      val df = rndArrayAgg()
      val sql =
        try SqlGen.toSql(df)
        catch {
          case e: Throwable =>
            fail(s"case $i: toSql failed for plan:\n" +
              s"${df.queryExecution.analyzed}\n$e")
        }
      try assertSameRows(df, spark.sql(sql))
      catch {
        case e: org.scalatest.exceptions.TestFailedException =>
          fail(s"case $i roundtrip mismatch; sql=$sql\n${e.getMessage}")
        case e: Throwable =>
          fail(s"case $i re-parse failed; sql=$sql\n${e.getMessage}")
      }
    }
  }

  test("20 seeded events-analytics parameter pipelines roundtrip through SqlGen") {
    // the session-4 report operators under random parameters and
    // upstream filters — windowDays/halvingDays sweep the
    // explode-sequence and power-of-two-decay shapes the hand-picked
    // e07/e08 roundtrips pin at one setting each
    Tables.register(spark, sfDir)
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(20260814L)
    val ev = Tables.events(spark, sfDir)
    import graft.operators.EventsAnalytics
    for (i <- 0 until 20) {
      val base = rnd.nextInt(3) match {
        case 0 => ev
        case 1 => ev.where(col("event_type") ===
          Seq("view", "click", "purchase")(rnd.nextInt(3)))
        case 2 => ev.where(col("user_id") % lit(rnd.nextInt(5) + 2) === 0)
      }
      val df = rnd.nextInt(3) match {
        case 0 => EventsAnalytics.rollingActive(base, "user_id", "ts",
          windowDays = rnd.nextInt(9) + 1)
        case 1 => EventsAnalytics.decayedEngagement(base, "user_id", "ts",
          "value", halvingDays = rnd.nextInt(4) + 1)
        case 2 => EventsAnalytics.resampleDaily(base, "user_id", "ts",
          "value").where(col("total_value") > lit(rnd.nextInt(50)))
      }
      val sql = SqlGen.toSql(df)
      try assertSameRows(df, spark.sql(sql))
      catch {
        case e: org.scalatest.exceptions.TestFailedException =>
          fail(s"case $i roundtrip mismatch; sql=$sql\n${e.getMessage}")
        case e: Throwable =>
          fail(s"case $i re-parse failed; sql=$sql\n${e.getMessage}")
      }
    }
  }
}
