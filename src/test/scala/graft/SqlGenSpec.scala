package graft

import graft.queries.Relational
import graft.sqlgen.SqlGen

/** Roundtrip gate for the plan→SQL generator, mirroring the
  * reference's test strategy (reference:
  * datafusion-sqlgen/tests/select.rs:57-68 `test_sql_roundtrip`):
  * build a plan, generate SQL, re-run the SQL, demand identical
  * results. The reference asserts on SQL *text*; we assert on
  * *results*, which is the stronger property Spark lets us check
  * cheaply.
  */
class SqlGenSpec extends SparkSpec {

  // The whole relational suite round-trips: CTEs print as WITH
  // (WithCTE/CTERelationRef), pivot's lowered count-if aggregates
  // print directly, and topk_rows resolves via the registered SQL
  // function (GraftExtensions).
  private val roundtrippable = Relational.all

  // The WHOLE pipeline suite round-trips — LSH banding self-joins
  // (side-qualified conditions), lambda HOFs (arrow syntax), the
  // codegen kernels (registered SQL functions carrying their
  // parameters — pq_encode and bpe_segment print their codebook/
  // merge-table children as array literals; image_dhash/
  // audio_energy_sig/media_features made the multimodal queries
  // declarative — all nine former typed-stage exclusions rejoined in
  // round 8), windows with IGNORE NULLS, and (round 9) the two
  // formerly-excluded ITERATIVE plans: duplicateClusters registers a
  // WITH RECURSIVE twin for its localCheckpoint barrier
  // (SqlGen.registerIterative), so d06/d08 print and re-execute like
  // everything else. Zero carve-outs.
  private val pipelineRoundtrippable = graft.queries.Pipeline.all

  for (q <- roundtrippable ++ pipelineRoundtrippable) {
    test(s"roundtrip ${q.name}") {
      Tables.register(spark, sfDir)
      GraftExtensions.register(spark)
      val df = q.build(spark, sfDir)
      val sql = SqlGen.toSql(df)
      val re = spark.sql(sql)
      assertSameRows(df, re)
    }
  }

  test("duplicateClustersSql: the WITH RECURSIVE twin equals the iterative operator on a cyclic chained graph") {
    import spark.implicits._
    // chained duplicates (A~B, B~C, no A~C) across two components,
    // plus a triangle — cycles are exactly what the level-bounded
    // UNION ALL closure must survive
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 9L))
      .toDF("id_a", "id_b")
    pairs.createOrReplaceTempView("_dcs_pairs")
    val op = graft.operators.Dedup.duplicateClusters(pairs)
      .orderBy("id")
    val sql = graft.operators.Dedup.duplicateClustersSql(
      "SELECT id_a, id_b FROM _dcs_pairs")
    assertSameRows(op, spark.sql(sql).orderBy("id"))
    // and the operator's own registration lets toSql print a plan
    // that ENDS in the barrier (not just d06's wrapped forms)
    val re = spark.sql(SqlGen.toSql(op))
    assertSameRows(op, re.orderBy("id"))
  }

  test("golden text: WITH RECURSIVE closure twin is byte-exact on a fixed pairs frame") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    pairs.createOrReplaceTempView("_dcg_pairs")
    // the reference asserts byte-identical SQL text (select.rs:57-104);
    // this pins the recursive closure's emitted text the same way —
    // formatting drift (CTE naming, level bound, DISTINCT placement)
    // fails here even while result-equality still passes
    val txt = graft.operators.Dedup.duplicateClustersSql(
      "SELECT id_a, id_b FROM _dcg_pairs", maxIters = 3)
    assert(txt ==
      """WITH RECURSIVE _dc_p AS (
        |SELECT id_a, id_b FROM _dcg_pairs
        |), _dc_e (src, dst) AS (
        |  SELECT `id_a`, `id_b` FROM _dc_p
        |  UNION
        |  SELECT `id_b`, `id_a` FROM _dc_p
        |), _dc_reach (src, dst, lvl) AS (
        |  SELECT src, dst, 0 FROM _dc_e
        |  UNION ALL
        |  SELECT DISTINCT r.src, e2.dst, r.lvl + 1
        |  FROM _dc_reach r JOIN _dc_e e2 ON r.dst = e2.src
        |  WHERE r.lvl < 3
        |)
        |SELECT src AS id, least(src, min(dst)) AS cluster
        |FROM _dc_reach GROUP BY src""".stripMargin, txt)
    // and the text the OPERATOR registers for its barrier (spliced by
    // toSql) is the same closure with the convergence-frame columns
    val op = graft.operators.Dedup.duplicateClusters(pairs)
    val spliced = SqlGen.toSql(op)
    assert(spliced.contains("WITH RECURSIVE _dc_p AS (") &&
      spliced.contains("SELECT src AS id, least(src, min(dst)) AS label, " +
        "least(src, min(dst)) AS new_label") &&
      spliced.contains("WHERE r.lvl < 25"), spliced)
    assertSameRows(op.orderBy("id"), spark.sql(spliced).orderBy("id"))
  }

  test("roundtrip LEFT JOIN LATERAL (outer lateral prints ON TRUE)") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      """SELECT c_custkey, t.p FROM customer LEFT JOIN LATERAL
        |  (SELECT max(o_totalprice) AS p FROM orders
        |   WHERE o_custkey = c_custkey AND o_totalprice > 400000) t
        |ON TRUE WHERE c_custkey < 30 ORDER BY c_custkey""".stripMargin)
    val sql = SqlGen.toSql(df)
    // the parsed ON TRUE survives as a literal condition (printed
    // lowercase by Literal.sql) — either spelling is the same SQL
    assert(sql.contains("LEFT JOIN LATERAL") &&
      sql.toUpperCase.contains("ON TRUE"), sql)
    assertSameRows(df, spark.sql(sql))
  }

  test("roundtrip cube (generic grouping-sets reconstruction)") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, sfDir)
    val df = Tables.load(spark, sfDir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
    val re = spark.sql(sqlgen.SqlGen.toSql(df))
    assertSameRows(df, re)
  }

  test("generated SQL is flat for simple scan-filter-project") {
    val df = Tables.load(spark, sfDir, "lineitem")
      .where(org.apache.spark.sql.functions.col("l_orderkey") < 10)
      .select("l_orderkey", "l_quantity")
    val sql = SqlGen.toSql(df)
    assert(sql.contains("FROM lineitem"))
    assert(sql.contains("WHERE"))
    assert(!sql.contains("_g"), s"expected single flat SELECT, got: $sql")
  }

  test("golden text: scan-filter-project-sort generates stable SQL") {
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, sfDir, "nation")
      .where(col("n_regionkey") === 1)
      .select(col("n_name"), col("n_nationkey"))
      .orderBy(col("n_name").desc)
    val sql = SqlGen.toSql(df)
    assert(sql ==
      "SELECT * FROM (SELECT n_name, n_nationkey FROM nation " +
      "WHERE (n_regionkey = 1)) AS _g1 ORDER BY n_name DESC NULLS LAST")
  }

  // Golden SQL *text* pins (the reference asserts byte-identical text,
  // select.rs:57-104) — catches formatting drift that result-equality
  // can't: qualifier loss, frame-clause drift, CTE naming.
  test("golden text: join with side-qualified projection") {
    val nation = Tables.load(spark, sfDir, "nation")
    val region = Tables.load(spark, sfDir, "region")
    val df = nation.join(region, nation("n_regionkey") === region("r_regionkey"))
      .select(nation("n_name"), region("r_name"))
    assert(SqlGen.toSql(df) ==
      "SELECT nation.n_name, region.r_name FROM nation JOIN region " +
      "ON (nation.n_regionkey = region.r_regionkey)")
  }

  test("golden text: window rank with explicit frame and null ordering") {
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, sfDir, "nation").select(col("n_name"),
      rank().over(org.apache.spark.sql.expressions.Window
        .partitionBy("n_regionkey").orderBy("n_name")).as("rk"))
    assert(SqlGen.toSql(df) ==
      "SELECT n_name, rk FROM (SELECT n_name, n_regionkey, rk, rk FROM " +
      "(SELECT *, RANK() OVER (PARTITION BY n_regionkey ORDER BY n_name " +
      "ASC NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
      "AS `rk` FROM (SELECT n_name, n_regionkey FROM nation) AS _g1) " +
      "AS _g2) AS _g3")
  }

  test("golden text: round-8 kernels print their deriving parameters") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, sfDir)
    GraftExtensions.register(spark)
    // pq_encode: the flattened codebook prints as an ARRAY literal
    val pq = Tables.load(spark, sfDir, "embeddings").limit(4)
      .select(graft.functions.VectorOps.pqEncodeCodes(
        slice(col("embedding"), 1, 1), Array(0.5, -1.25),
        m = 1, nCodes = 2).as("codes"))
    val pqSql = SqlGen.toSql(pq)
    assert(pqSql.contains("pq_encode(") && pqSql.contains("1, 2") &&
      pqSql.toUpperCase.contains("ARRAY(0.5") , pqSql)
    assertSameRows(pq, spark.sql(pqSql))
    // bpe_segment: merge table prints as an array of "left right"
    val merges = Seq(graft.operators.TextAnalysis.BpeMerge(1, "a", "b", 5L))
    val bpe = Tables.load(spark, sfDir, "documents").limit(4)
      .select(graft.functions.TextKernelOps.bpeSegment(
        substring(col("text"), 1, 6), merges).as("pieces"))
    val bpeSql = SqlGen.toSql(bpe)
    assert(bpeSql.contains("bpe_segment(") && bpeSql.contains("a b"), bpeSql)
    assertSameRows(bpe, spark.sql(bpeSql))
    // unigram_segment: piece table prints as an array of "piece logprob"
    // (Double.toString round-trips bit-exactly through the SQL parser)
    val table = Seq(
      graft.operators.TextAnalysis.UnigramPiece("th", -1.5),
      graft.operators.TextAnalysis.UnigramPiece("e", -2.25))
    val ug = Tables.load(spark, sfDir, "documents").limit(4)
      .select(graft.functions.TextKernelOps.unigramSegment(
        substring(col("text"), 1, 6), table).as("pieces"))
    val ugSql = SqlGen.toSql(ug)
    assert(ugSql.contains("unigram_segment(") && ugSql.contains("th -1.5"),
      ugSql)
    assertSameRows(ug, spark.sql(ugSql))
    // media kernels: bare function names (no derived constants)
    val media = graft.operators.Multimodal.fromDocuments(
      Tables.load(spark, sfDir, "documents").select("doc_id", "text")).limit(4)
    val md = media.select(
      graft.functions.MediaKernelOps.imageDHash(col("bytes")).as("ph"),
      graft.functions.MediaKernelOps.audioEnergySig(
        col("kind"), col("bytes")).as("as_"),
      graft.functions.MediaKernelOps.mediaFeatures(
        col("kind"), col("bytes"), col("width"), col("height"),
        col("duration_ms"), 256, 256).as("f"))
    val mdSql = SqlGen.toSql(md)
    assert(mdSql.contains("image_dhash(") &&
      mdSql.contains("audio_energy_sig(") &&
      mdSql.contains("media_features(") && mdSql.contains("256, 256"), mdSql)
    assertSameRows(md, spark.sql(mdSql))
  }

  test("golden text: CTE keeps its name and positional GROUP BY") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "WITH big AS (SELECT n_regionkey, count(*) AS n FROM nation " +
        "GROUP BY n_regionkey) SELECT * FROM big WHERE n > 3")
    assert(SqlGen.toSql(df) ==
      "WITH big AS (SELECT n_regionkey, count(1) AS `n` FROM nation " +
      "GROUP BY 1) SELECT n_regionkey, n FROM (SELECT * FROM big) AS big " +
      "WHERE (n > CAST(3 AS BIGINT))")
  }

  test("golden text: correlated EXISTS prints the inner plan inline") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "SELECT r_name FROM region WHERE EXISTS " +
        "(SELECT 1 FROM nation WHERE n_regionkey = r_regionkey)")
    assert(SqlGen.toSql(df) ==
      "SELECT r_name FROM region WHERE EXISTS (SELECT 1 AS `1` " +
      "FROM nation WHERE (n_regionkey = r_regionkey))")
  }

  test("condition-less outer join prints ON TRUE and roundtrips") {
    val nation = Tables.load(spark, sfDir, "nation").select("n_name", "n_regionkey")
    val region = Tables.load(spark, sfDir, "region").select("r_name")
    Tables.register(spark, sfDir)
    val df = nation.join(region, Seq.empty[String], "left")
    val sql = SqlGen.toSql(df)
    assert(sql.contains("LEFT JOIN") && sql.contains("ON TRUE"),
      s"expected explicit ON TRUE, got: $sql")
    assertSameRows(df, spark.sql(sql))
  }

  test("golden text: scalar subquery in SELECT (reference select.rs:752-988)") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "SELECT r_name, (SELECT count(*) FROM nation " +
        "WHERE n_regionkey = r_regionkey) AS n_nations FROM region")
    val sql = SqlGen.toSql(df)
    assert(sql ==
      "SELECT r_name, (SELECT count(1) AS `count(1)` FROM (SELECT * " +
      "FROM nation WHERE (n_regionkey = r_regionkey)) AS _g1) " +
      "AS `n_nations` FROM region",
      s"golden text drift: $sql")
    assertSameRows(df, spark.sql(sql))
  }

  test("golden text: bounded-heap topk + posexplode (the s09 tail shape)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents").limit(0)
    val df = docs.groupBy(col("lang"))
      .agg(graft.functions.TopK.topk(col("n_chars").cast("double"),
        col("doc_id"), 3).as("t"))
      .select(col("lang"), posexplode(col("t")).as(Seq("p", "w")))
    assert(SqlGen.toSql(df) ==
      "SELECT lang, p, w FROM (SELECT * FROM (SELECT lang, " +
      "topk_rows(named_struct('ord', CAST(CAST(n_chars AS DOUBLE) AS " +
      "DOUBLE), 'id', CAST(doc_id AS BIGINT)), 3) AS `t` FROM " +
      "(SELECT * FROM documents LIMIT 0) AS _g1 GROUP BY 1) AS _g2 " +
      "LATERAL VIEW POSEXPLODE(t) _lv AS `p`, `w`) AS _g3",
      s"golden text drift: ${SqlGen.toSql(df)}")
  }

  test("golden text: collect_list + sort_array + slice + array_join (e06 shape)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents").limit(0)
    val df = docs.groupBy(col("lang"))
      .agg(collect_list(col("source")).as("ids"))
      .select(col("lang"),
        array_join(slice(sort_array(col("ids")), 1, 4), ">").as("path"))
    assert(SqlGen.toSql(df) ==
      "SELECT lang, array_join(slice(sort_array(ids, true), 1, 4), '>') " +
      "AS `path` FROM (SELECT lang, collect_list(source) AS `ids` FROM " +
      "(SELECT * FROM documents LIMIT 0) AS _g1 GROUP BY 1) AS _g2",
      s"golden text drift: ${SqlGen.toSql(df)}")
  }

  test("golden text: IN (subquery) predicate (reference select.rs:752-988)") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "SELECT n_name FROM nation WHERE n_regionkey IN " +
        "(SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')")
    val sql = SqlGen.toSql(df)
    assert(sql ==
      "SELECT n_name FROM nation WHERE n_regionkey IN (SELECT " +
      "r_regionkey FROM region WHERE r_name LIKE 'A%')",
      s"golden text drift: $sql")
    assertSameRows(df, spark.sql(sql))
  }

  test("roundtrip cube with grouping_id()/grouping() projected") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, sfDir)
    val df = Tables.load(spark, sfDir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        grouping_id().as("gid"), grouping("l_returnflag").as("g_rf"))
    val sql = SqlGen.toSql(df)
    assert(sql.contains("GROUPING_ID()"))
    assert(sql.contains("GROUPING("))
    assertSameRows(df, spark.sql(sql))
  }

  test("empty relation roundtrips (reference select.rs EmptyRelation)") {
    import spark.implicits._
    val df = Seq.empty[(Int, String)].toDF("x", "s")
    val sql = SqlGen.toSql(df)
    val re = spark.sql(sql)
    assert(re.isEmpty)
    assert(re.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    // and under operators
    val filtered = Seq.empty[(Int, String)].toDF("x", "s").where($"x" > 0)
    assert(spark.sql(SqlGen.toSql(filtered)).isEmpty)
  }

  test("in-memory relation roundtrips as inline VALUES") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b"), (3, "b")).toDF("x", "s")
      .where($"x" > 1).select($"s", $"x")
    val sql = SqlGen.toSql(df)
    assert(sql.contains("VALUES"), sql)
    assertSameRows(df, spark.sql(sql))
  }

  test("registered CSV relation is named in generated SQL (reference select.rs:88-104)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("sqlgen-csv").toString
    Tables.load(spark, sfDir, "nation")
      .write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    val csv = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/nation_csv")
    csv.createOrReplaceTempView("nation_csv")
    SqlGen.register("nation_csv", csv)
    val df = csv.where(col("n_regionkey") === 1).select("n_name", "n_nationkey")
    val sql = SqlGen.toSql(df)
    assert(sql.contains("FROM nation_csv"), sql)
    assertSameRows(df, spark.sql(sql))
    // a fresh read of the same files resolves to the same name
    val again = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/nation_csv")
      .select("n_name")
    assert(SqlGen.toSql(again).contains("FROM nation_csv"))
  }

  // Subquery *expressions* — the reference's nested-subquery surface
  // (select.rs:752-988): scalar subqueries, EXISTS and IN (subquery)
  // inside WHERE/SELECT, without pre-lowering to joins.
  test("roundtrip scalar subquery in WHERE") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)")
    val sql = SqlGen.toSql(df)
    assert(sql.contains("(SELECT"), sql)
    assertSameRows(df, spark.sql(sql))
  }

  test("roundtrip scalar subquery in SELECT list") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "SELECT n_name, (SELECT max(r_name) FROM region) AS top_r FROM nation")
    assertSameRows(df, spark.sql(SqlGen.toSql(df)))
  }

  test("roundtrip correlated EXISTS / NOT EXISTS in WHERE") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_totalprice > 100000) ORDER BY c_custkey")
    val sql = SqlGen.toSql(df)
    assert(sql.contains("EXISTS (SELECT"), sql)
    assertSameRows(df, spark.sql(sql))

    val not = spark.sql(
      "SELECT c_custkey FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)")
    assertSameRows(not, spark.sql(SqlGen.toSql(not)))
  }

  test("roundtrip IN (subquery) in WHERE") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "SELECT s_suppkey, s_name FROM supplier WHERE s_nationkey IN " +
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)")
    val sql = SqlGen.toSql(df)
    assert(sql.contains("IN (SELECT"), sql)
    assertSameRows(df, spark.sql(sql))
  }

  // The reference's commented-out aspirational CTE surface
  // (select.rs:667-750): multi-definition WITH, CTEs referencing CTEs,
  // a CTE joined to itself under different aliases, SELECT without
  // FROM inside a CTE.
  test("roundtrip multi-CTE join and CTE-referencing-CTE") {
    val a = spark.sql(
      "WITH t AS (SELECT 1 AS id1), u AS (SELECT 1 AS id2, 5 AS x) " +
        "SELECT x FROM t JOIN u ON (id1 = id2)")
    assertSameRows(a, spark.sql(SqlGen.toSql(a)))
    val b = spark.sql(
      "WITH t AS (SELECT 1 AS id1), u AS (SELECT * FROM t) SELECT * FROM u")
    assertSameRows(b, spark.sql(SqlGen.toSql(b)))
  }

  test("roundtrip CTE self-joined under three aliases (select.rs:668-690)") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "WITH v1 AS (SELECT n_nationkey AS id FROM nation), " +
        "v2 AS (SELECT v1.id AS id, v1a.id AS id_a, v1b.id AS id_b " +
        "FROM v1, v1 v1a, v1 v1b " +
        "WHERE v1a.id = v1.id - 1 AND v1b.id = v1.id + 1) " +
        "SELECT * FROM v2")
    assertSameRows(df, spark.sql(SqlGen.toSql(df)))
  }

  test("roundtrip nested array index and struct-array access (select.rs:283-388)") {
    import spark.implicits._
    val nested = Seq((1, Seq(Seq(10, 11), Seq(20))), (2, Seq(Seq(30, 31))))
      .toDF("id", "some_list")
    val a = nested.select($"id", $"some_list" (0)(1).as("i0"))
    assertSameRows(a, spark.sql(SqlGen.toSql(a)))
    val structs = Seq((1, (Seq(5, 6), "x")), (2, (Seq(7), "y")))
      .toDF("id", "some_struct")
    val b = structs.select($"some_struct._1" (0).as("i0"),
      $"some_struct._2".as("l0"))
    assertSameRows(b, spark.sql(SqlGen.toSql(b)))
  }

  test("roundtrip correlated scalar subquery in WHERE") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_totalprice > " +
        "(SELECT 2 * sum(l_extendedprice) FROM lineitem " +
        "WHERE l_orderkey = o_orderkey)")
    assertSameRows(df, spark.sql(SqlGen.toSql(df)))
  }

  test("same-table correlation raises a clear shadowing error instead of a tautology") {
    Tables.register(spark, sfDir)
    // o_custkey is exposed by the subquery's own orders scan: the bare
    // printed name would silently re-resolve inner=inner
    val df = spark.sql(
      "SELECT o_orderkey FROM orders o1 WHERE o_totalprice > " +
        "(SELECT avg(o2.o_totalprice) FROM orders o2 " +
        "WHERE o2.o_custkey = o1.o_custkey)")
    val e = intercept[IllegalArgumentException](SqlGen.toSql(df))
    assert(e.getMessage.contains("shadowed"), e.getMessage)
  }

  test("empty nested containers keep their element type through VALUES") {
    import spark.implicits._
    val df = Seq((1L, Seq.empty[Int]), (2L, Seq(7))).toDF("id", "xs")
    val sql = SqlGen.toSql(df)
    val re = spark.sql(sql)
    // catalogString: the element TYPE must survive (array<int>, not
    // array<void>); containsNull inference may legitimately tighten
    assert(re.schema("xs").dataType.catalogString ==
      df.schema("xs").dataType.catalogString, sql)
    assertSameRows(df, re)
  }

  test("roundtrip NOT IN (subquery)") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      "SELECT s_suppkey FROM supplier WHERE s_nationkey NOT IN " +
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)")
    assertSameRows(df, spark.sql(SqlGen.toSql(df)))
  }

  test("repartition/sortWithinPartitions are transparent to generated SQL") {
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, sfDir, "nation")
      .repartition(4, col("n_regionkey"))
      .sortWithinPartitions("n_name")
      .select("n_name", "n_regionkey")
    val sql = SqlGen.toSql(df)
    assert(!sql.toLowerCase.contains("repartition"), sql)
    assertSameRows(df, spark.sql(sql))
  }

  test("roundtrip SELECT constants without FROM (select.rs:180-215)") {
    val df = spark.sql(
      "SELECT 1 IS DISTINCT FROM CAST(NULL AS INT) AS a, " +
        "NULL IS NOT DISTINCT FROM NULL AS f, " +
        "'x' IS NOT DISTINCT FROM 'x' AS d")
    assertSameRows(df, spark.sql(SqlGen.toSql(df)))
  }

  test("unnamed non-parquet relation raises a clear error") {
    val dir = java.nio.file.Files.createTempDirectory("sqlgen-anon").toString
    Tables.load(spark, sfDir, "region").write.mode("overwrite").json(s"$dir/r")
    val df = spark.read.json(s"$dir/r")
    val e = intercept[IllegalArgumentException](SqlGen.toSql(df))
    assert(e.getMessage.contains("register"))
  }
}
