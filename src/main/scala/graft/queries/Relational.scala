package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** The relational query surface of the reference engine, re-expressed
  * as declarative Spark DataFrame pipelines.
  *
  * Coverage maps 1:1 to the reference's plan/expression surface
  * (reference: datafusion-sqlgen/src/logical_plan.rs:37-203 for
  * Sort/Projection/Filter/Distinct/TableScan/Limit/Offset,
  * datafusion-sqlgen/src/expr.rs:15-237 for the expression set, and
  * datafusion-sqlgen/tests/select.rs for the test queries — including
  * the commented-out aspirational surface: aggregates, windows, CTEs,
  * unions, joins, struct access, select.rs:460-988).
  *
  * Numeric-determinism policy: every floating-point SUM first casts to
  * DECIMAL(18,2) so partial (map-side) aggregation order cannot change
  * the result — decimal addition is exact and associative. The final
  * value is cast back to double. AVG is computed as exact-decimal-sum /
  * count with one IEEE double division. This is both a correctness
  * property at 100 TB (results don't drift with partitioning) and what
  * keeps the DuckDB oracle hash stable.
  */
object Relational {

  /** One checklist entry: the Spark pipeline + its DuckDB oracle. */
  final case class Q(
      name: String,
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact, order-independent sum of a double column (see above). */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")
  /** Discounted-revenue sum: price*(1-disc) computed entirely in
    * decimal. Casting the raw columns (which are exact 2-decimal
    * values) is engine-agnostic, whereas casting a *computed* double
    * product to decimal rounds differently across engines when the
    * product lands near a .005 tie.
    */
  private def drevSum(price: Column, disc: Column): Column =
    sum(dec(price) * (lit(1) - dec(disc))).cast("double")

  // Oracle-side helpers: same decimal contracts as dsum / drevSum.
  private def oSum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  private def oRevSum(price: String, disc: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($disc AS DECIMAL(18,2)))) AS DOUBLE)"

  val all: Seq[Q] = Seq(

    // ───────────────────────── scan / project ─────────────────────────
    // reference: logical_plan.rs:67-116 (Projection), 155-181 (TableScan)
    Q("q01_scan_project",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ───────────────────────── filter ─────────────────────────
    // reference: logical_plan.rs:117-135 (Filter); expr.rs:34-55 (binary ops)
    Q("q02_filter",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                 col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                 col("l_discount").between(0.05, 0.07) &&
                 col("l_quantity") < 24)
          .select(col("l_orderkey"), col("l_linenumber"),
                  col("l_extendedprice"), col("l_discount"),
                  date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
             |strftime(l_shipdate, '%Y-%m-%d') AS ship_day FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |AND l_shipdate < TIMESTAMP '1997-01-01'
             |AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ───────────────────────── aggregate (TPC-H Q1 shape) ─────────────────────────
    // reference: tests/select.rs:600-648 (COUNT/MIN/MAX/GROUP BY surface)
    Q("q03_agg_pricing",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            drevSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
            (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |${oSum("l_quantity")} AS sum_qty,
              |${oSum("l_extendedprice")} AS sum_base_price,
              |${oRevSum("l_extendedprice", "l_discount")} AS sum_disc_price,
              |${oSum("l_quantity")} / COUNT(*) AS avg_qty,
              |MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
              |COUNT(*) AS count_order
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ───────────────────────── distinct ─────────────────────────
    // reference: logical_plan.rs:136-154 (Distinct); tests/select.rs:125-158
    Q("q04_distinct",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus").distinct()
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ───────────────────────── sort + limit + offset ─────────────────────────
    // reference: logical_plan.rs:38-66 (Sort), 182-198 (Limit fetch+skip)
    Q("q05_sort_limit_offset",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .offset(5).limit(10)
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM
             |(SELECT o_orderkey, o_totalprice FROM orders
             | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5) t
             |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin)),

    // ───────────────────────── between / not between ─────────────────────────
    // reference: expr.rs:60-75 (Between incl. negated)
    Q("q06_between",
      (s, dir) => {
        Tables.load(s, dir, "part")
          .where(col("p_size").between(10, 20) &&
                 !col("p_retailprice").between(1000.0, 1500.0))
          .select("p_partkey", "p_size", "p_retailprice")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_size, p_retailprice FROM part
             |WHERE p_size BETWEEN 10 AND 20
             |AND p_retailprice NOT BETWEEN 1000.0 AND 1500.0
             |ORDER BY p_partkey""".stripMargin)),

    // ───────────────────────── cast ─────────────────────────
    // reference: expr.rs:56-59 + datatype_to_sql expr.rs:217-237
    Q("q07_cast",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") < 50)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("l_linenumber").cast("long").as("ln_big"),
            col("l_linenumber").cast("short").as("ln_small"),
            col("l_orderkey").cast("string").as("ok_str"),
            col("l_orderkey").cast("double").as("ok_dbl"),
            col("l_quantity").cast(DecimalType(10, 2)).cast("double").as("qty_fixed"),
            col("l_shipdate").cast("date").cast("string").as("ship_str"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |CAST(l_linenumber AS BIGINT) AS ln_big,
             |CAST(l_linenumber AS SMALLINT) AS ln_small,
             |CAST(l_orderkey AS VARCHAR) AS ok_str,
             |CAST(l_orderkey AS DOUBLE) AS ok_dbl,
             |CAST(CAST(l_quantity AS DECIMAL(10,2)) AS DOUBLE) AS qty_fixed,
             |CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str
             |FROM lineitem WHERE l_orderkey < 50
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ───────────────────────── IS [NOT] DISTINCT FROM ─────────────────────────
    // reference: expr.rs:35-44; tests/select.rs:199-231
    Q("q08_is_distinct",
      (s, dir) => {
        val one = lit(1)
        val nullInt = lit(null).cast("int")
        // structurally distinct right-hand twins: Column WARNs
        // ("trivially true equals predicate") whenever both <=>
        // operands are the same expression tree
        val one2 = lit(1L).cast("int")
        val nullInt2 = lit(null).cast("long").cast("int")
        val x2 = concat(lit("x"), lit(""))
        s.range(1).select(
          !(one <=> nullInt) as "a",
          !(one <=> one2) as "b",
          (one <=> nullInt) as "c",
          (one <=> one2) as "d",
          !(lit("x") <=> lit(null).cast("string")) as "e",
          (lit("x") <=> x2) as "f",
          (nullInt <=> nullInt2) as "g",
          !(nullInt <=> one) as "h")
      },
      Some("""SELECT 1 IS DISTINCT FROM CAST(NULL AS INT) AS a,
             |1 IS DISTINCT FROM 1 AS b,
             |1 IS NOT DISTINCT FROM CAST(NULL AS INT) AS c,
             |1 IS NOT DISTINCT FROM 1 AS d,
             |'x' IS DISTINCT FROM CAST(NULL AS VARCHAR) AS e,
             |'x' IS NOT DISTINCT FROM 'x' AS f,
             |CAST(NULL AS INT) IS NOT DISTINCT FROM CAST(NULL AS INT) AS g,
             |CAST(NULL AS INT) IS DISTINCT FROM 1 AS h""".stripMargin)),

    // ───────────────────────── scalar functions ─────────────────────────
    // reference: expr.rs:76-94 (ScalarFunction); tests/select.rs:234-249
    Q("q09_scalar_fns",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") < 100)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            abs(col("l_extendedprice") - 20000.0).as("abs_diff"),
            floor(col("l_quantity") / 2.0).as("half_floor"),
            ceil(col("l_discount") * 100).as("disc_pct"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            upper(col("l_returnflag")).as("rf_up"),
            lower(col("l_linestatus")).as("ls_low"),
            concat(col("l_returnflag"), lit("-"), col("l_linestatus")).as("flag_pair"),
            length(col("l_returnflag")).as("rf_len"),
            coalesce(lit(null).cast("double"), col("l_tax")).as("tax_co"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |ABS(l_extendedprice - 20000.0) AS abs_diff,
             |CAST(FLOOR(l_quantity / 2.0) AS BIGINT) AS half_floor,
             |CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct,
             |SQRT(l_quantity) AS qty_sqrt,
             |UPPER(l_returnflag) AS rf_up,
             |LOWER(l_linestatus) AS ls_low,
             |l_returnflag || '-' || l_linestatus AS flag_pair,
             |LENGTH(l_returnflag) AS rf_len,
             |COALESCE(CAST(NULL AS DOUBLE), l_tax) AS tax_co
             |FROM lineitem WHERE l_orderkey < 100
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ───────────────────────── LIKE / regex ─────────────────────────
    // reference: expr.rs binary_operator_to_sql:200-205 (Like, RegexMatch)
    // reference covers all four PG regex operators (~ ~* !~ !~*),
    // expr.rs:202-205: match, case-insensitive match, and negations
    Q("q10_like_regex",
      (s, dir) => {
        Tables.load(s, dir, "part")
          .where(col("p_name").like("%a%") &&
                 !col("p_type").like("SMALL%") &&
                 col("p_brand").rlike("Brand#[0-9]+") &&
                 col("p_type").rlike("(?i)^[a-z]+") &&
                 !col("p_name").rlike("zzz+"))
          .select("p_partkey", "p_name", "p_brand", "p_type")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name, p_brand, p_type FROM part
             |WHERE p_name LIKE '%a%' AND p_type NOT LIKE 'SMALL%'
             |AND regexp_matches(p_brand, 'Brand#[0-9]+')
             |AND regexp_matches(p_type, '^[a-z]+', 'i')
             |AND NOT regexp_matches(p_name, 'zzz+')
             |ORDER BY p_partkey""".stripMargin)),

    // ───────────────────────── arithmetic / modulo / bitwise / concat ─────────────────────────
    // reference: expr.rs binary_operator_to_sql:185-214
    Q("q11_arith_bitwise",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") < 100)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_quantity") * 2 + 1 - 0.5).as("arith"),
            (col("l_orderkey") % 7).as("mod7"),
            (col("l_orderkey").bitwiseAND(15)).as("band"),
            (col("l_orderkey").bitwiseOR(8)).as("bor"),
            (col("l_orderkey").bitwiseXOR(21)).as("bxor"),
            shiftleft(col("l_linenumber"), 2).as("shl"),
            shiftright(col("l_orderkey"), 1).as("shr"),
            concat(col("l_returnflag"), col("l_linestatus")).as("cc"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |l_quantity * 2 + 1 - 0.5 AS arith,
             |l_orderkey % 7 AS mod7,
             |l_orderkey & 15 AS band,
             |l_orderkey | 8 AS bor,
             |xor(l_orderkey, 21) AS bxor,
             |CAST(l_linenumber << 2 AS INT) AS shl,
             |l_orderkey >> 1 AS shr,
             |l_returnflag || l_linestatus AS cc
             |FROM lineitem WHERE l_orderkey < 100
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ───────────────────────── array index ─────────────────────────
    // reference: expr.rs:95-102 (GetIndexedField); tests/select.rs:252-281
    Q("q12_array_index",
      (s, dir) => {
        Tables.load(s, dir, "embeddings")
          .select(
            col("vec_id"),
            element_at(col("embedding"), 1).cast("double").as("e1"),
            element_at(col("embedding"), 8).cast("double").as("e8"),
            size(col("embedding")).as("dim"))
          .orderBy("vec_id")
      },
      Some("""SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS e1,
             |CAST(embedding[8] AS DOUBLE) AS e8,
             |CAST(len(embedding) AS INT) AS dim
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ───────────────────────── CASE WHEN ─────────────────────────
    Q("q13_case_when",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .select(
            when(col("o_totalprice") > 200000, "big")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("small").as("bucket"),
            col("o_totalprice"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("bucket")
      },
      Some(s"""SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
              |WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
              |COUNT(*) AS n, ${oSum("o_totalprice")} AS total
              |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ───────────────────────── IN list + IN subquery ─────────────────────────
    Q("q14_in_subquery",
      (s, dir) => {
        val customer = Tables.load(s, dir, "customer")
        val bigSpenders = Tables.load(s, dir, "orders")
          .where(col("o_totalprice") > 250000).select(col("o_custkey"))
        customer
          .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
          .join(bigSpenders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
             |AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
             |ORDER BY c_custkey""".stripMargin)),

    // ───────────────────────── inner join + agg ─────────────────────────
    // reference: tests/select.rs:724-734 (join surface)
    Q("q15_join_inner",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        orders.join(customer, col("o_custkey") === col("c_custkey"))
          .where(col("c_mktsegment") === "BUILDING")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
          .orderBy("c_nationkey")
      },
      Some(s"""SELECT c_nationkey, COUNT(*) AS n_orders,
              |${oSum("o_totalprice")} AS total
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ───────────────────────── multi-way join (TPC-H Q3 shape) ─────────────────────────
    Q("q16_join_multi",
      (s, dir) => {
        val cutoff = lit("1998-06-15").cast("timestamp")
        val customer = Tables.load(s, dir, "customer")
          .where(col("c_mktsegment") === "BUILDING")
        val orders = Tables.load(s, dir, "orders")
          .where(col("o_orderdate") < cutoff)
        val lineitem = Tables.load(s, dir, "lineitem")
          .where(col("l_shipdate") > cutoff)
        lineitem
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(customer, col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"),
                   date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
          .agg(drevSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
          .orderBy(col("revenue").desc, col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
              |${oRevSum("l_extendedprice", "l_discount")} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |AND o_orderdate < TIMESTAMP '1998-06-15'
              |AND l_shipdate > TIMESTAMP '1998-06-15'
              |GROUP BY o_orderkey, order_day
              |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ───────────────────────── left outer join ─────────────────────────
    Q("q17_join_outer",
      (s, dir) => {
        val nation = Tables.load(s, dir, "nation")
        val richSup = Tables.load(s, dir, "supplier")
          .where(col("s_acctbal") > 5000)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("cnt"), dsum(col("s_acctbal")).as("bal"))
        nation.join(richSup, col("n_nationkey") === col("s_nationkey"), "left_outer")
          .select(col("n_name"),
                  coalesce(col("cnt"), lit(0L)).as("n_rich"),
                  coalesce(col("bal"), lit(0.0)).as("rich_bal"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, COALESCE(cnt, 0) AS n_rich,
              |COALESCE(bal, 0.0) AS rich_bal
              |FROM nation LEFT JOIN (
              |  SELECT s_nationkey, COUNT(*) AS cnt, ${oSum("s_acctbal")} AS bal
              |  FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
              |) s ON n_nationkey = s_nationkey
              |ORDER BY n_name""".stripMargin)),

    // ───────────────────────── semi / anti join (EXISTS) ─────────────────────────
    Q("q18_semi_anti",
      (s, dir) => {
        val customer = Tables.load(s, dir, "customer")
        val orders = Tables.load(s, dir, "orders").select("o_custkey")
        val semi = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
        val anti = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("without_orders").as("kind"), col("n"))
        semi.unionAll(anti).orderBy("kind")
      },
      Some("""SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |UNION ALL
             |SELECT 'without_orders' AS kind, COUNT(*) AS n FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY kind""".stripMargin)),

    // ───────────────────────── union all + agg ─────────────────────────
    // reference: tests/select.rs:708-721 (UNION ALL surface)
    Q("q19_union",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").select(col("c_nationkey").cast("int").as("k"))
        val su = Tables.load(s, dir, "supplier").select(col("s_nationkey").cast("int").as("k"))
        c.unionAll(su).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
      },
      Some("""SELECT k, COUNT(*) AS n FROM (
             |SELECT CAST(c_nationkey AS INT) AS k FROM customer
             |UNION ALL SELECT CAST(s_nationkey AS INT) AS k FROM supplier) t
             |GROUP BY k ORDER BY k""".stripMargin)),

    // ───────────────────────── CTE / WITH ─────────────────────────
    // reference: tests/select.rs:667-750 (CTE surface)
    Q("q20_cte",
      (s, dir) => {
        Tables.register(s, dir)
        s.sql("""WITH big_orders AS (
                |  SELECT o_custkey, COUNT(*) AS n_big
                |  FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
                |)
                |SELECT c_mktsegment, COUNT(*) AS n_cust,
                |       CAST(SUM(n_big) AS BIGINT) AS n_big_orders
                |FROM customer JOIN big_orders ON c_custkey = o_custkey
                |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""WITH big_orders AS (
             |  SELECT o_custkey, COUNT(*) AS n_big
             |  FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
             |)
             |SELECT c_mktsegment, COUNT(*) AS n_cust,
             |       CAST(SUM(n_big) AS BIGINT) AS n_big_orders
             |FROM customer JOIN big_orders ON c_custkey = o_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ───────────────────────── window: ranking ─────────────────────────
    // reference: tests/select.rs:650-662 (row_number OVER PARTITION BY)
    Q("q21_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables.load(s, dir, "customer")
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
                  row_number().over(w).as("rn"),
                  rank().over(w).as("rk"),
                  dense_rank().over(w).as("drk"),
                  ntile(4).over(w).as("quartile"),
                  // floor-scale, NOT round(): Spark rounds the decimal
                  // repr HALF_UP, DuckDB the binary double — they flip
                  // 6th-decimal ties differently; floor(x*1e6+0.5)/1e6
                  // is the same IEEE op sequence on both engines
                  (floor(percent_rank().over(w) * lit(1e6) + lit(0.5)) / lit(1e6)).as("prk"),
                  (floor(cume_dist().over(w) * lit(1e6) + lit(0.5)) / lit(1e6)).as("cd"))
          .where(col("rn") <= 3)
          .orderBy("c_nationkey", "rn")
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, rn, rk, drk,
             |CAST(quartile AS INT) AS quartile, prk, cd FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk,
             |  NTILE(4) OVER w AS quartile,
             |  FLOOR((PERCENT_RANK() OVER w) * 1000000 + 0.5) / 1000000 AS prk,
             |  FLOOR((CUME_DIST() OVER w) * 1000000 + 0.5) / 1000000 AS cd
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
             |) t WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin)),

    // ───────────────────────── window: running agg + lag ─────────────────────────
    Q("q22_window_agg",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        val wk = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").asc)
        Tables.load(s, dir, "orders")
          .where(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
                  sum(dec(col("o_totalprice")))
                    .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
                    .cast("double").as("running_total"),
                  lag(col("o_totalprice"), 1).over(w).as("prev_price"),
                  lead(col("o_totalprice"), 1).over(w).as("next_price"),
                  first(col("o_totalprice"))
                    .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
                    .as("first_price"),
                  sum(dec(col("o_totalprice")))
                    .over(wk.rangeBetween(-5, 0))
                    .cast("double").as("range5_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
             |LAG(o_totalprice, 1) OVER w AS prev_price,
             |LEAD(o_totalprice, 1) OVER w AS next_price,
             |FIRST_VALUE(o_totalprice) OVER (w
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |  PARTITION BY o_custkey ORDER BY o_orderkey
             |  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range5_total
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // event-time RANGE frame: rolling 1-hour per-user event count —
    // the interval-bounded window q22's numeric RANGE can't express.
    // Both engines read ts at the µs floor (Tables.events / CAST), so
    // the inclusive ts-1h lower bound admits identical peer sets.
    Q("q49_range_interval_window",
      (s, dir) => {
        Tables.register(s, dir)
        s.sql("""SELECT event_id, user_id,
                |count(*) OVER (PARTITION BY user_id ORDER BY ts
                |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                |  AS n_last_hour
                |FROM events ORDER BY event_id""".stripMargin)
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |  FROM events
             |)
             |SELECT event_id, user_id,
             |COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
             |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             |  AS n_last_hour
             |FROM e ORDER BY event_id""".stripMargin)),

    // ───────────────────────── rollup ─────────────────────────
    Q("q23_rollup",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              |${oSum("l_quantity")} AS qty
              |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // ───────────────────────── having ─────────────────────────
    Q("q24_having",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .groupBy("l_partkey")
          .agg(dsum(col("l_quantity")).as("qty"))
          .where(col("qty") > 150)
          .orderBy("l_partkey")
      },
      Some(s"""SELECT l_partkey, ${oSum("l_quantity")} AS qty
              |FROM lineitem GROUP BY l_partkey
              |HAVING ${oSum("l_quantity")} > 150
              |ORDER BY l_partkey""".stripMargin)),

    // ───────────────────────── scalar subquery ─────────────────────────
    Q("q25_scalar_subquery",
      (s, dir) => {
        val customer = Tables.load(s, dir, "customer")
        // Exact decimal mean → the comparison threshold is identical on
        // both engines regardless of row order.
        val meanRow = customer
          .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("m"))
        customer.join(meanRow)
          .where(col("c_acctbal") > col("m"))
          .select("c_custkey", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_acctbal FROM customer
              |WHERE c_acctbal > (SELECT ${oSum("c_acctbal")} / COUNT(*) FROM customer)
              |ORDER BY c_custkey""".stripMargin)),

    // ───────────────────────── struct / nested access ─────────────────────────
    // reference: tests/select.rs:390-459 (struct + nested list access)
    Q("q26_struct_access",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") < 50)
          .select(col("l_orderkey"), col("l_linenumber"),
                  struct(col("l_quantity").as("qty"), col("l_extendedprice").as("price")).as("st"),
                  array(col("l_quantity"), col("l_tax")).as("arr"))
          .select(col("l_orderkey"), col("l_linenumber"),
                  col("st").getField("price").as("st_price"),
                  element_at(col("arr"), 2).as("arr2"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |{'qty': l_quantity, 'price': l_extendedprice}.price AS st_price,
             |[l_quantity, l_tax][2] AS arr2
             |FROM lineitem WHERE l_orderkey < 50
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ───────────────────────── events: time-bucket agg ─────────────────────────
    // Batch twin of the streaming tumbling-window agg (see graft.streaming).
    Q("q27_events_bucket",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
                   col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .orderBy("hour", "event_type")
      },
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
              |event_type, COUNT(*) AS n, ${oSum("value")} AS total_value
              |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // ───────────────────────── distinct-count + sketch aggregates ─────────────────────────
    // Exact COUNT(DISTINCT) is the oracle-checked contract; the
    // HLL/percentile sketch twins are spec-checked for accuracy bounds
    // (SketchAggSpec) since approximate values are engine-specific.
    Q("q29_distinct_agg",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
               countDistinct(col("l_suppkey")).as("n_supps"),
               count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
             |COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ───────────────────────── custom bounded-heap top-k aggregate ─────────────────────────
    // Same semantics as q21's window ranking, executed by the
    // graft.functions.TopKRows TypedImperativeAggregate: map-side state
    // is a k-heap, so the shuffle carries ≤k rows per group per
    // partition instead of every row (see TopK.scala scaladoc).
    Q("q28_topk_per_group",
      (s, dir) => {
        Tables.load(s, dir, "customer")
          .groupBy("c_nationkey")
          .agg(graft.functions.TopK.topk(col("c_acctbal"), col("c_custkey"), 3).as("top"))
          .select(col("c_nationkey"), posexplode(col("top")))
          .select(col("c_nationkey"), (col("pos") + 1).cast("int").as("rn"),
                  col("col.id").as("c_custkey"), col("col.ord").as("c_acctbal"))
          .orderBy("c_nationkey", "rn")
      },
      Some("""SELECT c_nationkey, CAST(rn AS INT) AS rn, c_custkey, c_acctbal FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |  ROW_NUMBER() OVER (PARTITION BY c_nationkey
             |    ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer
             |) t WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin)),

    // ───────────────────────── intersect / except ─────────────────────────
    Q("q31_intersect_except",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer").select(col("c_nationkey").cast("int").as("k"))
        val supp = Tables.load(s, dir, "supplier").select(col("s_nationkey").cast("int").as("k"))
        val both = cust.intersect(supp).select(col("k"), lit("both").as("src"))
        val custOnly = cust.except(supp).select(col("k"), lit("cust_only").as("src"))
        both.unionAll(custOnly).orderBy("src", "k")
      },
      Some("""SELECT k, 'both' AS src FROM (
             |  SELECT CAST(c_nationkey AS INT) AS k FROM customer
             |  INTERSECT SELECT CAST(s_nationkey AS INT) FROM supplier) t
             |UNION ALL
             |SELECT k, 'cust_only' AS src FROM (
             |  SELECT CAST(c_nationkey AS INT) AS k FROM customer
             |  EXCEPT SELECT CAST(s_nationkey AS INT) FROM supplier) t2
             |ORDER BY src, k""".stripMargin)),

    // ───────────────────────── pivot ─────────────────────────
    // Spark-side .pivot(); the oracle spells it as CASE aggregation
    // (engine-portable pivot semantics).
    Q("q32_pivot",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(first(lit(null)).as("drop"), count(lit(1)).as("n"))
          .select(col("l_returnflag"),
                  coalesce(col("F_n"), lit(0L)).as("f_n"),
                  coalesce(col("O_n"), lit(0L)).as("o_n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS f_n,
             |COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS o_n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ───────────────────────── null handling (na.fill / na.drop) ─────────────────────────
    Q("q33_na_handling",
      (s, dir) => {
        val nation = Tables.load(s, dir, "nation")
        val richSup = Tables.load(s, dir, "supplier")
          .where(col("s_acctbal") > 9000)
          .groupBy("s_nationkey").agg(dsum(col("s_acctbal")).as("bal"))
        val joined = nation
          .join(richSup, col("n_nationkey") === col("s_nationkey"), "left_outer")
          .select(col("n_name"), col("bal"))
        joined.na.fill(Map("bal" -> -1.0))
          .unionAll(joined.na.drop(Seq("bal"))
            .select(col("n_name"), col("bal") + 1000000))
          .orderBy("n_name", "bal")
      },
      Some(s"""WITH j AS (
              |  SELECT n_name, bal FROM nation LEFT JOIN (
              |    SELECT s_nationkey, ${oSum("s_acctbal")} AS bal
              |    FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
              |  ) s ON n_nationkey = s_nationkey)
              |SELECT n_name, COALESCE(bal, -1.0) AS bal FROM j
              |UNION ALL
              |SELECT n_name, bal + 1000000 FROM j WHERE bal IS NOT NULL
              |ORDER BY n_name, bal""".stripMargin)),

    // ───────────────────────── explode / unnest ─────────────────────────
    Q("q34_unnest",
      (s, dir) => {
        Tables.load(s, dir, "embeddings")
          .where(col("vec_id") < 10)
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), (col("pos") + 1).cast("int").as("i"),
                  col("col").cast("double").as("v"))
          .orderBy("vec_id", "i")
      },
      Some("""SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS i,
             |CAST(unnest(embedding) AS DOUBLE) AS v
             |FROM embeddings WHERE vec_id < 10 ORDER BY vec_id, i""".stripMargin)),

    // ───────────────────────── array functions ─────────────────────────
    Q("q38_array_fns",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            array(col("l_quantity"), col("l_tax"), col("l_discount")).as("arr"))
          .select(col("l_orderkey"), col("l_linenumber"),
            array_contains(col("arr"), 0.0).as("has_zero"),
            array_max(col("arr")).as("mx"),
            array_min(col("arr")).as("mn"),
            size(col("arr")).as("sz"),
            element_at(sort_array(col("arr")), 2).as("mid"),
            element_at(slice(col("arr"), 2, 2), 1).as("second"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |list_contains(arr, 0.0) AS has_zero,
             |list_max(arr) AS mx, list_min(arr) AS mn,
             |CAST(len(arr) AS INT) AS sz,
             |list_sort(arr)[2] AS mid,
             |arr[2] AS second
             |FROM (SELECT l_orderkey, l_linenumber,
             |  [l_quantity, l_tax, l_discount] AS arr
             |  FROM lineitem WHERE l_orderkey < 100) t
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ───────────────────────── datetime functions ─────────────────────────
    Q("q35_datetime_fns",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .where(col("o_orderkey") < 200)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("d"),
            quarter(col("o_orderdate")).as("q"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
            datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_y2k"),
            date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |CAST(year(o_orderdate) AS INT) AS y,
             |CAST(month(o_orderdate) AS INT) AS m,
             |CAST(day(o_orderdate) AS INT) AS d,
             |CAST(quarter(o_orderdate) AS INT) AS q,
             |strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
             |strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30
             |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin)),

    // ───────────────────────── string functions ─────────────────────────
    Q("q36_string_fns",
      (s, dir) => {
        Tables.load(s, dir, "part")
          .where(col("p_partkey") < 300)
          .select(col("p_partkey"),
            trim(col("p_name")).as("t"),
            lpad(col("p_brand"), 12, "*").as("lp"),
            rpad(col("p_brand"), 12, "*").as("rp"),
            regexp_replace(col("p_type"), "[aeiou]", "_").as("rr"),
            element_at(split(col("p_type"), " "), 1).as("first_word"),
            instr(col("p_name"), "a").as("pos_a"),
            reverse(col("p_brand")).as("rev"),
            substring(col("p_name"), 2, 5).as("mid"),
            repeat(col("p_brand"), 2).as("rep"),
            translate(col("p_brand"), "#", "-").as("tr"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, trim(p_name) AS t,
             |lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
             |regexp_replace(p_type, '[aeiou]', '_', 'g') AS rr,
             |split_part(p_type, ' ', 1) AS first_word,
             |CAST(instr(p_name, 'a') AS INT) AS pos_a,
             |reverse(p_brand) AS rev,
             |substr(p_name, 2, 5) AS mid,
             |repeat(p_brand, 2) AS rep,
             |translate(p_brand, '#', '-') AS tr
             |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin)),

    // ───────────────────────── math + conditional functions ─────────────────────────
    Q("q37_math_conditional",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            pow(col("l_linenumber"), 2).as("sq"),
            signum(col("l_extendedprice") - 30000).as("sign"),
            greatest(col("l_quantity"), col("l_tax") * 100).as("gr"),
            least(col("l_quantity"), col("l_discount") * 100).as("ls"),
            nullif(col("l_linenumber"), lit(1)).as("nn"),
            nvl(nullif(col("l_linenumber"), lit(1)), lit(-1)).as("nv"),
            expr("if(l_quantity > 25, 'hi', 'lo')").as("branch"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |CAST(power(l_linenumber, 2) AS DOUBLE) AS sq,
             |CAST(CASE WHEN l_extendedprice - 30000 > 0 THEN 1
             |  WHEN l_extendedprice - 30000 < 0 THEN -1 ELSE 0 END AS DOUBLE) AS sign,
             |greatest(l_quantity, l_tax * 100) AS gr,
             |least(l_quantity, l_discount * 100) AS ls,
             |nullif(l_linenumber, 1) AS nn,
             |COALESCE(nullif(l_linenumber, 1), -1) AS nv,
             |CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END AS branch
             |FROM lineitem WHERE l_orderkey < 100
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ───────────────────────── JSON extraction ─────────────────────────
    // Semi-structured metadata parsing — the `props` column is a JSON
    // string, the universal shape of web-crawl/event metadata. The
    // extraction stays a codegen'd scan expression (get_json_object),
    // so at 100 TB this is a mapper, not a parse-then-shuffle.
    Q("q39_json_extract",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"),
            (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
             |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             |MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
             |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             |  / COUNT(*) AS avg_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ───────────────────────── exact percentiles ─────────────────────────
    // percentile_cont at quarter points: with integer-valued inputs
    // and p ∈ {.25, .5, .75}, the linear interpolation
    // lo + (hi−lo)·frac is exact in binary (frac is a dyadic
    // rational), so Spark and DuckDB agree bit-for-bit with no
    // rounding shim. Exact percentiles sort within each group — at
    // 100 TB prefer approx_percentile (mergeable sketch, one pass,
    // bounded error; accuracy spec'd in SketchAggSpec).
    Q("q40_percentiles",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(percentile(col("l_quantity"), lit(0.25)).as("q25"),
            median(col("l_quantity")).as("q50"),
            percentile(col("l_quantity"), lit(0.75)).as("q75"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |quantile_cont(l_quantity, 0.25) AS q25,
             |quantile_cont(l_quantity, 0.50) AS q50,
             |quantile_cont(l_quantity, 0.75) AS q75,
             |COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ───────────────────────── distribution moments ─────────────────────────
    // stddev/correlation computed the order-independent way: exact
    // decimal power sums (n, Σx, Σx², Σy, Σy², Σxy) in the aggregate —
    // partial aggregation can combine them in any order — then ONE
    // fixed sequence of double ops derives mean/var/std/corr.
    // Spark's native stddev/corr stream IEEE doubles, so their low
    // bits depend on partition layout; these don't, which is what
    // makes a 100 TB statistic reproducible run-to-run (and lets the
    // DuckDB oracle match the hash exactly).
    Q("q41_stats_moments",
      (s, dir) => {
        val x = dec(col("l_quantity"))
        val y = dec(col("l_extendedprice"))
        val sums = Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(x).cast("double").as("sx"),
            sum(x * x).cast("double").as("sxx"),
            sum(y).cast("double").as("sy"),
            sum(y * y).cast("double").as("syy"),
            sum(x * y).cast("double").as("sxy"))
        val n = col("n"); val sx = col("sx"); val sxx = col("sxx")
        val sy = col("sy"); val syy = col("syy"); val sxy = col("sxy")
        // The power SUMS are exact; the decimal→double CAST of the
        // big sums is not engine-identical (Spark's BigDecimal path
        // rounds once; DuckDB's int128 path can land 1 ulp away once
        // the scaled integer exceeds 2^53 — observed at sf0.001).
        // The DERIVED stats therefore round at a granularity chosen
        // per column magnitude so a 1-ulp input wobble cannot flip
        // the rounded output (ulp/granularity < 1e-5): 4 decimals
        // for the ~1e1..1e5 means/stds, 6 for the ~1e-2 correlation.
        def r4(c: Column): Column = floor(c * lit(1e4) + lit(0.5)) / lit(1e4)
        def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
        sums.select(col("l_returnflag"),
            r4(sx / n).as("mean_qty"),
            r4(sqrt((sxx - sx * sx / n) / (n - 1))).as("std_qty"),
            r4(sy / n).as("mean_price"),
            r4(sqrt((syy - sy * sy / n) / (n - 1))).as("std_price"),
            r6((sxy - sx * sy / n) /
              sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))).as("corr_qty_price"))
          .orderBy("l_returnflag")
      },
      Some("""WITH sums AS (
             |  SELECT l_returnflag,
             |    CAST(COUNT(*) AS DOUBLE) AS n,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
             |           * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |           * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
             |           * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
             |  FROM lineitem GROUP BY l_returnflag
             |)
             |SELECT l_returnflag,
             |  FLOOR((sx / n) * 10000 + 0.5) / 10000 AS mean_qty,
             |  FLOOR(sqrt((sxx - sx * sx / n) / (n - 1)) * 10000 + 0.5) / 10000
             |    AS std_qty,
             |  FLOOR((sy / n) * 10000 + 0.5) / 10000 AS mean_price,
             |  FLOOR(sqrt((syy - sy * sy / n) / (n - 1)) * 10000 + 0.5) / 10000
             |    AS std_price,
             |  FLOOR(((sxy - sx * sy / n)
             |    / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)))
             |    * 1000000 + 0.5) / 1000000 AS corr_qty_price
             |FROM sums ORDER BY l_returnflag""".stripMargin)),

    // ───────────────────────── cube ─────────────────────────
    // CUBE over (returnflag, linestatus) with grouping_id() so every
    // subtotal level is distinguishable even if a grouping column were
    // nullable. reference: logical_plan.rs GroupingSet::Cube surface.
    Q("q42_cube",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
            // grouping_id is already bigint; a Cast here would also
            // fall outside SqlGen's grouping-sets select-list contract
            grouping_id(col("l_returnflag"), col("l_linestatus")).as("gid"))
          .orderBy(col("gid"),
            asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              |${oSum("l_quantity")} AS qty,
              |CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
              |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // ───────────────────────── bloom-pruned join ─────────────────────────
    // Runtime-filter pattern: a selective orders subset builds a bloom
    // bitset; lineitem (the 100 TB side) is pruned by it BEFORE the
    // join's exchange, so the shuffle carries matches + ~1% false
    // positives instead of the full fact table. The exact equi-join
    // absorbs the false positives, which is why a plain-join oracle
    // certifies the whole mechanism. reference has no runtime filters;
    // this is the scale-path addition (SURVEY §4).
    Q("q43_bloom_join",
      (s, dir) => {
        val urgent = Tables.load(s, dir, "orders")
          .where(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 150000)
        // sizing estimate only affects fpp, never correctness; a real
        // caller passes a count estimate (or build.count())
        graft.operators.BloomPrune
          .pruneJoin(Tables.load(s, dir, "lineitem"), urgent,
            "l_orderkey", "o_orderkey", expectedBuildRows = 10000)
          .groupBy(year(col("o_orderdate")).as("y"))
          .agg(count(lit(1)).as("n_items"),
            drevSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
          .orderBy("y")
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS y, COUNT(*) AS n_items,
              |${oRevSum("l_extendedprice", "l_discount")} AS revenue
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
              |GROUP BY 1 ORDER BY y""".stripMargin)),

    // ───────────────────────── full outer join ─────────────────────────
    // Both-sided null production: high-balance customers FULL JOIN
    // per-customer big-order rollups; the coalesced key is total, so
    // the ORDER BY needs no null spelling. Completes the join-type
    // matrix (inner/left/semi/anti are q15-q18).
    Q("q44_full_outer",
      (s, dir) => {
        val rich = Tables.load(s, dir, "customer")
          .where(col("c_acctbal") > 9000)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val big = Tables.load(s, dir, "orders")
          .where(col("o_totalprice") > 250000)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_big_orders"),
            dsum(col("o_totalprice")).as("big_total"))
        rich.join(big, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_name"), col("c_acctbal"),
            col("n_big_orders"), col("big_total"))
          .orderBy("custkey")
      },
      Some(s"""WITH rich AS (
              |  SELECT c_custkey, c_name, c_acctbal FROM customer
              |  WHERE c_acctbal > 9000
              |), big AS (
              |  SELECT o_custkey, COUNT(*) AS n_big_orders,
              |    ${oSum("o_totalprice")} AS big_total
              |  FROM orders WHERE o_totalprice > 250000 GROUP BY 1
              |)
              |SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name,
              |  c_acctbal, n_big_orders, big_total
              |FROM rich FULL JOIN big ON c_custkey = o_custkey
              |ORDER BY custkey""".stripMargin)),

    // ───────────────────────── salted aggregation ─────────────────────────
    // The skew-mitigation path under the driver oracle: two-phase
    // salted aggregation (content-hash salt on the lineitem PK) must
    // be bit-identical to the direct GROUP BY — sums ride the decimal
    // contract so the extra combine step cannot drift. The salt/bucket
    // machinery is invisible to the oracle, which is the point: only
    // the shuffle shape changes.
    Q("q45_salted_agg",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .withColumn("qty_dec", dec(col("l_quantity")))
        graft.operators.Skew.saltedAggregate(li,
            keys = Seq("l_returnflag"),
            aggs = Map("sum_qty" -> ("qty_dec", "sum"),
              "n" -> ("l_quantity", "count")),
            saltBuckets = 16,
            saltBy = Seq("l_orderkey", "l_linenumber"))
          .select(col("l_returnflag"),
            col("sum_qty").cast("double").as("sum_qty"), col("n"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, ${oSum("l_quantity")} AS sum_qty,
              |COUNT(l_quantity) AS n
              |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ───────────────────────── funnel analysis ─────────────────────────
    // Strictly-ordered view→click→purchase funnel. The Spark plan
    // chains three min-over-user windows on ONE user_id exchange
    // (EventsAnalytics.funnelTimes); the oracle replays the identical
    // chained windows. events.ts is floored to µs identically by both
    // engines (Tables.events / DuckDB TIMESTAMP cast).
    Q("e01_funnel",
      (s, dir) => {
        graft.operators.EventsAnalytics.funnelCounts(
          Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
             |  FROM events
             |), w1 AS (
             |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
             |    OVER (PARTITION BY user_id) AS t1 FROM e
             |), w2 AS (
             |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1
             |    THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM w1
             |), w3 AS (
             |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
             |    THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM w2
             |)
             |SELECT
             |  COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_step_1,
             |  COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_step_2,
             |  COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_step_3
             |FROM w3""".stripMargin)),

    // ───────────────────────── cohort retention ─────────────────────────
    Q("e02_retention",
      (s, dir) => {
        graft.operators.EventsAnalytics.retention(
            Tables.events(s, dir), "user_id", "ts")
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH e AS (
             |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
             |  FROM events
             |), c AS (
             |  SELECT *, MIN(d) OVER (PARTITION BY user_id) AS cohort FROM e
             |), x AS (
             |  SELECT DISTINCT cohort, datediff('day', cohort, d) AS day_offset,
             |    user_id
             |  FROM c
             |)
             |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
             |  CAST(day_offset AS INT) AS day_offset, COUNT(*) AS n_users
             |FROM x GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin)),

    // ───────────────────────── grouping sets ─────────────────────────
    // Explicit GROUPING SETS (the general form q23 ROLLUP / q42 CUBE
    // specialize): detail, one-dim subtotal, and grand total — but NOT
    // the (linestatus) subtotal, which only GROUPING SETS can express.
    // Via spark.sql: the Dataset API has no grouping-sets entry point.
    Q("q46_grouping_sets",
      (s, dir) => {
        Tables.register(s, dir)
        s.sql(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                 |${oSum("l_quantity")} AS qty,
                 |grouping_id(l_returnflag, l_linestatus) AS gid
                 |FROM lineitem
                 |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                 |                        (l_returnflag), ())
                 |ORDER BY gid, l_returnflag NULLS FIRST,
                 |  l_linestatus NULLS FIRST""".stripMargin)
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              |${oSum("l_quantity")} AS qty,
              |CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
              |                        (l_returnflag), ())
              |ORDER BY gid, l_returnflag NULLS FIRST,
              |  l_linestatus NULLS FIRST""".stripMargin)),

    // ───────────────────────── lateral join ─────────────────────────
    // Correlated subquery in FROM: per-customer aggregate computed by
    // a LATERAL body (the select.rs:460-988 aspirational nested-
    // subquery surface in its most general form). An aggregate
    // lateral always yields one row, so the comma (inner) form keeps
    // every outer row. Catalyst decorrelates this into a join — no
    // per-row subquery execution at scale.
    Q("q48_lateral_join",
      (s, dir) => {
        Tables.register(s, dir)
        s.sql("""SELECT c_custkey, c_name, t.max_price, t.n_big
                |FROM customer,
                |LATERAL (SELECT max(o_totalprice) AS max_price,
                |                count(*) AS n_big
                |         FROM orders
                |         WHERE o_custkey = c_custkey
                |           AND o_totalprice > 200000) t
                |WHERE c_acctbal > 9500
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name, t.max_price, t.n_big
             |FROM customer,
             |LATERAL (SELECT max(o_totalprice) AS max_price,
             |                count(*) AS n_big
             |         FROM orders
             |         WHERE o_custkey = c_custkey
             |           AND o_totalprice > 200000) t
             |WHERE c_acctbal > 9500
             |ORDER BY c_custkey""".stripMargin)),

    // ───────────────────────── higher-order array functions ─────────────────────────
    // transform / filter / aggregate / exists over a per-order
    // quantity array — the lambda-HOF surface (expr.rs lambda exprs)
    // as one oracle-gated query. All-integer lambdas so both engines
    // compute identical values; DuckDB's list_sum of an empty list is
    // NULL where Spark's aggregate seeds 0 — the oracle coalesces.
    Q("q47_hof_array",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") < 2000)
          .groupBy("l_orderkey")
          .agg(sort_array(collect_list(col("l_quantity").cast("int")))
            .as("qs"))
          .select(col("l_orderkey"),
            size(col("qs")).as("n"),
            aggregate(filter(col("qs"), q => q % 2 === 0),
              lit(0L), (acc, x) => acc + x).as("even_sum"),
            aggregate(transform(col("qs"), q => q * q),
              lit(0L), (acc, x) => acc + x).as("sum_sq"),
            exists(col("qs"), q => q > 45).cast("int").as("has_gt45"))
          .orderBy("l_orderkey")
      },
      Some("""WITH a AS (
             |  SELECT l_orderkey,
             |    list_sort(list(CAST(l_quantity AS INT))) AS qs
             |  FROM lineitem WHERE l_orderkey < 2000 GROUP BY 1
             |)
             |SELECT l_orderkey, CAST(len(qs) AS INT) AS n,
             |  CAST(COALESCE(list_sum(list_filter(qs, x -> x % 2 = 0)), 0)
             |    AS BIGINT) AS even_sum,
             |  CAST(COALESCE(list_sum(list_transform(qs, x -> x * x)), 0)
             |    AS BIGINT) AS sum_sq,
             |  CAST(CASE WHEN len(list_filter(qs, x -> x > 45)) > 0
             |    THEN 1 ELSE 0 END AS INT) AS has_gt45
             |FROM a ORDER BY l_orderkey""".stripMargin)),

    // ───────────────────────── time-series gap fill ─────────────────────────
    // Per-user daily resample: every calendar day in the user's active
    // span, decimal-exact daily value sums, zero on gap days. The day
    // domain explodes per user (span-bounded, no global calendar
    // cross join); oracle replays with generate_series.
    Q("e03_gap_fill",
      (s, dir) => {
        graft.operators.EventsAnalytics.resampleDaily(
            Tables.events(s, dir), "user_id", "ts", "value")
          .orderBy("user_id", "day")
      },
      Some("""WITH e AS (
             |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             |    CAST(value AS DECIMAL(18,2)) AS v
             |  FROM events
             |), daily AS (
             |  SELECT user_id, d, SUM(v) AS sv FROM e GROUP BY 1, 2
             |), dom AS (
             |  SELECT user_id, CAST(unnest(generate_series(
             |    CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
             |    INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM (SELECT user_id, MIN(d) AS mn, MAX(d) AS mx
             |        FROM daily GROUP BY 1) t
             |)
             |SELECT dom.user_id, strftime(dom.day, '%Y-%m-%d') AS day,
             |  CAST(COALESCE(daily.sv, 0) AS DOUBLE) AS total_value
             |FROM dom LEFT JOIN daily
             |  ON dom.user_id = daily.user_id AND dom.day = daily.d
             |ORDER BY dom.user_id, day""".stripMargin)),

    // ───────────────────────── transition matrix ─────────────────────────
    // First-order Markov transitions between consecutive per-user
    // event types: one user-key exchange for the lead window (the
    // funnel partitioning), a |types|²-sized aggregate, broadcast row
    // totals. event_id totalizes the order under equal timestamps —
    // without it lead() on ties is nondeterministic in BOTH engines.
    // p is one long/long IEEE division: bit-identical, no rounding.
    Q("e04_transitions",
      (s, dir) => {
        graft.operators.EventsAnalytics.transitionMatrix(
            Tables.events(s, dir), "user_id", "ts", "event_type",
            tieCol = "event_id")
          .orderBy("from_type", "to_type")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(ts AS TIMESTAMP) AS ts
             |  FROM events
             |), nx AS (
             |  SELECT event_type AS from_type,
             |    LEAD(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM e
             |), c AS (
             |  SELECT from_type, to_type, COUNT(*) AS n
             |  FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2
             |), t AS (
             |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS total_from
             |  FROM c GROUP BY 1
             |)
             |SELECT c.from_type, c.to_type, n, total_from,
             |  CAST(n AS DOUBLE) / CAST(total_from AS DOUBLE) AS p
             |FROM c JOIN t USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // ───────────────────────── conversion latency ─────────────────────────
    // Per-cohort view→purchase latency: the funnel's strictly-ordered
    // step times reduced to one row per converted user, then a
    // cohort-day rollup. Lag stays in exact integer MICROSECONDS
    // through the sum; the average is a fixed double-division chain
    // (sum/n then /1e6, both IEEE-exact cross-engine).
    Q("e05_conversion_lag",
      (s, dir) => {
        val timed = graft.operators.EventsAnalytics.funnelTimes(
          Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "purchase"))
        timed.groupBy("user_id")
          .agg(min("step_1").as("t_view"), min("step_2").as("t_purchase"))
          .where(col("t_purchase").isNotNull)
          .select(col("user_id"),
            date_format(col("t_view"), "yyyy-MM-dd").as("cohort_day"),
            (unix_micros(col("t_purchase")) - unix_micros(col("t_view")))
              .as("lag_us"))
          .groupBy("cohort_day")
          .agg(count(lit(1)).as("n_converted"),
            sum("lag_us").as("total_lag_us"))
          .withColumn("avg_lag_s",
            col("total_lag_us").cast("double") / col("n_converted") /
              lit(1e6))
          .orderBy("cohort_day")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
             |  FROM events
             |), w1 AS (
             |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
             |    OVER (PARTITION BY user_id) AS t1 FROM e
             |), w2 AS (
             |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t1
             |    THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM w1
             |), u AS (
             |  SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2
             |  FROM w2 GROUP BY user_id
             |), c AS (
             |  SELECT strftime(CAST(t1 AS DATE), '%Y-%m-%d') AS cohort_day,
             |    epoch_us(t2) - epoch_us(t1) AS lag_us
             |  FROM u WHERE t2 IS NOT NULL
             |)
             |SELECT cohort_day, COUNT(*) AS n_converted,
             |  CAST(SUM(lag_us) AS BIGINT) AS total_lag_us,
             |  (CAST(SUM(lag_us) AS DOUBLE) / COUNT(*)) / 1000000.0
             |    AS avg_lag_s
             |FROM c GROUP BY cohort_day ORDER BY cohort_day""".stripMargin)),

    // ───────────────────────── top event paths ─────────────────────────
    // Most common per-user-day event sequences (first 8 events,
    // '>'-joined) — the funnel-DISCOVERY step before e01 verifies one.
    // collect_list has no order contract: the struct array sorts after
    // collection on (ts, event_id, type), a total order.
    Q("e06_top_paths",
      (s, dir) => {
        graft.operators.EventsAnalytics.topPaths(
          Tables.events(s, dir), "user_id", "ts", "event_type",
          tieCol = "event_id", maxLen = 8, k = 25)
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(ts AS TIMESTAMP) AS ts,
             |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
             |  FROM events
             |), p AS (
             |  SELECT array_to_string(
             |    (list(event_type ORDER BY ts, event_id))[1:8], '>') AS path
             |  FROM e GROUP BY user_id, day
             |)
             |SELECT path, COUNT(*) AS n FROM p
             |GROUP BY path ORDER BY n DESC, path ASC LIMIT 25""".stripMargin)),

    // ───────────────────────── rolling active users ─────────────────────────
    // DAU + trailing-7-day distinct actives for every calendar day in
    // the span (gap days emit 0s). The trailing window is a fixed ×7
    // forward explode of the (user, day) distinct — never a range
    // join — so the report is two aggregate exchanges at any corpus
    // size. Oracle computes the same window as a calendar×daily range
    // join (exact COUNT(DISTINCT) both sides); days emit as strings
    // (the e03 cross-engine date stance).
    Q("e07_rolling_active",
      (s, dir) => {
        graft.operators.EventsAnalytics.rollingActive(
            Tables.events(s, dir), "user_id", "ts", windowDays = 7)
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT DISTINCT user_id AS u,
             |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
             |  FROM events
             |), b AS (
             |  SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily
             |), cal AS (
             |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
             |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS cd
             |  FROM b
             |), dau AS (
             |  SELECT d, COUNT(DISTINCT u) AS dau FROM daily GROUP BY 1
             |), roll AS (
             |  SELECT cal.cd AS td, COUNT(DISTINCT u) AS roll
             |  FROM cal JOIN daily ON daily.d BETWEEN cal.cd - 6 AND cal.cd
             |  GROUP BY 1
             |)
             |SELECT strftime(cd, '%Y-%m-%d') AS day,
             |  COALESCE(dau.dau, 0) AS dau,
             |  COALESCE(roll.roll, 0) AS rolling_users
             |FROM cal LEFT JOIN dau ON dau.d = cal.cd
             |LEFT JOIN roll ON roll.td = cal.cd
             |ORDER BY day""".stripMargin)),

    // ───────────────────────── decayed engagement ─────────────────────────
    // Recency-weighted per-user activity: each active day's value sum
    // weighted by 2^-(age/2 halvings). Exactness chain (t29 stance):
    // decimal daily sums, power-of-two weights (one deterministic IEEE
    // multiply per term), micro-unit long quantization (order-free
    // exact sum), one shared final division.
    Q("e08_decayed_engagement",
      (s, dir) => {
        graft.operators.EventsAnalytics.decayedEngagement(
            Tables.events(s, dir), "user_id", "ts", "value",
            halvingDays = 2)
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             |    CAST(value AS DECIMAL(18,2)) AS v
             |  FROM events
             |), daily AS (
             |  SELECT user_id, d, CAST(SUM(v) AS DOUBLE) AS dv
             |  FROM e GROUP BY 1, 2
             |), mx AS (
             |  SELECT MAX(d) AS dmax FROM daily
             |), t AS (
             |  SELECT user_id,
             |    FLOOR((dv * (1.0 / power(2.0, (dmax - d) // 2)))
             |      * 1000000 + 0.5) AS m
             |  FROM daily, mx
             |)
             |SELECT user_id,
             |  CAST(SUM(m) AS DOUBLE) / 1000000 AS score
             |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Rolling z-score spike detection on daily event volumes
    // (round 16): each day's count vs the mean/stddev of the 7
    // PRECEDING days. Exactness chain: window sums Σx/Σx² ride as
    // longs (order-free), z is one fixed IEEE expression with sample
    // variance via the integer numerator (n·Σx² − (Σx)²) — no
    // Welford-vs-textbook drift between engines; partial baselines
    // and zero variance emit null, surfaced not guessed.
    Q("e09_anomaly",
      (s, dir) => {
        graft.operators.EventsAnalytics.dailyAnomalies(
            Tables.events(s, dir), "event_type", "ts",
            window = 7, zThreshold = 2.0)
          .select(col("event_type"), col("d"), col("n"),
            (floor(col("z") * lit(1e6) + lit(0.5)) / lit(1e6)).as("z"),
            col("is_anomaly"))
          .orderBy("event_type", "d")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             |    COUNT(*) AS n
             |  FROM events GROUP BY 1, 2
             |), wnd AS (
             |  SELECT event_type, d, n,
             |    SUM(n) OVER w AS sx,
             |    SUM(n * n) OVER w AS sxx,
             |    COUNT(*) OVER w AS cnt
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY d
             |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
             |), scored AS (
             |  SELECT event_type, d, n,
             |    CASE WHEN cnt = 7 AND 7 * sxx - sx * sx > 0 THEN
             |      (CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(7 AS DOUBLE))
             |      / sqrt(CAST(7 * sxx - sx * sx AS DOUBLE)
             |             / CAST(7 * 6 AS DOUBLE))
             |    END AS z
             |  FROM wnd
             |)
             |SELECT event_type, d, n,
             |  FLOOR(z * 1000000 + 0.5) / 1000000.0 AS z,
             |  COALESCE(abs(z) >= 2.0, FALSE) AS is_anomaly
             |FROM scored ORDER BY event_type, d""".stripMargin)),

    // ───────────────────────── plan → SQL → results gate ─────────────────────────
    // The reference's headline capability exercised end-to-end: build a
    // DataFrame plan, regenerate SQL from its Catalyst plan, and return
    // the result of executing the *generated* text. The DuckDB oracle
    // then certifies that plan → SQL preserved semantics.
    // reference: datafusion-sqlgen/src/logical_plan.rs:10-206
    Q("g01_sqlgen_roundtrip",
      (s, dir) => {
        graft.Tables.register(s, dir)
        val df = Tables.load(s, dir, "orders")
          .join(Tables.load(s, dir, "customer"),
                col("o_custkey") === col("c_custkey"))
          .where(col("o_totalprice") > 150000)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("c_mktsegment")
        s.sql(graft.sqlgen.SqlGen.toSql(df))
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |WHERE o_totalprice > 150000
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )
}
