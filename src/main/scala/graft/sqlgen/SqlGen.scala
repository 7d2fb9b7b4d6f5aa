package graft.sqlgen

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BitwiseAnd, Cast, CreateNamedStruct, Exists, Expression, GetStructField, InSubquery, IntegerLiteral, LambdaFunction, LeafExpression, Literal, NamedLambdaVariable, OuterReference, ScalarSubquery, ShiftRight, SortOrder, Unevaluable, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First, Last}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DataType

/** Catalyst `LogicalPlan → SQL` generation — the Spark-native
  * re-expression of the reference's headline capability
  * (reference: datafusion-sqlgen/src/logical_plan.rs:10-206
  * `plan_to_query`, which folds DataFusion plan nodes back into a
  * sqlparser AST, and sqlgenerator/src/lib.rs:14-202 which renders
  * the AST to SQL text).
  *
  * Where the reference folds nodes into ONE flat SELECT and errors on
  * anything that doesn't fit ("Cannot perform projection on …"), this
  * generator nests subqueries, so arbitrary operator stacking —
  * aggregate-over-join-over-filter, sort-over-limit-over-sort —
  * always round-trips. Expression rendering delegates to Catalyst's
  * own `Expression.sql` (the analogue of the reference's
  * `logical_expr_to_sql_expr`, expr.rs:15-108), which guarantees the
  * printed form re-parses in Spark SQL.
  *
  * Contract: `spark.sql(SqlGen.toSql(df))` is semantically equal to
  * `df`, provided the base relations are registered as temp views
  * under their table names (graft.Tables.register) and column names
  * are unambiguous across join inputs (alias before joining
  * otherwise — same restriction the reference has, since it prints
  * bare identifiers too, expr.rs:17-32).
  */
object SqlGen {

  def toSql(df: DataFrame): String = toSql(df.queryExecution.analyzed)

  def toSql(plan: LogicalPlan): String = new Gen().gen(plan)

  /** Register-time relation → name map. The reference names every
    * relation when it is registered (select.rs:46-145:
    * `register_parquet` / `register_csv` / MemTable); parquet-path
    * recovery alone cannot name a CSV/JSON or in-memory relation, so
    * mixing sources used to emit SQL referencing `_gN` tables that
    * don't exist. `register(name, df)` fixes the name for every leaf
    * relation of `df`, matching the reference's contract.
    */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[AnyRef, String]()

  /** A key identifying a leaf relation independent of exprIds, so a
    * re-read of the same source (same format + paths, or same local
    * data) resolves to the registered name.
    */
  private def leafKey(p: LogicalPlan): Option[AnyRef] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some(("file", fs.fileFormat.getClass.getName,
          fs.location.rootPaths.map(_.toString).toList))
      case other => Some(("rel", Integer.valueOf(System.identityHashCode(other))))
    }
    case l: LocalRelation =>
      Some(("local", l.output.map(a => (a.name, a.dataType)).toList, l.data))
    case _ => None
  }

  /** Associate every leaf relation of `df` with `name` (and create the
    * matching temp view is the caller's job — `Tables.register` does
    * both for the test corpus).
    */
  def register(name: String, df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves()
      .foreach(l => leafKey(l).foreach(k => registry.put(k, name)))

  private def registeredName(p: LogicalPlan): Option[String] =
    leafKey(p).flatMap(k => Option(registry.get(k)))

  /** Iterative-plan provenance (round 9): a driver-side fixpoint
    * operator (duplicateClusters' min-label loop) returns a plan
    * whose leaf is a LogicalRDD barrier — no structural SQL rendering
    * exists for it. But the OPERATOR knows its own fixpoint: it
    * registers an equivalent `WITH RECURSIVE` text here, keyed by
    * (applicationId, rdd id) — the rdd reference is stable across
    * analyzer copies where node identity is not, and the application
    * id disambiguates recycled rdd ids across SparkContext restarts
    * in one JVM (sbt suites, notebook restarts), so a stale entry
    * can never splice another context's SQL. The generator splices
    * the text wherever the barrier appears, closing the last
    * plan→SQL carve-outs. The SQL is registered as a MEMOIZED THUNK:
    * rendering (a full plan walk of the pairs frame) happens only if
    * a toSql call actually reaches the barrier, so execution-only
    * callers pay nothing, and a render failure surfaces AT toSql
    * with a clear message instead of being swallowed at operator
    * time. Bounded: an access-order LRU capped at 512 entries evicts
    * oldest-first (each loop execution registers one barrier;
    * entries are ~KB once rendered).
    */
  private val iterativeSqlById: java.util.Map[(String, Int), () => String] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Int), () => String](
          64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Int), () => String]): Boolean =
          size() > 512
      })

  /** Associate every LogicalRDD leaf of `df` with `sql` — a thunk
    * producing the text a re-execution can run in place of the
    * barrier. The SQL's output column names must match the leaf's
    * output exactly.
    */
  def registerIterative(df: DataFrame, sql: () => String): Unit = {
    val appId = df.sparkSession.sparkContext.applicationId
    // Memoize AND release: the caller's thunk closes over the pairs
    // DataFrame (a full analyzed plan + session reference); once the
    // text is rendered the thunk reference is nulled so the registry
    // holds only the ~KB string, never up to 512 retained plans in a
    // long-lived session.
    val memo: () => String = new (() => String) {
      @volatile private var thunk: () => String = sql
      @volatile private var rendered: String = null
      def apply(): String = {
        if (rendered == null) synchronized {
          if (rendered == null) { rendered = thunk(); thunk = null }
        }
        rendered
      }
    }
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lrdd: org.apache.spark.sql.execution.LogicalRDD =>
        iterativeSqlById.put((appId, lrdd.rdd.id), memo)
      case _ => ()
    }
  }

  private def iterativeSqlOf(p: LogicalPlan): Option[() => String] =
    p match {
      case lrdd: org.apache.spark.sql.execution.LogicalRDD =>
        org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
          .flatMap(s => Option(iterativeSqlById.get(
            (s.sparkContext.applicationId, lrdd.rdd.id))))
      case _ => None
    }

  /** Carrier for SQL text produced by our own renderer, spliced into a
    * subtree before delegating to Catalyst's `Expression.sql` — lets
    * the generic printer handle a node whose *children* need custom
    * rendering (nested named_structs, lambda variables).
    */
  private case class RawSql(text: String, dataType: DataType,
                            nullable: Boolean)
      extends LeafExpression with Unevaluable {
    override def sql: String = text
    override def toString: String = text
  }

  private final class Gen {
    private val n = new AtomicInteger(0)
    private def fresh(): String = s"_g${n.incrementAndGet()}"

    // While printing a grouping-sets Aggregate: the exprId of the
    // internal spark_grouping_id attribute and the original grouping
    // expressions in bit order (col i ↔ bit k-1-i), so references to
    // the internal attribute print as GROUPING_ID()/GROUPING(col).
    private var gidId: Option[org.apache.spark.sql.catalyst.expressions.ExprId] = None
    private var gidCols: Seq[Expression] = Nil

    // CTE definition id → name, populated when a WithCTE node is
    // entered so CTERelationRef leaves print as the CTE's name.
    private val cteNames = scala.collection.mutable.Map[Long, String]()

    // While printing a join's condition and (for Project-over-Join)
    // its select list: maps each side's output exprIds to that side's
    // FROM-clause alias, so references stay unambiguous when both
    // sides expose the same column name (self-joins, USING joins).
    // Scoped strictly to the join being printed: the side subqueries
    // are rendered BEFORE the map is set, so their internals never see
    // the outer aliases.
    private var joinQuals: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String] = Map.empty

    /** Expression → SQL. Catalyst's `Expression.sql` is authoritative
      * for almost everything; the exceptions are struct construction
      * (its `.sql` prints `struct(v1, v2)` and loses field names) and
      * field access above it, which we print as
      * `named_struct('f', v, …).f` so the text re-parses losslessly.
      */
    private def exprSql(e: Expression): String = e match {
      case a: Alias => s"${exprSql(a.child)} AS `${a.name}`"
      // grouping(col): the analyzer lowers it to a bit-test on the
      // internal grouping id — print it back as the SQL function
      case Cast(BitwiseAnd(ShiftRight(a: AttributeReference, Literal(sh, _)),
                           Literal(one, _)), _, _, _)
          if gidId.contains(a.exprId) && one == 1 =>
        val idx = gidCols.size - 1 - sh.toString.toInt
        s"GROUPING(${exprSql(gidCols(idx))})"
      // grouping_id() projected bare or aliased
      case a: AttributeReference if gidId.contains(a.exprId) => "GROUPING_ID()"
      case g: GetStructField => s"${exprSql(g.child)}.`${g.extractFieldName}`"
      case c: CreateNamedStruct =>
        s"named_struct(${c.children.map(exprSql).mkString(", ")})"
      // Catalyst prints lambdas as `lambdafunction(body, vars…)`,
      // which doesn't re-parse; print arrow syntax. Variable names get
      // an exprId suffix so shadowed names in nested lambdas stay
      // unambiguous.
      case lf: LambdaFunction =>
        def vname(v: NamedLambdaVariable) = s"${v.name}_${v.exprId.id}"
        val args = lf.arguments.map {
          case v: NamedLambdaVariable => vname(v)
          case other => exprSql(other)
        }
        // Intercept nested lambdas BEFORE substituting variables: a
        // blanket NamedLambdaVariable substitution would also rewrite
        // an inner lambda's *argument list* (typed Seq[NamedExpression])
        // into RawSql and crash the rebuild. Rendering the inner lambda
        // recursively is safe — vname is deterministic (name_exprId),
        // so outer variables captured in the inner body print the same
        // text as in the outer argument list.
        val body = exprSql(lf.function.transform {
          case inner: LambdaFunction =>
            RawSql(exprSql(inner), inner.dataType, inner.nullable)
          case v: NamedLambdaVariable =>
            RawSql(vname(v), v.dataType, v.nullable)
        })
        // grammar quirk: parens require ≥2 args; single-arg is bare
        if (args.size == 1) s"${args.head} -> $body"
        else s"(${args.mkString(", ")}) -> $body"
      // `.sql` drops First/Last's ignoreNulls flag inside windows,
      // silently changing semantics on re-parse — print the two-arg
      // SQL form.
      case we: WindowExpression =>
        val fn = we.windowFunction match {
          case ae: AggregateExpression => ae.aggregateFunction match {
            case l: Last if l.ignoreNulls =>
              s"last(${exprSql(l.child)}, true)"
            case f: First if f.ignoreNulls =>
              s"first(${exprSql(f.child)}, true)"
            case _ => genericSql(ae)
          }
          case other => genericSql(other)
        }
        s"$fn OVER ${genericSql(we.windowSpec)}"
      // Subquery *expressions* — the reference's nested-subquery
      // surface (select.rs:752-988): a scalar subquery, EXISTS, or
      // IN (subquery) inside a WHERE/SELECT. Catalyst's `.sql` prints
      // `scalar-subquery#N []`, which doesn't re-parse — render the
      // inner plan recursively through `gen` instead. Correlated
      // references appear as OuterReference(attr) and print as the
      // bare outer column name (same bare-identifier contract as
      // everything else here: names must be unambiguous).
      case s: ScalarSubquery => s"(${subquerySql(s.plan)})"
      case ex: Exists => s"EXISTS (${subquerySql(ex.plan)})"
      case in: InSubquery =>
        val vals = in.values.map(exprSql)
        val v = if (vals.size == 1) vals.head
                else vals.mkString("(", ", ", ")")
        s"$v IN (${subquerySql(in.query.plan)})"
      case o: OuterReference => exprSql(o.e)
      // na.drop's predicate has no SQL function name — spell it out
      case n: org.apache.spark.sql.catalyst.expressions.AtLeastNNonNulls =>
        val indicators = n.children
          .map(c => s"(CASE WHEN ${exprSql(c)} IS NOT NULL THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"(($indicators) >= ${n.n})"
      case _ => genericSql(e)
    }

    /** Delegate to Catalyst's `Expression.sql` after splicing in the
      * renderings `.sql` would get wrong: qualifiers stripped (they
      * dangle once the child is wrapped in a generated subquery alias
      * — same bare-identifier contract as the reference,
      * expr.rs:17-32), nested named_structs and lambdas re-rendered
      * through [[exprSql]].
      */
    /** Render a subquery-expression plan, first refusing the one case
      * bare-identifier printing gets silently WRONG: a correlated
      * outer column whose name is also exposed inside the subquery
      * (e.g. a subquery correlated against the same table it scans).
      * The printed bare name would re-resolve to the inner relation —
      * `WHERE (o_custkey = o_custkey)`, a tautology — so fail loudly
      * and tell the user to alias, same contract as the reference's
      * bare-identifier printing (expr.rs:17-32).
      */
    private def subquerySql(p: LogicalPlan): String = {
      val outerNames = p.collect { case n =>
        n.expressions.flatMap(_.collect { case o: OuterReference => o.name })
      }.flatten.toSet
      if (outerNames.nonEmpty) {
        val innerNames =
          p.collect { case n => n.output.map(_.name) }.flatten.toSet
        val shadowed = outerNames.intersect(innerNames)
        require(shadowed.isEmpty,
          s"SqlGen: correlated column(s) ${shadowed.mkString(", ")} are " +
            "shadowed by the subquery's own relations — the bare name " +
            "would re-resolve inside the subquery. Alias the outer or " +
            "inner column before generating SQL.")
      }
      gen(p)
    }

    private def genericSql(e: Expression): String =
      e.transform {
        case a: AttributeReference =>
          joinQuals.get(a.exprId) match {
            case Some(q) => a.withQualifier(Seq(q))
            case None => a.withQualifier(Seq.empty)
          }
        case c: CreateNamedStruct =>
          RawSql(exprSql(c), c.dataType, c.nullable)
        case lf: LambdaFunction =>
          RawSql(exprSql(lf), lf.dataType, lf.nullable)
        case s: ScalarSubquery => RawSql(exprSql(s), s.dataType, s.nullable)
        case ex: Exists => RawSql(exprSql(ex), ex.dataType, ex.nullable)
        case in: InSubquery => RawSql(exprSql(in), in.dataType, in.nullable)
        case o: OuterReference => RawSql(exprSql(o), o.dataType, o.nullable)
      }.sql

    private def projList(es: Seq[Expression]): String =
      es.map(exprSql).mkString(", ")

    /** Render a child plan as a FROM-clause relation: named tables
      * stay bare identifiers, everything else becomes an aliased
      * subquery.
      */
    private def rel(plan: LogicalPlan): String = plan match {
      // hints (broadcast() etc.) don't change results; the re-planned
      // query re-derives the strategy from stats
      case h: ResolvedHint => rel(h.child)
      case lr: LogicalRelation => tableName(lr)
      case SubqueryAlias(id, child) => child match {
        case lr: LogicalRelation =>
          val n = tableNameOpt(lr).getOrElse(id.name)
          if (n == id.name) n else s"$n AS ${id.name}"
        case l: LocalRelation =>
          SqlGen.registeredName(l).getOrElse(localRel(l, id.name))
        case v: View => id.name
        case _ => s"(${gen(child)}) AS ${id.name}"
      }
      case l: LocalRelation =>
        SqlGen.registeredName(l).getOrElse(localRel(l, fresh()))
      case v: View => v.desc.identifier.table
      case r: CTERelationRef if cteNames.contains(r.cteId) => cteNames(r.cteId)
      case other => s"(${gen(other)}) AS ${fresh()}"
    }

    /** Name of a file-backed relation: the registered name if any
      * (SqlGen.register — covers CSV/JSON), else recovered from a
      * parquet file location (the registry reads
      * `<dir>/<name>.parquet`).
      */
    private def tableNameOpt(lr: LogicalRelation): Option[String] =
      SqlGen.registeredName(lr).orElse {
        val fname = lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.headOption.map(_.getName).getOrElse("")
          case _ => ""
        }
        if (fname.endsWith(".parquet"))
          Some(fname.stripSuffix(".parquet") match {
            // A raw events relation carries ts as long nanos; the
            // `events` view already includes the µs conversion, so
            // point at the raw view to avoid converting twice (see
            // Tables.register).
            case "events" => "events_raw"
            case t => t
          })
        else None
      }

    private def tableName(lr: LogicalRelation): String =
      tableNameOpt(lr).getOrElse(throw new IllegalArgumentException(
        "SqlGen: cannot name a non-parquet relation — register it " +
          "first via SqlGen.register(name, df) (+ a matching temp view)"))

    /** In-memory relation → inline SQL: `(VALUES …) AS a(cols)`, or a
      * zero-row SELECT for an empty relation (the reference's
      * EmptyRelation, logical_plan.rs:191-203).
      */
    private def localRel(l: LocalRelation, alias: String): String = {
      if (l.data.isEmpty) {
        val nulls = l.output
          .map(a => s"CAST(NULL AS ${a.dataType.sql}) AS `${a.name}`")
          .mkString(", ")
        s"(SELECT $nulls WHERE 1 = 0) AS $alias"
      } else {
        val rows = l.data.map { row =>
          l.output.zipWithIndex.map { case (a, i) =>
            litSql(row.get(i, a.dataType), a.dataType)
          }.mkString("(", ", ", ")")
        }.mkString(", ")
        val cols = l.output.map(a => s"`${a.name}`").mkString(", ")
        s"(VALUES $rows) AS $alias($cols)"
      }
    }

    /** Literal → SQL, recursing into nested arrays/structs/maps:
      * Catalyst's `Literal.sql` renders flat values but falls back to
      * `toString` for nested container data (printing
      * `GenericArrayData@…`), which doesn't re-parse.
      */
    private def litSql(v: Any, dt: DataType): String = (v, dt) match {
      case (null, _) => s"CAST(NULL AS ${dt.sql})"
      // empty containers need the CAST: bare ARRAY() types as
      // array<void> and map() as map<string,string> on re-parse
      case (a: org.apache.spark.sql.catalyst.util.ArrayData,
            org.apache.spark.sql.types.ArrayType(et, _)) =>
        if (a.numElements == 0) s"CAST(ARRAY() AS ${dt.sql})"
        else a.toSeq[Any](et).map(litSql(_, et)).mkString("ARRAY(", ", ", ")")
      case (r: org.apache.spark.sql.catalyst.InternalRow,
            st: org.apache.spark.sql.types.StructType) =>
        st.fields.zipWithIndex.map { case (f, i) =>
          // Literal.sql gives proper single-quote escaping of the name
          s"${Literal(f.name).sql}, ${litSql(r.get(i, f.dataType), f.dataType)}"
        }.mkString("named_struct(", ", ", ")")
      case (m: org.apache.spark.sql.catalyst.util.MapData,
            org.apache.spark.sql.types.MapType(kt, vt, _)) =>
        if (m.numElements == 0) s"CAST(map() AS ${dt.sql})"
        else {
          val ks = m.keyArray.toSeq[Any](kt).map(litSql(_, kt))
          val vs = m.valueArray.toSeq[Any](vt).map(litSql(_, vt))
          ks.zip(vs).map { case (k, w) => s"$k, $w" }
            .mkString("map(", ", ", ")")
        }
      case _ => Literal(v, dt).sql
    }

    /** Render a join child for the FROM clause and return
      * (sql, alias-to-qualify-its-columns-with). Named relations
      * qualify by their own name; everything else gets an explicit
      * alias.
      */
    private def joinSide(plan: LogicalPlan): (String, String) = plan match {
      case h: ResolvedHint => joinSide(h.child)
      case SubqueryAlias(id, _) => (rel(plan), id.name)
      case lr: LogicalRelation =>
        val n = tableName(lr); (n, n)
      case v: View =>
        val n = v.desc.identifier.table; (n, n)
      case r: CTERelationRef if cteNames.contains(r.cteId) =>
        val n = cteNames(r.cteId); (n, n)
      case other =>
        val a = fresh()
        (s"(${gen(other)}) AS $a", a)
    }

    /** Print `body` with the given exprId→alias qualifiers in scope
      * (the relations must already be rendered).
      */
    private def withQuals[A](
        quals: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String])
        (body: => A): A = {
      val saved = joinQuals
      joinQuals = joinQuals ++ quals
      try body finally joinQuals = saved
    }

    private def plainJoin(jt: JoinType): Boolean = jt match {
      case Inner | Cross | LeftOuter | RightOuter | FullOuter => true
      case _ => false
    }

    /** Flatten the left spine of a join tree into ONE multi-relation
      * FROM clause, accumulating an exprId→alias qualifier for every
      * leaf side. Wrapping a nested join in a subquery instead would
      * collapse its sides' qualifiers — a self-join exposing the same
      * column name from three sides (reference select.rs:668-690, the
      * v1/v1a/v1b CTE self-join) must print as
      * `v1 JOIN v1 AS v1a ON … JOIN v1 AS v1b ON …` or the re-parse is
      * ambiguous.
      */
    private def renderFrom(plan: LogicalPlan)
        : (String, Map[org.apache.spark.sql.catalyst.expressions.ExprId, String]) =
      plan match {
        case h: ResolvedHint => renderFrom(h.child)
        case Join(left, right, jt, cond, _) if plainJoin(jt) =>
          val (lsql, lquals) = renderFrom(left)
          val (rsql, ralias) = joinSide(right)
          val quals = lquals ++ right.output.map(_.exprId -> ralias)
          // condition-less joins: inner/cross print as CROSS JOIN; an
          // outer join needs an explicit ON TRUE (bare `A LEFT JOIN B`
          // is a syntax error that would otherwise surface only at
          // re-parse time)
          val on = cond.map(c => withQuals(quals) {
            s" ON ${exprSql(c)}"
          }).getOrElse(if (jt == Inner || jt == Cross) "" else " ON TRUE")
          val kw =
            if (cond.isEmpty && (jt == Inner || jt == Cross)) "CROSS JOIN"
            else joinKw(jt)
          (s"$lsql $kw $rsql$on", quals)
        case other =>
          val (sql, alias) = joinSide(other)
          (sql, other.output.map(_.exprId -> alias).toMap)
      }

    private def joinKw(t: JoinType): String = t match {
      case Inner => "JOIN"
      case LeftOuter => "LEFT JOIN"
      case RightOuter => "RIGHT JOIN"
      case FullOuter => "FULL JOIN"
      case LeftSemi => "LEFT SEMI JOIN"
      case LeftAnti => "LEFT ANTI JOIN"
      case Cross => "CROSS JOIN"
      case other => other.sql
    }

    def gen(plan: LogicalPlan): String = plan match {
      // Projection over a filter over a relation folds into one
      // SELECT … WHERE … (mirrors the reference's single-SELECT shape,
      // logical_plan.rs:67-135) — keeps generated SQL readable and the
      // re-planned query identical.
      // Projection (with optional filter) straight over a join tree
      // folds into one SELECT with every join side's outputs qualified
      // by its FROM alias: a self-join or USING join exposes duplicate
      // column names, so the projection MUST be printed as
      // `a.id, b.id` inside the same SELECT — wrapping the join in a
      // subquery first would make the bare names ambiguous.
      case Project(list, Filter(cond, j: Join)) if plainJoin(j.joinType) =>
        val (from, quals) = renderFrom(j)
        withQuals(quals) {
          s"SELECT ${projList(list)} FROM $from WHERE ${exprSql(cond)}"
        }
      case Project(list, Filter(cond, child)) =>
        s"SELECT ${projList(list)} FROM ${rel(child)} WHERE ${exprSql(cond)}"
      case Project(list, j: Join) if plainJoin(j.joinType) =>
        val (from, quals) = renderFrom(j)
        withQuals(quals) { s"SELECT ${projList(list)} FROM $from" }
      case Project(list, child) =>
        s"SELECT ${projList(list)} FROM ${rel(child)}"

      // rollup/cube/groupingSets: the analyzer lowers them to
      // Aggregate-over-Expand where each Expand projection is one
      // grouping set and the trailing literal is its grouping id
      // (bit i set ⇒ grouping column i excluded). Reconstruct the
      // GROUPING SETS clause from those bitmasks.
      case Aggregate(ge, aggs, ex @ Expand(projections, output, child), _)
          if ge.nonEmpty && ge.last.isInstanceOf[Attribute] &&
             ge.last.asInstanceOf[Attribute].name == "spark_grouping_id" =>
        val gidAttr = ge.last.asInstanceOf[Attribute]
        def gidOf(p: Seq[Expression]): Long = p.last match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
          case _ => Long.MaxValue
        }
        // The analyzer also inserts an internal Project under Expand
        // that re-aliases every grouping expression (duplicate column
        // names). Unwrap it and substitute attributes back through its
        // alias map, or the generated subquery is ambiguous.
        val (baseRel, subst: (Expression => Expression)) = child match {
          case Project(plist, gchild)
              if plist.map(_.name).distinct.size < plist.size =>
            val m = plist.collect {
              case a: Alias => a.exprId -> a.child
            }.toMap
            (gchild, (e: Expression) => e.transform {
              case at: Attribute if m.contains(at.exprId) => m(at.exprId)
            })
          case _ => (child, identity[Expression] _)
        }
        val full = projections.minBy(gidOf)
        // Expand row layout: [child passthrough…, k grouping values, gid]
        val k = ge.size - 1
        val origExprs =
          full.slice(output.size - 1 - k, output.size - 1).map(subst)
        gidId = Some(gidAttr.exprId)
        gidCols = origExprs
        try {
          val sets = projections.map { p =>
            val gid = gidOf(p)
            (0 until k).filter(i => (gid & (1L << (k - 1 - i))) == 0)
              .map(i => exprSql(origExprs(i))).mkString("(", ", ", ")")
          }
          val sel = projList(aggs.map(a => subst(a)
            .asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))
          require(!sel.contains("spark_grouping_id"),
            "SqlGen: grouping_id() may only appear bare/aliased or as " +
              "grouping(col) in the select list")
          s"SELECT $sel FROM ${rel(baseRel)} " +
            s"GROUP BY GROUPING SETS (${sets.mkString(", ")})"
        } finally { gidId = None; gidCols = Nil }

      case Aggregate(Nil, aggs, child, _) =>
        s"SELECT ${projList(aggs)} FROM ${rel(child)}"
      case Aggregate(group, aggs, child, _) =>
        // GROUP BY positions sidestep re-resolving grouping expressions
        // that also appear aliased in the select list.
        val pos = group.indices.map { i =>
          val g = group(i)
          val idx = aggs.indexWhere {
            case Alias(e, _) => e.semanticEquals(g)
            case e => e.semanticEquals(g)
          }
          if (idx >= 0) (idx + 1).toString else exprSql(g)
        }
        s"SELECT ${projList(aggs)} FROM ${rel(child)} GROUP BY ${pos.mkString(", ")}"

      case Filter(cond, j: Join) if plainJoin(j.joinType) =>
        val (from, quals) = renderFrom(j)
        withQuals(quals) { s"SELECT * FROM $from WHERE ${exprSql(cond)}" }
      case Filter(cond, child) =>
        s"SELECT * FROM ${rel(child)} WHERE ${exprSql(cond)}"

      case Sort(order, true, child, _) =>
        s"SELECT * FROM ${rel(child)} ORDER BY ${order.map(exprSql).mkString(", ")}"

      case GlobalLimit(IntegerLiteral(l), LocalLimit(_, child)) =>
        s"SELECT * FROM ${rel(child)} LIMIT $l"
      case LocalLimit(IntegerLiteral(l), child) =>
        s"SELECT * FROM ${rel(child)} LIMIT $l"
      case Offset(IntegerLiteral(o), child) =>
        s"SELECT * FROM ${rel(child)} OFFSET $o"

      case Distinct(child) =>
        s"SELECT DISTINCT * FROM ${rel(child)}"
      case Deduplicate(keys, child) if keys.map(_.name).toSet == child.output.map(_.name).toSet =>
        s"SELECT DISTINCT * FROM ${rel(child)}"

      case Join(left, right, jt @ (LeftSemi | LeftAnti), cond, _) =>
        val (lsql, lq) = joinSide(left)
        val (rsql, rq) = joinSide(right)
        val on = cond.map(c => withQuals(
          (left.output.map(_.exprId -> lq) ++
            right.output.map(_.exprId -> rq)).toMap) {
          s" ON ${exprSql(c)}"
        }).getOrElse(" ON TRUE") // bare SEMI/ANTI JOIN is a syntax error
        s"SELECT * FROM $lsql ${joinKw(jt)} $rsql$on"
      case j: Join if plainJoin(j.joinType) =>
        val (from, _) = renderFrom(j)
        s"SELECT * FROM $from"

      // LATERAL (correlated subquery in FROM): the analyzer wraps the
      // body in a LateralSubquery whose OuterReferences print as bare
      // outer columns (subquerySql's shadow check applies, same as
      // scalar/EXISTS subqueries). Inner+no-condition prints the
      // comma form `left, LATERAL (...)`; outer prints
      // `LEFT JOIN LATERAL (...) ON TRUE` (bare JOIN LATERAL without
      // ON is a syntax error, like the other outer joins).
      case lj: LateralJoin =>
        val (lsql, lquals) = renderFrom(lj.left)
        val (alias, body) = lj.right.plan match {
          case SubqueryAlias(id, inner) => (id.name, inner)
          case other => (fresh(), other)
        }
        val sub = s"(${subquerySql(body)}) AS $alias"
        (lj.joinType, lj.condition) match {
          case (Inner | Cross, None) =>
            s"SELECT * FROM $lsql, LATERAL $sub"
          case (LeftOuter, None) =>
            s"SELECT * FROM $lsql LEFT JOIN LATERAL $sub ON TRUE"
          case (jt, cond) =>
            // ON attributes need the same qualifier scope every other
            // join path establishes — a name shared by both sides
            // would otherwise print bare and re-resolve ambiguously
            // (or as a tautology)
            val quals = lquals ++
              lj.right.plan.output.map(_.exprId -> alias)
            val on = cond.map(c => withQuals(quals) {
              s" ON ${exprSql(c)}"
            }).getOrElse(" ON TRUE")
            s"SELECT * FROM $lsql ${joinKw(jt)} LATERAL $sub$on"
        }

      case Union(children, false, false) =>
        children.map(c => s"SELECT * FROM ${rel(c)}").mkString(" UNION ALL ")
      case Intersect(left, right, isAll) =>
        val kw = if (isAll) "INTERSECT ALL" else "INTERSECT"
        s"SELECT * FROM ${rel(left)} $kw SELECT * FROM ${rel(right)}"
      case Except(left, right, isAll) =>
        val kw = if (isAll) "EXCEPT ALL" else "EXCEPT"
        s"SELECT * FROM ${rel(left)} $kw SELECT * FROM ${rel(right)}"

      case g: Generate =>
        val gen = g.generator match {
          case org.apache.spark.sql.catalyst.expressions.Explode(e) =>
            s"EXPLODE(${exprSql(e)})"
          case org.apache.spark.sql.catalyst.expressions.PosExplode(e) =>
            s"POSEXPLODE(${exprSql(e)})"
          case other =>
            throw new IllegalArgumentException(
              s"SqlGen: unsupported generator ${other.prettyName}")
        }
        val outer = if (g.outer) " OUTER" else ""
        val cols = g.generatorOutput.map(a => s"`${a.name}`").mkString(", ")
        s"SELECT * FROM ${rel(g.child)} LATERAL VIEW$outer $gen _lv AS $cols"

      case Window(windowExprs, _, _, child, _) =>
        s"SELECT *, ${projList(windowExprs)} FROM ${rel(child)}"

      // CTEs: the analyzer hoists WITH into WithCTE(plan, defs); each
      // def wraps its plan in SubqueryAlias(name, …) and references
      // appear as CTERelationRef (reference: tests/select.rs:640-704
      // roundtrips WITH … UNION ALL … queries).
      case w: WithCTE =>
        val defs = w.cteDefs.map { d =>
          val (name, body) = d.child match {
            case SubqueryAlias(id, inner) => (id.name, inner)
            case other => (fresh(), other)
          }
          cteNames(d.id) = name
          s"$name AS (${gen(body)})"
        }
        s"WITH ${defs.mkString(", ")} ${gen(w.plan)}"
      case r: CTERelationRef =>
        s"SELECT * FROM ${cteNames.getOrElse(r.cteId, throw new IllegalArgumentException(
          s"SqlGen: CTE reference ${r.cteId} outside its WITH scope"))}"

      case SubqueryAlias(_, child) => gen(child)
      case h: ResolvedHint => gen(h.child)
      // Physical-distribution operators don't change the result
      // multiset — SQL has no syntax for them, and the re-planned
      // query re-derives distribution from the plan. Same contract as
      // dropping ResolvedHint above.
      case r: Repartition => gen(r.child)
      case r: RepartitionByExpression => gen(r.child)
      case Sort(_, false, child, _) => gen(child) // sortWithinPartitions
      case v: View => s"SELECT * FROM ${v.desc.identifier.table}"
      case lr: LogicalRelation => s"SELECT * FROM ${tableName(lr)}"
      case l: LocalRelation => s"SELECT * FROM ${rel(l)}"
      case r: Range =>
        s"SELECT id FROM range(${r.start}, ${r.end}, ${r.step})"
      case _: OneRowRelation => "SELECT 1"

      // iterative-operator barrier with registered WITH RECURSIVE
      // provenance: splice the operator-emitted text (rendered lazily
      // here — a failure surfaces as a toSql error, not a silent
      // registration skip)
      case p if SqlGen.iterativeSqlOf(p).isDefined =>
        SqlGen.iterativeSqlOf(p).get.apply()

      case other =>
        throw new IllegalArgumentException(
          s"SqlGen: unsupported plan node ${other.nodeName} — " +
            s"supported: Project/Filter/Aggregate/Sort/Limit/Offset/" +
            s"Distinct/Join/Union/Window/SubqueryAlias/Relation")
    }
  }
}
