package graft.sqlgen

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, CreateNamedStruct, Expression, GetStructField, IntegerLiteral, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

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

  private final class Gen {
    private val n = new AtomicInteger(0)
    private def fresh(): String = s"_g${n.incrementAndGet()}"

    /** Expression → SQL. Catalyst's `Expression.sql` is authoritative
      * for almost everything; the exceptions are struct construction
      * (its `.sql` prints `struct(v1, v2)` and loses field names) and
      * field access above it, which we print as
      * `named_struct('f', v, …).f` so the text re-parses losslessly.
      */
    private def exprSql(e: Expression): String = e match {
      case a: Alias => s"${exprSql(a.child)} AS `${a.name}`"
      case g: GetStructField => s"${exprSql(g.child)}.`${g.extractFieldName}`"
      case c: CreateNamedStruct =>
        s"named_struct(${c.children.map(exprSql).mkString(", ")})"
      // na.drop's predicate has no SQL function name — spell it out
      case n: org.apache.spark.sql.catalyst.expressions.AtLeastNNonNulls =>
        val indicators = n.children
          .map(c => s"(CASE WHEN ${exprSql(c)} IS NOT NULL THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"(($indicators) >= ${n.n})"
      case _ =>
        // Print attributes unqualified: qualifiers from the source
        // plan ("orders.o_custkey") dangle once the child is wrapped
        // in a generated subquery alias. Same bare-identifier contract
        // as the reference (expr.rs:17-32).
        e.transform {
          case a: AttributeReference => a.withQualifier(Seq.empty)
        }.sql
    }

    private def projList(es: Seq[Expression]): String =
      es.map(exprSql).mkString(", ")

    /** Render a child plan as a FROM-clause relation: named tables
      * stay bare identifiers, everything else becomes an aliased
      * subquery.
      */
    private def rel(plan: LogicalPlan): String = plan match {
      case lr: LogicalRelation => tableName(lr)
      case SubqueryAlias(id, child) => child match {
        case lr: LogicalRelation => tableName(lr)
        case v: View => id.name
        case _ => s"(${gen(child)}) AS ${id.name}"
      }
      case v: View => v.desc.identifier.table
      case other => s"(${gen(other)}) AS ${fresh()}"
    }

    /** Recover the table name of a parquet relation from its file
      * location (the registry reads `<dir>/<name>.parquet`).
      */
    private def tableName(lr: LogicalRelation): String = {
      val path = lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.getName).getOrElse("")
        case _ => ""
      }
      path.stripSuffix(".parquet") match {
        case "" => fresh()
        // A raw events relation carries ts as long nanos; the `events`
        // view already includes the µs conversion, so point at the raw
        // view to avoid converting twice (see Tables.register).
        case "events" => "events_raw"
        case t => t
      }
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
      case Project(list, Filter(cond, child)) =>
        s"SELECT ${projList(list)} FROM ${rel(child)} WHERE ${exprSql(cond)}"
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
        require(!aggs.exists(_.exists(_.semanticEquals(gidAttr))),
          "SqlGen: grouping()/grouping_id() in the select list is not supported")
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
        val sets = projections.map { p =>
          val gid = gidOf(p)
          (0 until k).filter(i => (gid & (1L << (k - 1 - i))) == 0)
            .map(i => exprSql(origExprs(i))).mkString("(", ", ", ")")
        }
        s"SELECT ${projList(aggs.map(a => subst(a).asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))} FROM ${rel(baseRel)} " +
          s"GROUP BY GROUPING SETS (${sets.mkString(", ")})"

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
        val on = cond.map(c => s" ON ${exprSql(c)}").getOrElse("")
        s"SELECT * FROM ${rel(left)} ${joinKw(jt)} ${rel(right)}$on"
      case Join(left, right, Cross, None, _) =>
        s"SELECT * FROM ${rel(left)} CROSS JOIN ${rel(right)}"
      case Join(left, right, Inner, None, _) =>
        s"SELECT * FROM ${rel(left)} CROSS JOIN ${rel(right)}"
      case Join(left, right, jt, Some(cond), _) =>
        s"SELECT * FROM ${rel(left)} ${joinKw(jt)} ${rel(right)} ON ${exprSql(cond)}"

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

      case SubqueryAlias(_, child) => gen(child)
      case v: View => s"SELECT * FROM ${v.desc.identifier.table}"
      case lr: LogicalRelation => s"SELECT * FROM ${tableName(lr)}"
      case r: Range =>
        s"SELECT id FROM range(${r.start}, ${r.end}, ${r.step})"
      case _: OneRowRelation => "SELECT 1"

      case other =>
        throw new IllegalArgumentException(
          s"SqlGen: unsupported plan node ${other.nodeName} — " +
            s"supported: Project/Filter/Aggregate/Sort/Limit/Offset/" +
            s"Distinct/Join/Union/Window/SubqueryAlias/Relation")
    }
  }
}
