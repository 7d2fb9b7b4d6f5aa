package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Pipeline, Relational}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory
  * each entry maps to.
  */
object SparkEntry {

  /** Every registered query group, concatenated. Order is stable. */
  private def groups: Seq[Relational.Q] = Relational.all ++ Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val q16 = groups.find(_.name == "q16_join_multi").get
    q16.build(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    groups.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
