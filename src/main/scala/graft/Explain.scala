package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the physical plan of named SparkEntry
  * queries against a scale-factor directory. The manual half of
  * PlanAuditSpec — run it while developing an operator to see the
  * shapes the spec will pin (scans, exchanges, pushed/partition
  * filters, map-side partials).
  *
  *   sbt "runMain graft.Explain e07_rolling_active c08_dup_matrix"
  *
  * SPARK_GRAFT_SF_DIR picks the input (default sf0.001 — plans, not
  * timings, so the smallest SF is right); SPARK_GRAFT_EXPLAIN_MODE
  * picks the explain mode (simple|extended|codegen|cost|formatted).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.Explain <query name>...")
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString(
      sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "simple"))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try args.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(mode))
    } finally spark.stop()
  }
}
