package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: the jobs that keep a 100 TB parquet lake
  * scannable.
  *
  *  - [[compact]]: the small-files problem. Streaming ingestion and
  *    over-parallel writers leave thousands of KB-sized files; every
  *    downstream scan then pays a task + footer-read per file.
  *    Compaction rewrites a directory into ≈`targetMB` files.
  *  - [[writeRangeSorted]]: data-skipping layout. Parquet min/max
  *    stats only prune when values are clustered; a range-partitioned
  *    + within-partition sort on the filter columns makes each output
  *    file cover a narrow disjoint value range, so selective readers
  *    skip row groups (vanilla Spark) or whole files (stats-indexed
  *    table formats). The single-dimension analogue of Z-ordering;
  *    LayoutSpec proves the ranges are narrow and disjoint from the
  *    written footers.
  */
object Layout {

  /** Rewrite `inPath` (parquet) to `outPath` with file sizes near
    * `targetMB`. File count is derived from the actual input bytes —
    * not `spark.sql.files.maxPartitionBytes` — so tiny-file
    * directories collapse into few writers. Uses coalesce (no
    * shuffle) when shrinking; repartition only to grow parallelism.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetMB: Int = 512): Unit = {
    require(targetMB > 0)
    // overwrite mode truncates the output directory BEFORE the lazy
    // read executes — an in-place call would destroy its own input
    require(new org.apache.hadoop.fs.Path(inPath) !=
        new org.apache.hadoop.fs.Path(outPath),
      "compact: outPath must differ from inPath (overwrite truncates " +
        "the output before the read runs — write to a staging dir and " +
        "rename for in-place compaction)")
    val df = spark.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1,
      (bytes / (targetMB.toLong * 1024 * 1024)).toInt +
        (if (bytes % (targetMB.toLong * 1024 * 1024) > 0) 1 else 0))
    val current = df.rdd.getNumPartitions
    val shaped = if (files < current) df.coalesce(files)
                 else if (files > current) df.repartition(files)
                 else df
    shaped.write.mode("overwrite").parquet(outPath)
  }

  /** Write `df` range-partitioned and sorted on `sortCols` into
    * `numFiles` files: file i covers the i-th value range, so a
    * selective filter on the leading sort column scans ~1 file
    * instead of all of them.
    */
  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
                       sortCols: String*): Unit = {
    require(numFiles > 0 && sortCols.nonEmpty)
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Files actually read by a scan — execute `df`'s own physical plan
    * (a sink would plan a fresh instance whose metrics we couldn't
    * see) and read the scan node's metrics. The assertion primitive
    * for skip tests.
    */
  def filesRead(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val qe = df.queryExecution
    qe.toRdd.count()
    // AQE wraps each shuffle stage in a QueryStageExec, which is a
    // LeafExecNode — collectLeaves() would stop AT the stage and never
    // reach the FileSourceScanExec inside it, reporting 0 for any plan
    // with a shuffle. Recurse through stage boundaries explicitly.
    def scans(p: SparkPlan): Seq[Long] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scans(r.child)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(s.metrics.get("numFiles").map(_.value).getOrElse(0L))
      case other => other.children.flatMap(scans)
    }
    scans(qe.executedPlan).sum
  }
}
