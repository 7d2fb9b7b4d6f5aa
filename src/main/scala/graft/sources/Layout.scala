package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Compact a hive-partitioned directory partition-BY-partition:
    * rows hash-shuffle on the partition columns so each output
    * partition is written by as few tasks as its size needs, then
    * `partitionBy` restores the directory layout. The per-partition
    * file count is ⌈partition bytes / targetMB⌉ approximated
    * globally: `maxRecordsPerFile` derived from the average row width
    * caps any one file near targetMB even when partition sizes skew
    * (a purely global `coalesce` would merge ACROSS partitions and
    * re-fragment on write). Same in-place refusal as [[compact]].
    */
  def compactPartitioned(spark: SparkSession, inPath: String,
      outPath: String, partitionCols: Seq[String],
      targetMB: Int = 512): Unit = {
    require(targetMB > 0 && partitionCols.nonEmpty)
    require(new org.apache.hadoop.fs.Path(inPath) !=
        new org.apache.hadoop.fs.Path(outPath),
      "compactPartitioned: outPath must differ from inPath (overwrite " +
        "truncates the output before the read runs — write to a " +
        "staging dir and rename for in-place compaction)")
    val df = spark.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val rows = df.count()
    // BigInt end to end: rows × targetMB × 2^20 overflows Long for
    // catalog-scale row counts
    val maxRecords =
      if (rows == 0 || bytes <= 0) Long.MaxValue
      else (BigInt(rows) * targetMB * 1024 * 1024 / bytes)
        .max(1).min(BigInt(Long.MaxValue)).toLong
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecords)
      .partitionBy(partitionCols: _*)
      .parquet(outPath)
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

  /** Write with parquet bloom filters on the named columns — the
    * point-lookup complement to range sorting and Z-order: min/max
    * row-group stats skip RANGES (writeRangeSorted), bloom filters
    * skip row groups on EQUALITY probes over high-cardinality keys
    * that are NOT sorted (an id probe of a dedup ledger, a doc_id
    * fetch from a shard) — on unsorted data every row group's min/max
    * spans the domain and stats prune nothing, while a bloom filter
    * still rejects absent keys with no false negatives. `ndv` sizes
    * each filter (parquet derives the bitset from it; undersizing
    * raises the false-positive rate, which costs wasted reads, never
    * wrong results). Spark's vectorized reader consults the filters
    * automatically on `col = literal` scans.
    */
  def writeWithBloomFilters(df: DataFrame, path: String,
      bloomCols: Seq[String], ndv: Long = 1000000L,
      extraOptions: Map[String, String] = Map.empty): Unit = {
    require(bloomCols.nonEmpty, "writeWithBloomFilters: no columns")
    // extraOptions passes writer knobs through (e.g. parquet.block.size
    // to bound row-group size — the §4 read-path probe shrinks it so a
    // small corpus still exercises many-row-group skipping)
    bloomCols.foldLeft(df.write.mode("overwrite").options(extraOptions)) {
      (w, c) =>
        w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }.parquet(path)
  }

  /** Morton bit-spread: place the low 16 bits of `c` at even bit
    * positions (the standard mask-shift cascade, composed from
    * codegen'd bitwise builtins — no UDF).
    */
  private def spreadBits16(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Generic Morton spread for N-dimension interleave: bit `j` of the
    * (already bits-bounded) value lands at position `j*n + offset`.
    * The 2-D mask-shift cascade above doesn't generalize to arbitrary
    * stride, so this composes the spread from `bits` explicit
    * shift/and/or builtins — a wider but still fully codegen'd
    * expression tree (16 terms per dimension at the default width).
    */
  private def spreadBitsN(c: Column, bits: Int, n: Int, offset: Int): Column =
    (0 until bits).map { j =>
      shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + offset)
    }.reduce(_ bitwiseOR _)

  /** Z-order (Morton) layout over N ≥ 2 numeric columns — the
    * multi-dimension data-skipping layout [[writeRangeSorted]] can't
    * give: range-sorting on x makes every file narrow in x but full-
    * width in every other dimension, so their predicates read
    * everything. Interleaving the bits of all (rank-scaled) columns
    * into one z-value and range-sorting on THAT bounds every file in
    * EVERY dimension (a z-curve interval is a union of small
    * hyper-rectangles), so parquet min/max stats prune files for
    * predicates on any of the columns.
    *
    * Scaling is min/max-linear into `min(16, 63/N)` bits per column
    * (the per-dimension resolution falls as dimensions rise — the
    * inherent z-order trade; past ~4 dims prefer fewer, better-chosen
    * columns), from ONE bounded 2-row aggregate (at 100 TB you'd reuse
    * catalog stats). The z-value is a helper column, dropped from the
    * written files. Skew note: heavily skewed columns want rank
    * (ntile) scaling instead of linear; linear keeps the write
    * single-pass and deterministic, which is what the oracle-less
    * layout job needs.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    cols: String*): Unit = {
    val n = cols.length
    require(numFiles > 0)
    require(n >= 2, s"writeZOrdered wants >= 2 columns, got $n " +
      "(use writeRangeSorted for one)")
    require(n <= 8, s"writeZOrdered: $n dims leaves < 8 bits of " +
      "per-dimension resolution — pick the selective columns")
    require(!df.columns.contains("_z"),
      "writeZOrdered: input already has a _z column — rename it (the " +
        "helper z-value would silently replace and then drop it)")
    val bits = math.min(16, 63 / n)
    val maxVal = (1L << bits) - 1
    val Array(mins, maxs) = df.agg(
      struct(cols.map(c => min(col(c)).cast("double")): _*),
      struct(cols.map(c => max(col(c)).cast("double")): _*))
      .head().toSeq.map(_.asInstanceOf[org.apache.spark.sql.Row]).toArray
    if (cols.indices.exists(mins.isNullAt)) {
      // empty input (or an all-NULL layout column): nothing to order —
      // write as-is, like the other layout jobs do on empty inputs
      df.write.mode("overwrite").parquet(path)
      return
    }
    def scale(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(maxVal), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * maxVal.toDouble)
          .cast("long")))
    val z = cols.zipWithIndex.map { case (cn, d) =>
      val scaled = scale(col(cn), mins.getDouble(d), maxs.getDouble(d))
      // 2-D keeps the classic mask-shift cascade (5 ops/dim vs 16)
      if (n == 2) shiftleft(spreadBits16(scaled), d)
      else spreadBitsN(scaled, bits, n, d)
    }.reduce(_ bitwiseOR _)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
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
