package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join handling covers joins;
  * heavily-skewed AGGREGATION keys (one key holding 30% of a 100 TB
  * table) still funnel into one reducer. Salting splits each key into
  * `saltBuckets` synthetic sub-keys, aggregates partially per
  * sub-key, then finishes over the original key — two small shuffles
  * instead of one pathological one.
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * `aggs` maps output column name → (valueColumn, "sum" | "count").
    * Phase 1 groups by (keys ++ salt) — a per-row salt spread over
    * `saltBuckets` — and computes partials; phase 2 re-groups by the
    * true keys and combines.
    * Results are identical to the direct groupBy (sum/count are
    * commutative monoids); only the shuffle shape changes.
    *
    * The salt must be DETERMINISTIC under stage retry: after a shuffle
    * fetch failure Spark recomputes only the lost map tasks, and a
    * positional salt (monotonically_increasing_id) can assign the
    * replayed rows different buckets than the first run saw — rows
    * then land in reduce partitions that already consumed the old
    * copies, double-counting or dropping them (the SPARK-23207
    * round-robin class of bug). Two safe shapes:
    *
    *  - `saltBy = Seq(cols…)`: salt = xxhash64(cols…) mod buckets — a
    *    pure function of row content, replayed identically on retry.
    *    The columns should together be (near-)unique per row (a
    *    primary key); note a content hash of NON-unique columns would
    *    send every copy of an identical hot row to one bucket,
    *    reproducing the skew.
    *  - `saltBy = Nil`: positional salt, made retry-safe by a LAZY
    *    localCheckpoint() of the salted projection: lineage is
    *    truncated, so once a partition's blocks are stored, retries
    *    re-read them instead of recomputing salts (and each stored
    *    partition is internally salt-consistent — nothing downstream
    *    consumes a partition before its blocks exist). If an executor
    *    holding blocks dies the job FAILS (and can be rerun) rather
    *    than silently corrupting counts. Cost: the salted projection
    *    stays pinned in executor storage until the checkpointed RDD
    *    is GC'd, and the plan is no longer SqlGen-printable (it
    *    contains an RDD barrier) — prefer `saltBy` with a key column
    *    in production and for anything long-lived.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      aggs: Map[String, (String, String)],
      saltBuckets: Int = 64,
      saltBy: Seq[String] = Nil): DataFrame = {
    require(saltBuckets >= 2)
    require(aggs.nonEmpty, "saltedAggregate: aggs must be non-empty")
    require(!df.columns.contains("_salt"),
      "saltedAggregate: input already has a _salt column — rename it " +
        "(the synthetic salt would silently overwrite it)")
    val salted =
      if (saltBy.nonEmpty) {
        saltBy.foreach(c => require(df.columns.contains(c),
          s"saltedAggregate: saltBy column $c not in input"))
        df.withColumn("_salt",
          pmod(xxhash64(saltBy.map(col): _*), lit(saltBuckets.toLong)))
      } else
        df.withColumn("_salt",
            pmod(monotonically_increasing_id() + spark_partition_id(),
              lit(saltBuckets.toLong)))
          .localCheckpoint(false) // lazy: no job at construction time
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(
        aggs.head._2 match { case (c, op) => partialAgg(c, op).as(aggs.head._1) },
        aggs.tail.map { case (out, (c, op)) => partialAgg(c, op).as(out) }.toSeq: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        finishAgg(aggs.head._1, aggs.head._2._2).as(aggs.head._1),
        aggs.tail.map { case (out, (_, op)) => finishAgg(out, op).as(out) }.toSeq: _*)
  }

  private def partialAgg(c: String, op: String): Column = op match {
    case "sum" => sum(col(c))
    case "count" => count(col(c))
    case other => throw new IllegalArgumentException(s"unsupported op $other")
  }

  /** Combining partials: both sum-of-sums and sum-of-counts. */
  private def finishAgg(c: String, op: String): Column = sum(col(c))
}
