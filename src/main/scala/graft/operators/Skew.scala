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
    *  - `saltBy = Nil`: positional salt, made retry-safe by an EAGER
    *    localCheckpoint() of the salted projection. Eager is
    *    load-bearing: the blocks must exist and lineage must be
    *    truncated BEFORE the aggregation job consumes any salt. A
    *    lazy checkpoint materializes during the phase-1 job itself —
    *    an executor lost mid-job would recompute its partitions from
    *    intact lineage with fresh salts while other reducers already
    *    consumed the old ones (the exact SPARK-23207 corruption).
    *    With eager, the dedicated materialization job can recompute
    *    freely (nothing has consumed salts yet), and afterwards a
    *    lost block FAILS the job loudly instead of corrupting it.
    *    Costs: one full materialization at CALL time (constructing
    *    the frame launches a job even if never used), the salted
    *    projection pinned in executor storage until the RDD is GC'd,
    *    and a plan SqlGen can't print (RDD barrier) — prefer `saltBy`
    *    with a key column in production and for anything long-lived.
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
          .localCheckpoint() // eager — see the retry-safety note above
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
