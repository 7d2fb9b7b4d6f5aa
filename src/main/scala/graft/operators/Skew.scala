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
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      aggs: Map[String, (String, String)],
      saltBuckets: Int = 64): DataFrame = {
    require(saltBuckets >= 2)
    require(aggs.nonEmpty, "saltedAggregate: aggs must be non-empty")
    require(!df.columns.contains("_salt"),
      "saltedAggregate: input already has a _salt column — rename it " +
        "(the synthetic salt would silently overwrite it)")
    // per-ROW salt, not a hash of the row's content: the degenerate hot
    // key is often millions of IDENTICAL rows (sentinel/default rows),
    // and a content hash would put every copy in the same bucket —
    // reproducing exactly the skew this operator exists to break up.
    // spark_partition_id spreads buckets across input partitions and
    // the id counter spreads within one; determinism of the salt is
    // irrelevant because phase 2 re-merges every bucket.
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id() + spark_partition_id(),
        lit(saltBuckets.toLong)))
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
