package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join.
  *
  * The naive `points JOIN intervals ON p BETWEEN lo AND hi` has no
  * equi-key, so Spark plans BroadcastNestedLoopJoin — O(n·m) and a
  * driver-killer once intervals don't fit a broadcast. The bucketed
  * form quantizes the range dimension: points key by
  * `floor(p / bucket)`, intervals explode to every bucket they
  * overlap, and the join becomes an equi-join on bucket id with the
  * exact BETWEEN as a residual filter. Cost is linear in
  * (rows × avg interval span / bucket); pick `bucket` near the median
  * interval width.
  *
  * Output: all point columns + matching interval columns (inner).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucket: Double,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucket > 0)

    val p = points.withColumn("_rj_bucket",
      floor(col(pointCol) / bucket).cast("long"))

    // interval-side working columns carry a distinct suffix: a USING
    // join on shared names would make the generated SQL's join
    // condition ambiguous once both inputs become subqueries (SqlGen
    // prints bare identifiers)
    val iv = intervals
      .withColumnsRenamed(extraKeys.map(k => k -> s"_rj_k_$k").toMap)
      .withColumn("_rj_lo_b", floor(col(loCol) / bucket).cast("long"))
      .withColumn("_rj_hi_b", floor(col(hiCol) / bucket).cast("long"))
      .withColumn("_rj_bucket_iv",
        explode(sequence(col("_rj_lo_b"), col("_rj_hi_b"))))
      .drop("_rj_lo_b", "_rj_hi_b")

    val cond = (Seq(col("_rj_bucket") === col("_rj_bucket_iv")) ++
      extraKeys.map(k => col(k) === col(s"_rj_k_$k"))).reduce(_ && _)
    p.join(iv, cond, "inner")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_rj_bucket", "_rj_bucket_iv")
      .drop(extraKeys.map(k => s"_rj_k_$k"): _*)
  }
}
