package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over an event log: sequential funnels and
  * cohort retention.
  *
  * Both operators hinge on the same scale property: every window is
  * partitioned by the user key and all steps CHAIN over that one
  * partitioning, so Catalyst plans a single hash exchange on user_id
  * and evaluates the step columns back-to-back in one Window stage —
  * an N-step funnel costs one shuffle, not N. (A join-per-step funnel,
  * the naive formulation, shuffles N times and resorts each round.)
  */
object EventsAnalytics {

  /** Strictly-ordered funnel: step i matches the earliest event of
    * `steps(i)` that happens strictly AFTER the user's step i-1 time.
    * Adds one nullable timestamp column per step (`step_1` … in input
    * order); a null means the user fell out of the funnel there.
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val w = Window.partitionBy(userCol)
    steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val hit = if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"step_$i")
      df.withColumn(s"step_${i + 1}", min(when(hit, col(tsCol))).over(w))
    }
  }

  /** Funnel conversion counts: one row, `n_step_i` = users whose
    * funnel reached step i (distinct users with a non-null step time).
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val timed = funnelTimes(events, userCol, tsCol, typeCol, steps)
    timed.agg(
      countDistinct(when(col("step_1").isNotNull, col(userCol)))
        .as("n_step_1"),
      steps.indices.drop(1).map(i =>
        countDistinct(when(col(s"step_${i + 1}").isNotNull, col(userCol)))
          .as(s"n_step_${i + 1}")): _*)
  }

  /** Cohort retention: users cohort by their first-activity date; the
    * output counts, per (cohort_day, day_offset), the users active
    * `day_offset` days after their cohort date. One exchange for the
    * cohort window + one for the final aggregate — the (user, day)
    * distinct rides the aggregate's partitioning.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(userCol)
    events
      .select(col(userCol), to_date(col(tsCol)).as("_ra_day"))
      .withColumn("_ra_cohort", min(col("_ra_day")).over(w))
      .select(col("_ra_cohort"),
        datediff(col("_ra_day"), col("_ra_cohort")).as("day_offset"),
        col(userCol))
      .distinct()
      .groupBy(date_format(col("_ra_cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
