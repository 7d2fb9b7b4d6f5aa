package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the most recent
  * right row with `rightTs <= leftTs` for the same key.
  *
  * Spark has no native as-of join. The naive formulations are a range
  * join (O(n·m) cross product per key) or a per-key
  * `groupByKey.flatMapGroups` (all rows of a key in one task). This
  * implementation is the scale-correct one: tag and UNION the two
  * sides, sort within each key partition once, and carry the latest
  * right-side values forward with `last(_, ignoreNulls = true)` over a
  * running window. One shuffle on the key, linear work, no skew
  * beyond what the key distribution already has.
  *
  * Ordering inside a key is (ts, isLeft, tiebreak), so a right row at
  * exactly leftTs is visible to that left row (inclusive semantics)
  * and results are deterministic under timestamp ties.
  *
  * `tolerance` (optional): right rows older than
  * `leftTs - tolerance` are nulled out rather than matched. For
  * TimestampType ts columns the tolerance is in **milliseconds**; for
  * numeric ts columns it is in the **column's own unit** (the two ts
  * columns must be the same kind).
  */
object AsOfJoin {

  def backward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTs: String, rightTs: String,
      leftTiebreak: String, rightTiebreak: String,
      rightValueCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith("_asof_")),
      "left column names starting with _asof_ are reserved")
    rightValueCols.foreach(c => require(!leftCols.contains(s"_m_$c"),
      s"left column _m_$c collides with an internal carry column"))
    val leftTsType = left.schema(leftTs).dataType
    val rightTsType = right.schema(rightTs).dataType
    val bothTimestamps = leftTsType == org.apache.spark.sql.types.TimestampType &&
      rightTsType == org.apache.spark.sql.types.TimestampType
    require(bothTimestamps ||
      (leftTsType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
       rightTsType.isInstanceOf[org.apache.spark.sql.types.NumericType]),
      s"ts columns must both be TimestampType or both numeric, got " +
        s"${leftTsType.simpleString} / ${rightTsType.simpleString}")

    val taggedLeft = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_is_left", lit(1))
      .withColumn("_asof_tb", col(leftTiebreak).cast("long"))
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_is_left"),
            col(rightTiebreak).cast("long").as("_asof_tb"),
            col(rightTs).as("_asof_right_ts")) ++
        rightValueCols.map(c => col(c).as(s"_asof_v_$c")): _*)

    // align schemas for the union
    val allCols =
      (taggedLeft.columns ++ taggedRight.columns).distinct
    def aligned(df: DataFrame): DataFrame =
      df.select(allCols.toIndexedSeq.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)

    val unioned = aligned(taggedLeft).unionByName(aligned(taggedRight))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_ts").asc, col("_asof_is_left").asc, col("_asof_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned
      .withColumn("_asof_m_ts", last(col("_asof_right_ts"), ignoreNulls = true).over(w))
      .withColumns(rightValueCols.map(c =>
        s"_m_$c" -> last(col(s"_asof_v_$c"), ignoreNulls = true).over(w)).toMap)

    val inTolerance = toleranceMs match {
      case Some(t) =>
        // timestamp cast("double") yields SECONDS → scale to ms;
        // numeric ts columns are already in the tolerance's unit
        val diff =
          col("_asof_ts").cast("double") - col("_asof_m_ts").cast("double")
        val scaled = if (bothTimestamps) diff * 1000 else diff
        col("_asof_m_ts").isNotNull && scaled <= t
      case None => col("_asof_m_ts").isNotNull
    }

    carried
      .where(col("_asof_is_left") === 1)
      .select(
        leftCols.map(col) ++
          Seq(when(inTolerance, col("_asof_m_ts")).otherwise(lit(null))
                .as(s"asof_$rightTs")) ++
          rightValueCols.map(c =>
            when(inTolerance, col(s"_m_$c")).otherwise(lit(null)).as(s"asof_$c")): _*)
  }

  /** Forward as-of join: for every left row, attach the EARLIEST right
    * row with `rightTs >= leftTs` for the same key (inclusive). Same
    * union+window shape as [[backward]] with the scan direction
    * reversed; `toleranceMs` nulls out right rows further than the
    * tolerance AFTER the left row.
    */
  def forward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTs: String, rightTs: String,
      leftTiebreak: String, rightTiebreak: String,
      rightValueCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith("_asof_")),
      "left column names starting with _asof_ are reserved")
    rightValueCols.foreach(c => require(!leftCols.contains(s"_m_$c"),
      s"left column _m_$c collides with an internal carry column"))
    val leftTsType = left.schema(leftTs).dataType
    val rightTsType = right.schema(rightTs).dataType
    val bothTimestamps = leftTsType == org.apache.spark.sql.types.TimestampType &&
      rightTsType == org.apache.spark.sql.types.TimestampType
    require(bothTimestamps ||
      (leftTsType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
       rightTsType.isInstanceOf[org.apache.spark.sql.types.NumericType]),
      s"ts columns must both be TimestampType or both numeric, got " +
        s"${leftTsType.simpleString} / ${rightTsType.simpleString}")

    val taggedLeft = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_is_left", lit(1))
      .withColumn("_asof_tb", col(leftTiebreak).cast("long"))
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_is_left"),
            col(rightTiebreak).cast("long").as("_asof_tb"),
            col(rightTs).as("_asof_right_ts")) ++
        rightValueCols.map(c => col(c).as(s"_asof_v_$c")): _*)

    val allCols = (taggedLeft.columns ++ taggedRight.columns).distinct
    def aligned(df: DataFrame): DataFrame =
      df.select(allCols.toIndexedSeq.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)

    val unioned = aligned(taggedLeft).unionByName(aligned(taggedRight))

    // descending time: "carry the latest right value forward" becomes
    // "carry the earliest FUTURE right value backward". At equal ts
    // the right row must be SEEN BEFORE the left row in the desc scan
    // (is_left asc: 0 first) so the join is inclusive; among several
    // rights at one ts the smallest tiebreak wins (tb desc ⇒ it is
    // seen last and last() keeps it).
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_ts").desc, col("_asof_is_left").asc, col("_asof_tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned
      .withColumn("_asof_m_ts", last(col("_asof_right_ts"), ignoreNulls = true).over(w))
      .withColumns(rightValueCols.map(c =>
        s"_m_$c" -> last(col(s"_asof_v_$c"), ignoreNulls = true).over(w)).toMap)

    val inTolerance = toleranceMs match {
      case Some(t) =>
        val diff =
          col("_asof_m_ts").cast("double") - col("_asof_ts").cast("double")
        val scaled = if (bothTimestamps) diff * 1000 else diff
        col("_asof_m_ts").isNotNull && scaled <= t
      case None => col("_asof_m_ts").isNotNull
    }

    carried
      .where(col("_asof_is_left") === 1)
      .select(
        leftCols.map(col) ++
          Seq(when(inTolerance, col("_asof_m_ts")).otherwise(lit(null))
                .as(s"asof_$rightTs")) ++
          rightValueCols.map(c =>
            when(inTolerance, col(s"_m_$c")).otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
