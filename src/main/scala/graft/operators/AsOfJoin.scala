package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for every left row, attach the most recent right row
  * with `rightTs <= leftTs` ([[backward]]) or the earliest right row
  * with `rightTs >= leftTs` ([[forward]]) for the same key.
  *
  * Spark has no native as-of join. The naive formulations are a range
  * join (O(n·m) cross product per key) or a per-key
  * `groupByKey.flatMapGroups` (all rows of a key in one task). This
  * implementation is the scale-correct one: tag and UNION the two
  * sides, sort within each key partition once, and carry the nearest
  * right-side ROW along with `last(_, ignoreNulls = true)` over a
  * running window. One shuffle on the key, linear work, no skew
  * beyond what the key distribution already has.
  *
  * The carried column is a single STRUCT of (ts, value columns), so
  * the matched timestamp and the attached values always come from the
  * SAME right row — per-column carries would smear values across rows
  * whenever a right row holds a null value. Right rows with a null
  * key are excluded up front (an equi-join never matches null keys).
  *
  * Ordering inside a key is (ts, isLeft, tiebreak), so a right row at
  * exactly leftTs is visible to that left row (inclusive semantics)
  * and results are deterministic under timestamp ties: backward keeps
  * the LARGEST right tiebreak at a tied timestamp, forward the
  * SMALLEST (the row nearest the left row in scan direction).
  *
  * `tolerance` (optional): right rows further than `tolerance` from
  * the left row (older for backward, later for forward) are nulled
  * out rather than matched. For TimestampType ts columns the
  * tolerance is in **milliseconds**; for numeric ts columns it is in
  * the **column's own unit** (the two ts columns must be the same
  * kind).
  */
object AsOfJoin {

  def backward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTs: String, rightTs: String,
      leftTiebreak: String, rightTiebreak: String,
      rightValueCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame =
    asOf(left, right, keyCols, leftTs, rightTs, leftTiebreak,
      rightTiebreak, rightValueCols, toleranceMs, scanForward = false)

  def forward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTs: String, rightTs: String,
      leftTiebreak: String, rightTiebreak: String,
      rightValueCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame =
    asOf(left, right, keyCols, leftTs, rightTs, leftTiebreak,
      rightTiebreak, rightValueCols, toleranceMs, scanForward = true)

  /** Shared core; `scanForward` flips the window's scan direction and
    * the tolerance's sign — everything else (tagging, union alignment,
    * atomic struct carry, output projection) is direction-independent.
    */
  private def asOf(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTs: String, rightTs: String,
      leftTiebreak: String, rightTiebreak: String,
      rightValueCols: Seq[String],
      toleranceMs: Option[Long],
      scanForward: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith("_asof_")),
      "left column names starting with _asof_ are reserved")
    require(!keyCols.exists(_.startsWith("_asof_")),
      "key column names starting with _asof_ are reserved")
    val outNames = s"asof_$rightTs" +: rightValueCols.map(c => s"asof_$c")
    outNames.foreach(n => require(!leftCols.contains(n),
      s"left column `$n` collides with an as-of output column — rename " +
        "it before joining"))
    require(!rightValueCols.contains("_asof_struct_ts"),
      "right value column name _asof_struct_ts is reserved")
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
    // null-keyed right rows can never match (equi-join semantics);
    // dropping them here also keeps them out of the null-key window
    // partition that null-keyed LEFT rows land in
    val taggedRight = right
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++
          Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_is_left"),
              col(rightTiebreak).cast("long").as("_asof_tb"),
              // ONE atomic carry: the matched ts and every value column
              // travel as a single struct from a single right row
              struct(col(rightTs).as("_asof_struct_ts") +:
                rightValueCols.map(c => col(c).as(c)): _*).as("_asof_row")): _*)

    // align schemas for the union
    val allCols = (taggedLeft.columns ++ taggedRight.columns).distinct
    def aligned(df: DataFrame): DataFrame =
      df.select(allCols.toIndexedSeq.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)

    val unioned = aligned(taggedLeft).unionByName(aligned(taggedRight))

    // backward: ascending time, "carry the latest right row forward";
    // at a tied ts the right row sorts before the left (is_left asc ⇒
    // inclusive) and the largest right tiebreak is seen last, winning.
    // forward: descending time, "carry the earliest FUTURE right row
    // backward"; inclusive for the same reason, and tb desc makes the
    // SMALLEST right tiebreak the last seen at a tied ts.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(
        (if (scanForward) col("_asof_ts").desc else col("_asof_ts").asc) +:
        Seq(col("_asof_is_left").asc,
          if (scanForward) col("_asof_tb").desc else col("_asof_tb").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned
      .withColumn("_asof_m", last(col("_asof_row"), ignoreNulls = true).over(w))
    val mTs = col("_asof_m").getField("_asof_struct_ts")

    val inTolerance = toleranceMs match {
      case Some(t) =>
        // timestamp cast("double") yields SECONDS → scale to ms;
        // numeric ts columns are already in the tolerance's unit
        val signed =
          if (scanForward)
            mTs.cast("double") - col("_asof_ts").cast("double")
          else
            col("_asof_ts").cast("double") - mTs.cast("double")
        val scaled = if (bothTimestamps) signed * 1000 else signed
        mTs.isNotNull && scaled <= t
      case None => mTs.isNotNull
    }

    carried
      .where(col("_asof_is_left") === 1)
      .select(
        leftCols.map(col) ++
          Seq(when(inTolerance, mTs).otherwise(lit(null))
                .as(s"asof_$rightTs")) ++
          rightValueCols.map(c =>
            when(inTolerance, col("_asof_m").getField(c))
              .otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
