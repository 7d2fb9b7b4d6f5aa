package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  private lazy val trades = Seq(
    (1L, t(10), "A", 100.0),
    (2L, t(20), "A", 101.0),
    (3L, t(5), "B", 50.0),
    (4L, t(30), "B", 51.0)
  ).toDF("trade_id", "ts", "sym", "px")

  private lazy val quotes = Seq(
    (101L, t(9), "A", 99.5),
    (102L, t(15), "A", 100.5),
    (103L, t(31), "B", 50.9), // after both B trades
    (104L, t(20), "A", 100.9) // exactly at trade 2's ts → inclusive
  ).toDF("quote_id", "ts", "sym", "bid")

  test("backward as-of join picks latest right row at-or-before left ts") {
    val out = AsOfJoin.backward(trades, quotes,
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid"))
      .select($"trade_id", $"asof_bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(99.5))   // quote at :09 for trade at :10
    assert(out(2L).contains(100.9))  // same-ts quote matches (inclusive)
    assert(out(3L).isEmpty)          // no B quote before :05
    assert(out(4L).isEmpty)          // B quote is at :31, after the trade
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.backward(trades, quotes,
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid"), toleranceMs = Some(60 * 1000L))
      .select($"trade_id", $"asof_bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(99.5))   // 1 min gap, inside tolerance
    assert(out(2L).contains(100.9))  // 0 gap
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("left rows and columns are all preserved") {
    val out = AsOfJoin.backward(trades, quotes,
      keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
      leftTiebreak = "trade_id", rightTiebreak = "quote_id",
      rightValueCols = Seq("bid"))
    assert(out.count() == trades.count())
    assert(Seq("trade_id", "ts", "sym", "px", "asof_ts", "asof_bid")
      .forall(out.columns.contains))
  }

  test("numeric ts columns: tolerance applies in the column's own unit") {
    // ts as plain longs (e.g. epoch seconds): tolerance is NOT scaled
    // by 1000 — it's in the column's unit
    val l = Seq((1L, 100L, "A"), (2L, 500L, "A")).toDF("id", "ts", "k")
    val r = Seq((10L, 95L, "A", 1.0), (11L, 200L, "A", 2.0))
      .toDF("rid", "ts", "k", "v")
    val out = AsOfJoin.backward(l, r,
        keyCols = Seq("k"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "id", rightTiebreak = "rid",
        rightValueCols = Seq("v"), toleranceMs = Some(10L))
      .select($"id", $"asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.0))  // gap 5 ≤ 10
    assert(out(2L).isEmpty)        // gap 300 > 10 → stale
  }

  test("mixed timestamp/numeric ts columns are rejected") {
    val l = Seq((1L, 100L, "A")).toDF("id", "ts", "k")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, quotes.withColumnRenamed("sym", "k"),
        keyCols = Seq("k"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid"))
    }
  }

  test("reserved working-column names are rejected up front") {
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades.withColumn("_asof_m_ts", lit(1)), quotes,
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades,
        quotes.withColumnRenamed("bid", "_asof_struct_ts"),
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("_asof_struct_ts"))
    }
  }

  test("forward as-of join picks earliest right row at-or-after left ts") {
    val out = AsOfJoin.forward(trades, quotes,
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid"))
      .select($"trade_id", $"asof_bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(100.5))  // next A quote after :10 is :15
    assert(out(2L).contains(100.9))  // same-ts quote matches (inclusive)
    assert(out(3L).contains(50.9))   // next B quote after :05 is :31
    assert(out(4L).contains(50.9))   // :31 quote after the :30 trade
  }

  test("forward tolerance nulls out far-future matches") {
    val out = AsOfJoin.forward(trades, quotes,
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid"), toleranceMs = Some(5 * 60 * 1000L))
      .select($"trade_id", $"asof_bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(100.5))  // 5 min gap, at tolerance edge
    assert(out(2L).contains(100.9))  // 0 gap
    assert(out(3L).isEmpty)          // :05 → :31 is 26 min, too far
    assert(out(4L).contains(50.9))   // 1 min gap
  }

  test("single shuffle: no join node in the physical plan") {
    val out = AsOfJoin.backward(trades, quotes,
      keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
      leftTiebreak = "trade_id", rightTiebreak = "quote_id",
      rightValueCols = Seq("bid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not use a join:\n$plan")
  }

  test("matched ts and values come from the SAME right row when values are null") {
    // right rows: (ts=9, bid=100), (ts=15, bid=NULL); a left row at 20
    // must get (15, NULL) — per-column carries would smear (15, 100)
    val q = Seq(
      (101L, t(9), "A", Some(100.0)),
      (102L, t(15), "A", None: Option[Double])
    ).toDF("quote_id", "ts", "sym", "bid")
    val l = Seq((1L, t(20), "A", 1.0)).toDF("trade_id", "ts", "sym", "px")
    val out = AsOfJoin.backward(l, q,
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid"))
      .select($"asof_ts", $"asof_bid").collect().head
    assert(out.getAs[Timestamp]("asof_ts") == t(15), out.toString)
    assert(out.isNullAt(1), s"null bid smeared over by an older row: $out")
    // and with a tolerance that excludes ts=9 but includes ts=15, the
    // match must still be (15, NULL) — not a stale out-of-tolerance 100
    val tol = AsOfJoin.backward(l, q,
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid"), toleranceMs = Some(6 * 60 * 1000L))
      .select($"asof_ts", $"asof_bid").collect().head
    assert(tol.getAs[Timestamp]("asof_ts") == t(15), tol.toString)
    assert(tol.isNullAt(1), tol.toString)
  }

  test("null keys never match (equi-join semantics)") {
    val l = Seq((1L, t(20), Option.empty[String], 1.0))
      .toDF("trade_id", "ts", "sym", "px")
    val q = Seq((101L, t(9), Option.empty[String], 99.5))
      .toDF("quote_id", "ts", "sym", "bid")
    val out = AsOfJoin.backward(l, q,
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid"))
      .select($"asof_bid").collect()
    assert(out.length == 1 && out.head.isNullAt(0),
      s"null key matched a null-key right row: ${out.toSeq}")
  }

  test("output-name collisions are rejected up front") {
    val l = trades.withColumn("asof_bid", lit(1))
    val e = intercept[IllegalArgumentException](
      AsOfJoin.backward(l, quotes,
        keyCols = Seq("sym"), leftTs = "ts", rightTs = "ts",
        leftTiebreak = "trade_id", rightTiebreak = "quote_id",
        rightValueCols = Seq("bid")))
    assert(e.getMessage.contains("asof_bid"), e.getMessage)
  }
}
