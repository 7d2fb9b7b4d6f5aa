package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bands = Seq(
    ("low", 0.0, 100.0),
    ("mid", 100.0, 300.0),   // touching boundaries: 100 is in both
    ("high", 300.0, 10000.0),
    ("vip", 5000.0, 20000.0) // overlapping with high
  ).toDF("band", "lo", "hi")

  private lazy val points = Tables.load(spark, sfDir, "customer")
    .select($"c_custkey", $"c_acctbal").where($"c_acctbal" >= 0)

  test("bucketed range join equals the naive BETWEEN join") {
    val fast = RangeJoin.pointInInterval(points, bands,
        "c_acctbal", "lo", "hi", bucket = 250.0)
      .select($"c_custkey", $"band")
    val naive = points.join(bands,
        $"c_acctbal" >= $"lo" && $"c_acctbal" <= $"hi")
      .select($"c_custkey", $"band")
    assertSameRows(fast, naive)
    assert(fast.count() > points.count(), "overlaps must duplicate points")
  }

  test("bucketed range join is an equi hash join, not nested-loop") {
    val fast = RangeJoin.pointInInterval(points, bands,
      "c_acctbal", "lo", "hi", bucket = 250.0)
    fast.collect()
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"degenerated to nested loop:\n$plan")
    assert(plan.contains("HashJoin"), s"expected hash join:\n$plan")
  }
}
