package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventsAnalytics

class EventsAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val log = Seq(
    // user 1 completes view -> click -> purchase in order
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:01:00"), "click"),
    (1L, ts("2024-01-01 10:02:00"), "purchase"),
    // user 2: purchase BEFORE view/click — strict ordering must not count it
    (2L, ts("2024-01-01 09:00:00"), "purchase"),
    (2L, ts("2024-01-01 10:00:00"), "view"),
    (2L, ts("2024-01-01 10:30:00"), "click"),
    // user 3: click only — never enters the funnel (no view)
    (3L, ts("2024-01-01 11:00:00"), "click"),
    // user 4: view then click at the SAME instant — strict > excludes it
    (4L, ts("2024-01-01 12:00:00"), "view"),
    (4L, ts("2024-01-01 12:00:00"), "click"))
    .toDF("user_id", "ts", "event_type")

  test("funnelCounts enforces strict event ordering per user") {
    val out = EventsAnalytics.funnelCounts(log, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].head()
    // step1: users 1,2,4 viewed; step2: 1,2 clicked after view
    // (user 4's same-instant click fails strict >); step3: only user 1
    assert(out == ((3L, 2L, 1L)))
  }

  test("funnelTimes picks the EARLIEST qualifying event per step") {
    val repeat = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:03:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val t2 = EventsAnalytics.funnelTimes(repeat, "user_id", "ts",
        "event_type", Seq("view", "click"))
      .select("step_2").distinct().as[Timestamp].head()
    assert(t2 == ts("2024-01-01 10:03:00"))
  }

  test("funnel chains all steps over ONE user_id exchange") {
    val plan = EventsAnalytics.funnelCounts(
        Tables.events(spark, sfDir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning(user_id"))
    assert(exchanges == 1,
      s"expected one user_id exchange for the whole funnel, got $exchanges:\n$plan")
  }

  test("resampleDaily fills gaps with zero over each user's span") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2.0),
      (1L, ts("2024-01-01 12:00:00"), 3.0),
      (1L, ts("2024-01-04 09:00:00"), 5.0), // 2 gap days
      (2L, ts("2024-02-10 00:00:00"), 7.0)) // single-day span
      .toDF("user_id", "ts", "value")
    val out = EventsAnalytics.resampleDaily(events, "user_id", "ts", "value")
      .orderBy("user_id", "day")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 5.0), (1L, "2024-01-02", 0.0),
      (1L, "2024-01-03", 0.0), (1L, "2024-01-04", 5.0),
      (2L, "2024-02-10", 7.0)))
  }

  test("resampleDailyFfill carries the last observed day forward") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2.0),
      (1L, ts("2024-01-04 09:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val out = EventsAnalytics.resampleDailyFfill(events, "user_id", "ts", "value")
      .orderBy("user_id", "day")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 2.0), (1L, "2024-01-02", 2.0),
      (1L, "2024-01-03", 2.0), (1L, "2024-01-04", 5.0)))
  }

  test("resampleDailyFfill: an observed day of all-NULL values zeros, not fills") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    val events = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, ts("2024-01-01 10:00:00"), 5.0),
      Row(1L, ts("2024-01-02 10:00:00"), null), // observed, NULL value
      Row(1L, ts("2024-01-03 10:00:00"), 7.0)), schema)
    val out = EventsAnalytics.resampleDailyFfill(events, "user_id", "ts", "value")
      .orderBy("day").as[(Long, String, Double)].collect().toSeq
    // day2 is OBSERVED (its events just carry no value) — it must
    // contribute 0.0 like the zero-fill variant, not inherit day1's 5.0
    assert(out == Seq(
      (1L, "2024-01-01", 5.0), (1L, "2024-01-02", 0.0),
      (1L, "2024-01-03", 7.0)))
  }

  test("retention counts each user once per (cohort, offset)") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort 01-01
      (1L, ts("2024-01-01 18:00:00")), // same day, dedup to one row
      (1L, ts("2024-01-03 10:00:00")), // offset 2
      (2L, ts("2024-01-01 12:00:00")), // cohort 01-01
      (2L, ts("2024-01-02 12:00:00")), // offset 1
      (3L, ts("2024-01-02 09:00:00"))) // cohort 01-02
      .toDF("user_id", "ts")
    val out = EventsAnalytics.retention(events, "user_id", "ts")
      .orderBy("cohort_day", "day_offset")
      .as[(String, Int, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("transitionMatrix counts consecutive pairs per user, row-normalized") {
    val events = Seq(
      // user 1: view -> click -> view -> purchase
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 10:01:00"), "click"),
      (1L, 12L, ts("2024-01-01 10:02:00"), "view"),
      (1L, 13L, ts("2024-01-01 10:03:00"), "purchase"),
      // user 2: view -> view (no cross-user pair with user 1's tail)
      (2L, 20L, ts("2024-01-01 09:00:00"), "view"),
      (2L, 21L, ts("2024-01-01 09:05:00"), "view"),
      // user 3: single event — no transition at all
      (3L, 30L, ts("2024-01-01 08:00:00"), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = EventsAnalytics.transitionMatrix(
        events, "user_id", "ts", "event_type", tieCol = "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // user 1: view->click, click->view, view->purchase; user 2:
    // view->view; user 3 contributes nothing. From view: 3 total.
    assert(out == Seq(
      ("click", "view", 1L, 1L, 1.0),
      ("view", "click", 1L, 3L, 1.0 / 3.0),
      ("view", "purchase", 1L, 3L, 1.0 / 3.0),
      ("view", "view", 1L, 3L, 1.0 / 3.0)))
  }

  test("topPaths orders within (user, day), caps length, ranks by count") {
    val events = Seq(
      // user 1 day 1: c-b-a by arrival, a-b-c by (ts, id)
      (1L, 12L, ts("2024-01-01 10:02:00"), "c"),
      (1L, 11L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
      // user 2 day 1: the same a>b>c path
      (2L, 20L, ts("2024-01-01 09:00:00"), "a"),
      (2L, 21L, ts("2024-01-01 09:01:00"), "b"),
      (2L, 22L, ts("2024-01-01 09:02:00"), "c"),
      // user 1 day 2: single event
      (1L, 13L, ts("2024-01-02 08:00:00"), "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = EventsAnalytics.topPaths(events, "user_id", "ts",
        "event_type", "event_id", maxLen = 8, k = 10)
      .as[(String, Long)].collect().toList
    assert(out == List(("a>b>c", 2L), ("a", 1L)), out.toString)
    // maxLen truncates to the FIRST events in time order
    val capped = EventsAnalytics.topPaths(events, "user_id", "ts",
        "event_type", "event_id", maxLen = 2, k = 10)
      .as[(String, Long)].collect().toList
    assert(capped == List(("a>b", 2L), ("a", 1L)), capped.toString)
    // same-instant events order by the tie column
    val tied = Seq(
      (1L, 2L, ts("2024-01-01 10:00:00"), "y"),
      (1L, 1L, ts("2024-01-01 10:00:00"), "x"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val tp = EventsAnalytics.topPaths(tied, "user_id", "ts",
        "event_type", "event_id", maxLen = 8, k = 10)
      .as[(String, Long)].collect().toList
    assert(tp == List(("x>y", 1L)), tp.toString)
  }

  test("rollingActive: hand-computed dau and trailing window, gap days emit 0s") {
    val log = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"), // same user+day dedups
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-03 10:00:00"), "view"),
      (3L, ts("2024-01-05 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = EventsAnalytics.rollingActive(log, "user_id", "ts",
        windowDays = 3)
      .orderBy("day").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      // day, dau, distinct users over the trailing 3 days
      ("2024-01-01", 2L, 2L),
      ("2024-01-02", 0L, 2L), // gap day still inside user 1+2's window
      ("2024-01-03", 1L, 2L),
      ("2024-01-04", 0L, 1L), // only user 1's day-3 activity remains
      ("2024-01-05", 1L, 2L)), out.toString)
  }

  test("rollingActive plan: ONE events scan, equality-free of range joins") {
    val plan = EventsAnalytics.rollingActive(
        Tables.events(spark, sfDir), "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // dau, rolling, calendar spine and gap fill all ride one pass —
    // a second scan here is the 3x-events-reads regression this plan
    // was rewritten to kill
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected ONE events scan, got $scans:\n$plan")
  }

  test("decayedEngagement: hand-computed staircase weights; halvingDays changes the step") {
    val log = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-03 10:00:00"), 20.0),
      (2L, ts("2024-01-02 10:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    // halvingDays=2: ages vs max day (Jan 3) are 2,0,1 → weights
    // 2^-1, 2^0, 2^0
    val h2 = EventsAnalytics.decayedEngagement(log, "user_id", "ts",
        "value", halvingDays = 2)
      .orderBy("user_id").as[(Long, Double)].collect().toList
    assert(h2 == List((1L, 25.0), (2L, 5.0)), h2.toString)
    // halvingDays=1: weights 2^-2, 2^0, 2^-1
    val h1 = EventsAnalytics.decayedEngagement(log, "user_id", "ts",
        "value", halvingDays = 1)
      .orderBy("user_id").as[(Long, Double)].collect().toList
    assert(h1 == List((1L, 22.5), (2L, 2.5)), h1.toString)
  }

  test("engagement ledger: exactly-once ingest; served scores equal the batch scorer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-eng").toString
    val all = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value")
    // split by EVENT id so the same (user, day) spans both batches —
    // serving must merge cross-batch decimal partials exactly
    val b1 = all.where($"event_id" % 2 === 0)
    val b2 = all.where($"event_id" % 2 =!= 0)
    val ingest = EventsAnalytics.engagementLedgerIngest(
      "user_id", "ts", "value", dir) _
    ingest(b1, 1L)
    ingest(b2, 2L)
    ingest(b1, 1L) // replayed batch id: must be a no-op
    assert(spark.read.parquet(s"$dir/ingest_log").count() == 2)
    val served = EventsAnalytics.serveDecayedEngagement(spark, dir,
      halvingDays = 2)
    val batch = EventsAnalytics.decayedEngagement(all, "user_id", "ts",
        "value", halvingDays = 2)
      .withColumnRenamed("user_id", "user")
    assertSameRows(served, batch)

    // compaction: one row per (user, day), serve unchanged, replay
    // guard preserved, further ingest continues on the compacted path
    val dir2 = java.nio.file.Files.createTempDirectory("graft-eng2").toString
    EventsAnalytics.compactEngagementLedger(spark, dir, dir2)
    assertSameRows(
      EventsAnalytics.serveDecayedEngagement(spark, dir2, halvingDays = 2),
      served)
    val rows = spark.read.parquet(s"$dir2/daily")
    assert(rows.count() ==
      rows.select("user", "day").distinct().count(),
      "compacted ledger must hold one row per (user, day)")
    ingest2(dir2)(b1, 1L) // replayed old batch id: still a no-op
    // round 18: the carried log arrives FOLDED at the new path — zero
    // tail files, one compact file, and the replay guard (including
    // compacted history — the ids live nowhere else) still refuses
    import graft.sources.BatchLog
    assert(BatchLog.tailFiles(spark, s"$dir2/ingest_log").isEmpty,
      "compacted ledger's log must arrive folded")
    assert(BatchLog.hasCompact(spark, s"$dir2/ingest_log"))
    assert(BatchLog.contains(spark, s"$dir2/ingest_log", 2L))
    assert(!BatchLog.contains(spark, s"$dir2/ingest_log", 7L))
    assertSameRows(
      EventsAnalytics.serveDecayedEngagement(spark, dir2, halvingDays = 2),
      served)
    // life goes on: a genuinely new batch ingests on the compacted
    // path and logs to a fresh tail
    ingest2(dir2)(b2.limit(0), 3L) // empty batch still guards its id
    assert(BatchLog.contains(spark, s"$dir2/ingest_log", 3L))
    // in-place compaction refused
    val e = intercept[IllegalArgumentException](
      EventsAnalytics.compactEngagementLedger(spark, dir2, dir2))
    assert(e.getMessage.contains("FRESH"))
  }

  private def ingest2(path: String) =
    EventsAnalytics.engagementLedgerIngest("user_id", "ts", "value", path) _

  test("transitionMatrix breaks timestamp ties by the tie column") {
    // two same-instant events: order must follow event_id, not arrival
    val events = Seq(
      (1L, 2L, ts("2024-01-01 10:00:00"), "b"),
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 3L, ts("2024-01-01 10:01:00"), "c"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = EventsAnalytics.transitionMatrix(
        events, "user_id", "ts", "event_type", tieCol = "event_id")
      .orderBy("from_type")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 1L, 1L, 1.0), ("b", "c", 1L, 1L, 1.0)))
  }

  test("dailyAnomalies: spike flags against the 7 preceding days; partial and flat baselines emit null") {
    // type "a": 8 quiet days (counts 4,5,4,5,4,5,4,5) then a 20-event
    // spike; type "flat": constant 3/day — zero variance, never scored
    def burst(t: String, day: Int, n: Int) = (1 to n).map(i =>
      (t, ts(f"2024-01-${day}%02d 10:${i % 60}%02d:${i / 60}%02d")))
    val counts = Seq(4, 5, 4, 5, 4, 5, 4, 5)
    val events = (counts.zipWithIndex.flatMap { case (n, i) =>
      burst("a", i + 1, n)
    } ++ burst("a", 9, 20) ++ (1 to 9).flatMap(d => burst("flat", d, 3)))
      .toDF("event_type", "ts")
    val out = EventsAnalytics.dailyAnomalies(events, "event_type", "ts",
        window = 7, zThreshold = 2.0)
      .select(col("event_type"), dayofmonth(col("d")).as("day"),
        col("n"), col("z"), col("is_anomaly"))
      .as[(String, Int, Long, Option[Double], Boolean)]
      .collect().toSeq.sortBy(t => (t._1, t._2))
    val a = out.filter(_._1 == "a")
    // days 1-7 lack a full baseline: z null, never flagged
    assert(a.take(7).forall(r => r._4.isEmpty && !r._5), a.toString)
    // day 8 (count 5 vs baseline 4,5,4,5,4,5,4): ordinary, unflagged
    val d8 = a(7)
    assert(d8._4.isDefined && !d8._5, d8.toString)
    // the planted spike flags; z matches the hand-computed sample
    // z-score of 20 against (5,4,5,4,5,4,5): mean 32/7, var from the
    // integer numerator (7·148 − 32²)/42
    val d9 = a(8)
    val zExp = (20.0 - 32.0 / 7.0) /
      math.sqrt((7.0 * 148 - 32.0 * 32) / 42.0)
    assert(d9._3 == 20L && d9._4.contains(zExp) && d9._5, d9.toString)
    // flat type: full window but zero variance — null, unflagged
    val f = out.filter(_._1 == "flat")
    assert(f.forall(r => r._4.isEmpty && !r._5), f.toString)
  }
}
