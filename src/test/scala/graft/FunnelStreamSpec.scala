package graft

import java.sql.Timestamp

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.EventsAnalytics
import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, FunnelUpdate}

class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val steps = Seq("view", "click", "purchase")

  /** Runs a streaming funnel over `mem`, folding update-mode emissions
    * into latest-state-per-user (update semantics: later batches
    * replace earlier rows for the same key — a memory-sink max() can't
    * express that, because a later update may carry SMALLER times).
    */
  private class Harness(mem: MemoryStream[Event], watermarkDelay: String,
      evictAfterIdleMs: Option[Long] = None) {
    val latest = TrieMap.empty[Long, (Int, List[Timestamp])]
    private val q = EventsStream
      .streamingFunnel(mem.toDS(), steps, watermarkDelay,
        evictAfterIdleMs)(spark)
      .writeStream
      .foreachBatch { (ds: Dataset[FunnelUpdate], _: Long) =>
        ds.collect().foreach(u =>
          latest.update(u.user_id, (u.steps_reached, u.step_times)))
      }
      .outputMode(OutputMode.Update()).start()
    def feed(events: Event*): Unit = {
      mem.addData(events: _*); q.processAllAvailable()
    }
    def stop(): Unit = q.stop()
  }

  test("late earlier step-1 event re-qualifies a rejected step-2 time") {
    val h = new Harness(MemoryStream[Event], "3 hours")
    try {
      // batch 1: click@60 with NO view yet — funnel stuck at 0 steps
      h.feed(Event(1, ts(60), 1, "click", 0))
      assert(h.latest(1L)._1 == 0)
      // batch 2: the view arrives LATE but admissibly, at minute 30 —
      // the retained click@60 must now qualify as step 2
      h.feed(Event(2, ts(30), 1, "view", 0))
      assert(h.latest(1L) == ((2, List(ts(30), ts(60)))),
        s"late view must re-qualify the stored click: ${h.latest(1L)}")
    } finally h.stop()
  }

  test("an earlier step-2 event lowers the chain (not first-wins)") {
    val h = new Harness(MemoryStream[Event], "3 hours")
    try {
      h.feed(Event(1, ts(10), 1, "view", 0), Event(2, ts(50), 1, "click", 0))
      assert(h.latest(1L) == ((2, List(ts(10), ts(50)))))
      h.feed(Event(3, ts(20), 1, "click", 0)) // earlier qualifying click
      assert(h.latest(1L) == ((2, List(ts(10), ts(20)))))
    } finally h.stop()
  }

  test("streaming funnel agrees with the batch twin on the events table") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event].collect().toSeq
    // adversarial split: reverse event-id order across three batches,
    // so most users' steps arrive out of order
    val chunks = events.sortBy(-_.event_id)
      .grouped(math.max(1, events.size / 3 + 1)).toSeq
    // generous watermark delay: nothing is ever inadmissible here
    val h = new Harness(MemoryStream[Event], "365 days")
    try {
      chunks.foreach(c => h.feed(c: _*))
      // restrict to users with ≥1 step-type event: the stream filters
      // non-step events before grouping, so a user with only 'error'
      // events never forms a group (and funnelTimes would emit an
      // all-null row for them)
      val batch = EventsAnalytics.funnelTimes(
          Tables.events(spark, sfDir)
            .where(col("event_type").isin(steps.map(x => x: Any): _*)),
          "user_id", "ts", "event_type", steps)
        .select(col("user_id"), col("step_1"), col("step_2"), col("step_3"))
        .distinct().collect()
        .map { r =>
          val times = (1 to 3).map(i => Option(r.getTimestamp(i)))
            .takeWhile(_.isDefined).flatten.toList
          r.getLong(0) -> times
        }.toMap
      assert(h.latest.keySet == batch.keySet)
      for ((u, bTimes) <- batch) {
        assert(h.latest(u) == ((bTimes.length, bTimes)),
          s"user $u: stream=${h.latest(u)} batch=$bTimes")
      }
    } finally h.stop()
  }

  test("idle users are evicted and restart from an empty chain") {
    // 0s watermark delay: wm = max event time seen; 1-minute idle
    // horizon anchored at the user's last EVENT time
    val h = new Harness(MemoryStream[Event], "0 seconds",
      evictAfterIdleMs = Some(60000L))
    try {
      h.feed(Event(1, ts(10), 1, "view", 0))
      assert(h.latest(1L)._1 == 1)
      // push the watermark far past user 1's idle horizon (10min+1min);
      // the timeout is evaluated against the NEW watermark on the batch
      // after the one that advanced it, hence two feeds
      h.feed(Event(2, ts(500), 2, "view", 0))
      h.feed(Event(3, ts(510), 2, "view", 0))
      // user 1 returns after the idle gap: the pre-idle view was
      // evicted, so this click has no qualifying view — chain restarts
      h.feed(Event(4, ts(515), 1, "click", 0))
      assert(h.latest(1L)._1 == 0,
        s"evicted user must restart from empty: ${h.latest(1L)}")
    } finally h.stop()
  }

  test("batch input runs the same operator and matches funnelTimes") {
    val df = Seq(
      Event(1, ts(10), 7, "view", 0),
      Event(2, ts(5), 7, "purchase", 0),
      Event(3, ts(20), 7, "click", 0),
      Event(4, ts(30), 7, "purchase", 0)).toDS()
    val out = EventsStream.streamingFunnel(df, steps)(spark)
      .collect().map(u => u.user_id -> ((u.steps_reached, u.step_times))).toMap
    assert(out(7L) == ((3, List(ts(10), ts(20), ts(30)))))
  }
}
