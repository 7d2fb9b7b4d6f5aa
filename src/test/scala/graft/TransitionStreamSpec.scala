package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.EventsAnalytics
import graft.streaming.EventsStream
import graft.streaming.EventsStream.Event

class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def pairCounts(rows: Seq[(String, String)]): Map[(String, String), Int] =
    rows.groupBy(identity).map { case (k, v) => k -> v.size }

  test("streaming transitions drained equal the batch operator's pair counts") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(0), 1, "view", 0.0),
      Event(2, ts(5), 1, "click", 0.0),
      Event(3, ts(9), 1, "view", 0.0),
      Event(4, ts(12), 1, "purchase", 0.0),
      Event(5, ts(2), 2, "view", 0.0),
      Event(6, ts(7), 2, "view", 0.0),
      Event(7, ts(1), 3, "click", 0.0)) // single event: no edge
    val mem = MemoryStream[Event]
    // the split below reorders across users by up to ~10 min of event
    // time; the watermark delay must cover that disorder or the second
    // batch's older rows are (correctly) dropped as late
    val q = EventsStream.transitionStream(mem.toDS(),
        watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("trans_drain")
      .outputMode(OutputMode.Append()).start()
    try {
      // two arbitrary micro-batch splits — edges must not depend on
      // the split point
      mem.addData(events.take(3): _*)
      q.processAllAvailable()
      mem.addData(events.drop(3): _*)
      q.processAllAvailable()
      // sentinel pushes the watermark past every tail event so the
      // final pending edges flush (a single event emits no edge, so
      // the pair sets stay comparable)
      mem.addData(Event(99, ts(10000), 99, "zz", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("trans_drain")
        .select("from_type", "to_type").as[(String, String)].collect().toSeq
      val batch = EventsAnalytics.transitionMatrix(
          events.toDF(), "user_id", "ts", "event_type", "event_id")
        .select(col("from_type"), col("to_type"), col("n"))
        .as[(String, String, Long)].collect()
        .flatMap { case (f, t, n) => Seq.fill(n.toInt)((f, t)) }.toSeq
      assert(pairCounts(streamed) == pairCounts(batch),
        s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("a late event re-links the chain instead of dangling off the tail") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.transitionStream(mem.toDS(),
        watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("trans_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // a(0:00) and c(0:20) arrive first; watermark holds at 0:00 −
      // 30min, so neither pair is final and nothing emits
      mem.addData(Event(1, ts(0), 1, "a", 0.0),
        Event(3, ts(20), 1, "c", 0.0))
      q.processAllAvailable()
      assert(spark.table("trans_late").isEmpty,
        "no edge may emit while a late insert is still admissible")
      // late b(0:10) lands BETWEEN them — admissible (wm ≈ −0:30)
      mem.addData(Event(2, ts(10), 1, "b", 0.0))
      q.processAllAvailable()
      // push the watermark past everything → chain flushes via timeout
      mem.addData(Event(9, ts(600), 2, "z", 0.0))
      q.processAllAvailable()
      val out = spark.table("trans_late")
        .where(col("user_id") === 1L)
        .orderBy("from_ts")
        .select("from_type", "to_type").as[(String, String)].collect().toSeq
      // the naive last-seen linker would emit a→c plus a dangling edge
      assert(out == Seq("a" -> "b", "b" -> "c"), out.toString)
    } finally q.stop()
  }

  test("an edge spanning micro-batches emits exactly once") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.transitionStream(mem.toDS())
      .writeStream.format("memory").queryName("trans_span")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Event(1, ts(0), 1, "a", 0.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(500), 1, "b", 0.0)) // long idle gap
      q.processAllAvailable()
      mem.addData(Event(3, ts(510), 1, "c", 0.0))
      q.processAllAvailable()
      mem.addData(Event(99, ts(10000), 99, "zz", 0.0)) // flush the tail
      q.processAllAvailable()
      val out = spark.table("trans_span")
        .select("from_type", "to_type").as[(String, String)].collect().toSeq
      assert(pairCounts(out) == Map(("a", "b") -> 1, ("b", "c") -> 1),
        out.toString)
    } finally q.stop()
  }

  test("idle eviction drops the chain head; a post-idle event starts fresh") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.transitionStream(mem.toDS(),
        evictAfterIdleMs = Some(60L * 60 * 1000)) // 1 hour
      .writeStream.format("memory").queryName("trans_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Event(1, ts(0), 1, "a", 0.0),
        Event(2, ts(5), 1, "b", 0.0))
      q.processAllAvailable()
      // another user's events push the watermark 10 hours out → user
      // 1's idle timer fires and the head (b) is evicted
      mem.addData(Event(8, ts(600), 2, "x", 0.0))
      q.processAllAvailable()
      mem.addData(Event(9, ts(610), 2, "y", 0.0))
      q.processAllAvailable()
      // user 1 returns: no b→c edge may emit across the evicted gap
      mem.addData(Event(3, ts(620), 1, "c", 0.0),
        Event(4, ts(625), 1, "d", 0.0))
      q.processAllAvailable()
      val u1 = spark.table("trans_evict")
        .where(col("user_id") === 1L)
        .select("from_type", "to_type").as[(String, String)].collect().toSeq
      assert(pairCounts(u1) == Map(("a", "b") -> 1, ("c", "d") -> 1),
        u1.toString)
    } finally q.stop()
  }

  test("batch-mode transitionStream equals transitionMatrix pair extraction") {
    implicit val s = spark
    val events = Seq(
      Event(1, ts(0), 1, "view", 0.0),
      Event(2, ts(5), 1, "click", 0.0),
      Event(3, ts(5), 1, "view", 0.0), // ts tie → event_id order
      Event(4, ts(9), 2, "view", 0.0))
    val got = EventsStream.transitionStream(events.toDS())
      .select("from_type", "to_type").as[(String, String)].collect().toSeq
    assert(pairCounts(got) == Map(("view", "click") -> 1, ("click", "view") -> 1),
      got.toString)
  }
}
