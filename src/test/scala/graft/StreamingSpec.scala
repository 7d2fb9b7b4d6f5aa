package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventsStream
import graft.streaming.EventsStream.Event

final case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming tumbling counts match the batch twin on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0),
      Event(4, ts(70), 1, "click", 4.0),
      Event(5, ts(130), 2, "view", 5.0))

    val mem = MemoryStream[Event]
    val q = EventsStream.tumblingCounts(mem.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = EventsStream.tumblingCounts(events.toDF())
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.size == 4)
    } finally q.stop()
  }

  test("streaming rolling actives: finalized windows match the batch report's non-zero rows") {
    implicit val sqlCtx = spark.sqlContext
    def dts(day: Int, h: Int) =
      Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val main = Seq(
      Event(1, dts(1, 10), 1, "view", 1.0),
      Event(2, dts(1, 11), 1, "click", 1.0), // same user+day dedups
      Event(3, dts(1, 9), 2, "view", 1.0),
      Event(4, dts(3, 10), 1, "view", 1.0),
      Event(5, dts(5, 10), 3, "view", 1.0))
    // far-future fencepost advances the watermark so every window over
    // the main data finalizes in append mode; its own windows (days
    // 20+) stay open and unemitted
    val fence = Event(6, dts(20, 0), 99, "view", 1.0)
    val mem = MemoryStream[Event]
    val q = EventsStream.rollingActiveStream(mem.toDF(), windowDays = 3)
      .writeStream.format("memory").queryName("rollact")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(main: _*)
      q.processAllAvailable()
      mem.addData(fence)
      q.processAllAvailable()
      val batch = graft.operators.EventsAnalytics.rollingActive(
          main.toDF(), "user_id", "ts", windowDays = 3)
        .where($"rolling_users" > 0)
        .select("day", "rolling_users")
        .as[(String, Long)].collect().toMap
      val maxDay = batch.keys.max
      val streamed = spark.table("rollact")
        .as[(String, Long)].collect().toMap
      assert(streamed.view.filterKeys(_ <= maxDay).toMap == batch,
        s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("watermark drops state for closed windows (append mode emits finalized rows)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.tumblingCounts(mem.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("wm")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Event(1, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      // advance event time far beyond hour 0 + watermark → window closes
      mem.addData(Event(2, ts(200), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("wm").collect()
      assert(out.length == 1, "exactly the closed window is emitted")
      assert(out.head.getTimestamp(0) == ts(0))
    } finally q.stop()
  }

  test("streaming sessionization matches the declarative batch twin") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val gap = 30 * 60 * 1000L // 30 min
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),   // same session
      Event(3, ts(120), 1, "click", 3.0),  // new session (gap 110min)
      Event(4, ts(5), 2, "view", 4.0),
      Event(5, ts(400), 1, "click", 5.0),  // third session → closes second
      Event(6, ts(410), 2, "view", 6.0))   // second session for user 2

    val mem = MemoryStream[Event]
    val q = EventsStream.sessionize(mem.toDS(), gap)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("sessions")
        .orderBy("user_id", "session_start").collect().toSeq

      // batch twin over the same rows: closed sessions only (a later
      // event exists after the gap)
      val batchAll = EventsStream.sessionizeBatch(events.toDF(), gap)
      val lastPerUser = events.groupBy(_.user_id)
        .map { case (u, es) => u -> es.map(_.ts.getTime).max }
      val closedBatch = batchAll.collect().toSeq.filter { r =>
        r.getAs[Timestamp]("session_end").getTime <
          lastPerUser(r.getAs[Long]("user_id")) - gap + 1
      }
      assert(streamed.map(_.getAs[Timestamp]("session_start")).toSet ==
        closedBatch.map(_.getAs[Timestamp]("session_start")).toSet)
      // user 1: sessions at minute 0-10 and 120 closed; user 2: minute 5 closed
      assert(streamed.count(_.getAs[Long]("user_id") == 1L) == 2)
      assert(streamed.count(_.getAs[Long]("user_id") == 2L) == 1)
      val first = streamed.head
      assert(first.getAs[Long]("n_events") == 2)
      assert(first.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("late-but-within-watermark event cannot regress the session window") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("slate")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Event(1, ts(60), 1, "a", 1.0)) // 01:00
      q.processAllAvailable() // watermark → 00:50
      // late event 00:55 ≥ watermark: must extend the window backwards,
      // not overwrite session_end down to 00:55
      mem.addData(Event(2, ts(55), 1, "a", 1.0))
      q.processAllAvailable()
      // 01:27 is 27 min after the TRUE session end (01:00) → same
      // session; an end regressed to 00:55 would wrongly split here
      mem.addData(Event(3, ts(87), 1, "a", 1.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(240), 2, "a", 1.0)) // watermark → 03:50, flush user 1
      q.processAllAvailable()
      val out = spark.table("slate")
        .where(col("user_id") === 1L).collect()
      assert(out.length == 1,
        s"late event split the session: ${out.mkString(", ")}")
      val r = out.head
      assert(r.getAs[Timestamp]("session_start") == ts(55), r.toString)
      assert(r.getAs[Timestamp]("session_end") == ts(87), r.toString)
      assert(r.getAs[Long]("n_events") == 3L, r.toString)
    } finally q.stop()
  }

  test("late events older than the live session by > gap close as their own session") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val gap = 10 * 60 * 1000L // 10 min
    val mem = MemoryStream[Event]
    val q = EventsStream.sessionize(mem.toDS(), gap,
        watermarkDelay = "60 minutes")
      .writeStream.format("memory").queryName("slate_old")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Event(1, ts(100), 1, "a", 1.0)) // live session [100,100]
      q.processAllAvailable() // watermark → minute 40
      // two late-but-within-watermark events, > gap OLDER than the live
      // session, within gap of EACH OTHER, arriving in SEPARATE
      // micro-batches: the batch twin (ascending order) makes them one
      // separate earlier session [50,55] — they must neither be
      // absorbed into the live session nor fragment into two sessions
      // because a batch boundary fell between them. (This is why
      // pending sessions park in state until the watermark passes
      // end+gap instead of emitting eagerly.)
      mem.addData(Event(2, ts(50), 1, "a", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(55), 1, "a", 3.0))
      q.processAllAvailable()
      // nothing is final yet: watermark (40) hasn't passed 55+gap
      assert(spark.table("slate_old").isEmpty,
        s"premature emission: ${spark.table("slate_old").collect().toSeq}")
      // advance the watermark past every deadline via another user
      mem.addData(Event(4, ts(600), 2, "a", 1.0))
      q.processAllAvailable()
      val all = spark.table("slate_old")
        .where(col("user_id") === 1L).orderBy("session_start").collect()
      assert(all.length == 2, s"got ${all.toSeq}")
      assert(all(0).getAs[Timestamp]("session_start") == ts(50))
      assert(all(0).getAs[Timestamp]("session_end") == ts(55))
      assert(all(0).getAs[Long]("n_events") == 2L)
      assert(all(0).getAs[Double]("total_value") == 5.0)
      assert(all(1).getAs[Timestamp]("session_start") == ts(100))
      assert(all(1).getAs[Timestamp]("session_end") == ts(100))
      assert(all(1).getAs[Long]("n_events") == 1L)
      // agrees with the batch twin over the same rows
      val batch = EventsStream.sessionizeBatch(Seq(
          Event(1, ts(100), 1, "a", 1.0), Event(2, ts(50), 1, "a", 2.0),
          Event(3, ts(55), 1, "a", 3.0)).toDF(), gap)
        .orderBy("session_start").collect()
      assert(batch.map(r => (r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"))).toSeq ==
        all.map(r => (r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"))).toSeq)
    } finally q.stop()
  }

  test("sessionize flushes an idle user's final session via event-time timeout") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val gap = 30 * 60 * 1000L
    val mem = MemoryStream[Event]
    val q = EventsStream.sessionize(mem.toDS(), gap)
      .writeStream.format("memory").queryName("sessions_timeout")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0),
                  Event(2, ts(10), 1, "click", 2.0))
      q.processAllAvailable()
      // session open, watermark (minute 10) below its timeout (40)
      assert(spark.table("sessions_timeout").isEmpty)
      // another user's event pushes the watermark past minute 40 →
      // user 1's state times out: final session flushed, state evicted
      mem.addData(Event(3, ts(120), 2, "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("sessions_timeout").collect()
      assert(out.length == 1, s"expected exactly the flushed session, got ${out.toSeq}")
      assert(out.head.getAs[Long]("user_id") == 1L)
      assert(out.head.getAs[Long]("n_events") == 2L)
      assert(out.head.getAs[Timestamp]("session_end") == ts(10))
      // user 2's own session (timeout minute 150) is still open
    } finally q.stop()
  }

  test("parquet sink + checkpoint survives stop-and-restart without loss or dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val mem = MemoryStream[Event]
    def start() = mem.toDF().writeStream.format("parquet")
      .option("checkpointLocation", s"$dir/ckpt").option("path", s"$dir/out")
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0),
                  Event(2, ts(1), 1, "click", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    mem.addData(Event(3, ts(2), 2, "view", 3.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(s"$dir/out")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"restart must resume from the committed offset exactly once, got $ids")
  }

  test("streaming dedup drops repeated ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0),  // dup id inside watermark
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(3), 1, "view", 2.0)) // dup across batches
      q.processAllAvailable()
      val out = spark.table("dedup").collect()
      assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join with watermarks") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val signups = MemoryStream[Event]
    val p = purchases.toDF().withWatermark("ts", "1 hour")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
              col("ts").as("p_ts"))
    val sg = signups.toDF().withWatermark("ts", "1 hour")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
              col("ts").as("s_ts"))
    // purchase joins a signup of the same user within the prior hour
    val joined = p.join(sg,
      col("p_user") === col("s_user") &&
      col("p_ts") >= col("s_ts") &&
      col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      signups.addData(Event(10, ts(0), 1, "signup", 0.0),
                      Event(11, ts(0), 2, "signup", 0.0))
      purchases.addData(
        Event(20, ts(30), 1, "purchase", 5.0),   // within the hour → joins
        Event(21, ts(90), 2, "purchase", 7.0),   // 90 min later → no join
        Event(22, ts(10), 3, "purchase", 9.0))   // no signup → no join
      q.processAllAvailable()
      val out = spark.table("ssj").collect()
      assert(out.length == 1)
      assert(out.head.getAs[Long]("p_id") == 20L)
      assert(out.head.getAs[Long]("s_id") == 10L)
    } finally q.stop()
  }

  test("streaming document dedup: exact by content hash, near by simhash") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val exact = Dedup.streamingExact(mem.toDF(), "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("sdedup_exact")
      .outputMode(OutputMode.Append()).start()
    val near = Dedup.streamingNearDup(mem.toDF(), "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("sdedup_near")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        StreamDoc(1, ts(0), "the quick brown fox jumps over the lazy dog"),
        StreamDoc(2, ts(1), "the quick brown fox jumps over the lazy dog"), // exact dup
        StreamDoc(3, ts(2), "an entirely different document about spark engines"))
      exact.processAllAvailable(); near.processAllAvailable()
      mem.addData( // dup across batches, inside watermark
        StreamDoc(4, ts(3), "the quick brown fox jumps over the lazy dog"))
      exact.processAllAvailable(); near.processAllAvailable()
      val exactIds = spark.table("sdedup_exact")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(exactIds == Seq(1L, 3L), s"exact dedup kept $exactIds")
      val nearIds = spark.table("sdedup_near")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(nearIds == Seq(1L, 3L), s"simhash dedup kept $nearIds")
    } finally { exact.stop(); near.stop() }
  }

  test("streaming decontamination flags near-copies of a static eval set, statelessly") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog and runs far away into the woods"),
      (101L, "completely unrelated benchmark prompt about distributed query engines")
    ).toDF("doc_id", "text")
    val mem = MemoryStream[StreamDoc]
    // caller-owned cache scope: batch cleanup (unpersistAll) running in
    // the same JVM must never release a streaming query's static-side
    // caches
    val scope = new Dedup.CacheScope
    val flagged = Dedup.streamingDecontaminate(
      mem.toDF(), eval, "doc_id", "text",
      shingleK = 2, numHashes = 32, bands = 16, threshold = 0.4,
      scope = scope)
    val q = flagged.writeStream.format("memory").queryName("sdecon")
      .outputMode(OutputMode.Append()).start()
    try {
      assert(scope.size == 2, s"expected hashed + banded eval caches, got ${scope.size}")
      mem.addData(
        // near-copy of eval 100 (one word changed)
        StreamDoc(1, ts(0), "the quick brown fox jumps over the lazy cat and runs far away into the woods"),
        // clean document
        StreamDoc(2, ts(1), "spark structured streaming joins a static dimension without state"))
      q.processAllAvailable()
      // a batch caller's cleanup between micro-batches must not touch
      // this stream's scope
      Dedup.unpersistAll()
      assert(scope.size == 2, "unpersistAll released streaming-owned caches")
      mem.addData( // exact copy of eval 101, later batch
        StreamDoc(3, ts(2), "completely unrelated benchmark prompt about distributed query engines"))
      q.processAllAvailable()
      val out = spark.table("sdecon")
        .select("id_left", "id_right").distinct()
        .as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 100L), (3L, 101L)), s"flags were $out")
      // stateless: the plan must not carry any stateful operator —
      // processAllAvailable has run, so progress MUST be populated
      val lastProgress = q.lastProgress
      assert(lastProgress != null, "no progress after processAllAvailable")
      assert(lastProgress.stateOperators.isEmpty,
        "streaming decontamination must be stateless, found state operators: " +
          lastProgress.stateOperators.mkString(", "))
    } finally { q.stop(); scope.release() }
  }

  test("streaming decontamination static-side bucket cap bounds boilerplate fanout") {
    // 20 copies of a boilerplate doc in the STATIC eval set: a streamed
    // copy of it would fan out 20 rows per colliding band per batch,
    // forever. The static cap (applied once, before the persisted
    // banded side) drops those buckets; the planted near-dup's
    // selective buckets survive.
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val boiler = "standard legal disclaimer header all rights reserved do not distribute"
    val planted = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    val eval = (
      (1 to 20).map(i => (100L + i, boiler)) :+ (200L, planted)
    ).toDF("doc_id", "text")
    val memStream = MemoryStream[StreamDoc]
    val scope = new Dedup.CacheScope
    val flagged = Dedup.streamingDecontaminate(
      memStream.toDF(), eval, "doc_id", "text",
      shingleK = 2, numHashes = 32, bands = 16, threshold = 0.4,
      maxStaticBucketSize = 8, scope = scope)
    val q = flagged.writeStream.format("memory").queryName("sdecon_cap")
      .outputMode(OutputMode.Append()).start()
    try {
      memStream.addData(
        StreamDoc(1, ts(0), planted), // copy of eval 200 → flagged
        StreamDoc(2, ts(1), boiler))  // hits only capped buckets → silent
      q.processAllAvailable()
      val out = spark.table("sdecon_cap")
        .select("id_left", "id_right").distinct()
        .as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 200L)),
        s"cap should keep only the planted pair, got $out")
    } finally { q.stop(); scope.release() }
  }

  test("exactly-once decontamination flags via foreachBatch per-pair dedup") {
    // streamingDecontaminate emits one row per colliding band (a
    // within-batch distinct would itself be a stateful aggregate);
    // the intended exactly-once consumption pattern is foreachBatch +
    // dropDuplicates over the pair key. This pins that pattern: an
    // exact copy collides in ALL bands, yet exactly one flag survives.
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog and runs far away into the woods")
    ).toDF("doc_id", "text")
    val mem = MemoryStream[StreamDoc]
    val scope = new Dedup.CacheScope
    val flagged = Dedup.streamingDecontaminate(
      mem.toDF(), eval, "doc_id", "text",
      shingleK = 2, numHashes = 32, bands = 16, threshold = 0.4,
      scope = scope)
    val rawRows = new java.util.concurrent.atomic.AtomicLong
    val sink = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long)]())
    val q = flagged.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        rawRows.addAndGet(batch.count())
        batch.dropDuplicates("id_left", "id_right")
          .select("id_left", "id_right").collect()
          .foreach(r => sink.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .start()
    try {
      mem.addData( // exact copy of eval 100 → collides in every band
        StreamDoc(1, ts(0), "the quick brown fox jumps over the lazy dog and runs far away into the woods"))
      q.processAllAvailable()
      mem.addData( // clean doc in a later batch → no new flags
        StreamDoc(2, ts(1), "spark structured streaming joins a static dimension without state"))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(rawRows.get() > 1,
        s"expected multi-band duplicate rows pre-dedup, got ${rawRows.get()}")
      assert(sink.asScala.toSeq == Seq((1L, 100L)),
        s"expected exactly one flag, got ${sink.asScala.toSeq}")
    } finally { q.stop(); scope.release() }
  }

  test("bounded-heap topk aggregate runs as a streaming leaderboard") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = mem.toDF().groupBy("event_type")
      .agg(graft.functions.TopK.topk(col("value"), col("event_id"), 2).as("top"))
      .select(col("event_type"), col("top.id").as("ids"))
      .writeStream.format("memory").queryName("stopk")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 5.0),
                  Event(2, ts(1), 1, "click", 9.0),
                  Event(3, ts(2), 2, "click", 1.0))
      q.processAllAvailable()
      def tops() = spark.table("stopk").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      assert(tops()("click") == List(2L, 1L))
      // a later batch displaces the weakest entry — the heap state
      // merges across micro-batches
      mem.addData(Event(4, ts(3), 2, "click", 7.0))
      q.processAllAvailable()
      assert(tops()("click") == List(2L, 4L))
    } finally q.stop()
  }

  test("streaming curation equals batch c01 survivors on id-ordered arrival") {
    import graft.operators.{Dedup, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    // batch truth: quality/repetition filters then min-id survivor
    // per content hash — c01's pre-aggregation row set
    val docs = Tables.load(spark, sfDir, "documents")
    val expected = docs
      .where(TextAnalysis.qualityScore(col("text")) >= 0.75 &&
        TextAnalysis.dupWordFrac(col("text")) <= 0.7)
      .withColumn("h", xxhash64(col("text")))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty && expected.size < docs.count(),
      "the probe needs both survivors and drops to be meaningful")

    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
      .map { case (id, text) => StreamDoc(id, ts(0), text) }
    val mem = MemoryStream[StreamDoc]
    val curated = Dedup.streamingCurate(
      mem.toDF(), "text", "ts", "1 hour")
    val q = curated.writeStream.format("memory").queryName("scurate")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("scurate").select("doc_id").as[Long]
        .collect().toSet
      assert(got == expected,
        s"streaming curation diverged from batch: extra=${got -- expected} " +
          s"missing=${expected -- got}")
    } finally q.stop()
  }

  test("streaming ledger admission drops known content, dedups in-stream, statelessly vs the snapshot") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sledger").toString
    val corpus = Seq((1L, "ledger alpha"), (2L, "ledger beta"))
      .toDF("doc_id", "text")
    Dedup.writeExactLedger(corpus, "text", dir)
    val mem = MemoryStream[StreamDoc]
    val admitted = Dedup.streamingAdmitAgainstExactLedger(
      mem.toDF(), "text", "ts", "1 hour", dir)
    val q = admitted.writeStream.format("memory").queryName("sledger")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        StreamDoc(10L, ts(0), "ledger alpha"),   // known → rejected
        StreamDoc(11L, ts(1), "fresh gamma"))    // new → admitted
      q.processAllAvailable()
      mem.addData(
        StreamDoc(12L, ts(2), "fresh gamma"),    // in-stream dup → state drops
        StreamDoc(13L, ts(3), "fresh delta"),    // new → admitted
        StreamDoc(14L, ts(4), "ledger beta"))    // known → rejected
      q.processAllAvailable()
      val got = spark.table("sledger").select("doc_id")
        .as[Long].collect().toSet
      assert(got == Set(11L, 13L),
        s"admission diverged: $got (want first arrivals of byte-new only)")
      // the admitted rows carry the hash the ledger append consumes
      assert(spark.table("sledger").columns.contains("content_hash"))
      // the plan is a stateless anti-join vs the snapshot + ONE dedup
      // state operator — no stream-stream join, no aggregation state
      val p = q.lastProgress
      assert(p == null || p.stateOperators.length <= 1)
    } finally {
      q.stop()
      Dedup.streamingScope.release()
    }
  }

  test("streaming BPE/unigram encode twins: row-identical to the batch encoders across micro-batch splits") {
    import graft.operators.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val merges = Seq(
      TextAnalysis.BpeMerge(0, "t", "h", 9L),
      TextAnalysis.BpeMerge(1, "th", "e", 9L),
      TextAnalysis.BpeMerge(2, "e", "r", 7L),
      TextAnalysis.BpeMerge(3, "o", "n", 7L),
      TextAnalysis.BpeMerge(4, "a", "n", 6L))
    val pieces = Seq(
      TextAnalysis.UnigramPiece("the", -1.5),
      TextAnalysis.UnigramPiece("th", -2.5),
      TextAnalysis.UnigramPiece("er", -2.0),
      TextAnalysis.UnigramPiece("an", -2.2),
      TextAnalysis.UnigramPiece("e", -3.0),
      TextAnalysis.UnigramPiece("a", -3.1))
    // real corpus text, split across micro-batches mid-stream — the
    // stateless twins must not care where the batch boundary falls
    val rows = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).take(120)
      .map { case (id, text) => StreamDoc(id, ts((id % 300).toInt), text) }
    val batchDf = rows.toSeq.toDF()
    def run(name: String)(mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Seq[String] = {
      val mem = MemoryStream[StreamDoc]
      val q = mk(mem.toDF()).writeStream.format("memory")
        .queryName(name).outputMode(OutputMode.Append()).start()
      try {
        val (a, b) = rows.splitAt(rows.length / 2)
        mem.addData(a.toIndexedSeq: _*)
        q.processAllAvailable()
        mem.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        spark.table(name).collect().map(_.toString).sorted.toSeq
      } finally q.stop()
    }
    def want(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(run("sbpenc")(s =>
        TextAnalysis.streamingBpeEncode(s, "doc_id", "text", merges)) ==
      want(TextAnalysis.bpeEncode(batchDf, "doc_id", "text", merges)),
      "streaming BPE encode diverged from batch")
    assert(run("sbpdoc")(s =>
        TextAnalysis.streamingBpeDocPieceCount(s, "doc_id", "text", merges)) ==
      want(TextAnalysis.bpeDocPieceCount(batchDf, "doc_id", "text", merges)),
      "streaming BPE doc piece count diverged from batch")
    assert(run("sugenc")(s =>
        TextAnalysis.streamingUnigramEncode(s, "doc_id", "text", pieces)) ==
      want(TextAnalysis.unigramEncode(batchDf, "doc_id", "text", pieces)),
      "streaming unigram encode diverged from batch")
    assert(run("sugdoc")(s =>
        TextAnalysis.streamingUnigramDocPieceCount(
          s, "doc_id", "text", pieces)) ==
      want(TextAnalysis.unigramDocPieceCount(batchDf, "doc_id", "text", pieces)),
      "streaming unigram doc piece count diverged from batch")
  }

  test("streaming quality score: row-identical to the batch scorer under frozen reference stats, across micro-batch splits") {
    import graft.operators.{Dedup, QualityModel}
    implicit val sqlCtx = spark.sqlContext
    // fixed literal model (the c09 stance); dim deliberately NOT a
    // power of two — the streaming twin's floorMod must match pmod
    // for any dim, unlike the oracle's unsigned-mod shortcut
    val model = QualityModel.LinearModel(60, -0.1,
      Array.tabulate(60)(j => ((j * 29) % 41 - 20) / 50.0))
    val rows = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).take(100)
      .map { case (id, text) => StreamDoc(id, ts((id % 300).toInt), text) }
    val batchDf = rows.toSeq.toDF()
    // frozen stats captured from the SAME frame the batch path
    // scores — the exact-parity configuration
    val stats = QualityModel.collectTfIdfStats(batchDf, "doc_id", "text")
    val mem = MemoryStream[StreamDoc]
    val q = QualityModel.streamingQualityScore(
        mem.toDF(), "doc_id", "text", model, stats)
      .writeStream.format("memory").queryName("squal")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("squal")
        .collect().map(_.toString).sorted.toSeq
      val batch = QualityModel.score(batchDf, "doc_id", "text", model)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        s"streaming quality score diverged from batch:\n" +
          streamed.zip(batch).filter(t => t._1 != t._2).take(3))
    } finally {
      q.stop()
      Dedup.unpersistAll()
    }
  }

  test("streaming ledger admission honors takedown tombstones: deleted content admits") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sledtd").toString
    Dedup.writeExactLedger(
      Seq((1L, "ledger alpha"), (2L, "ledger beta")).toDF("doc_id", "text"),
      "text", dir)
    // takedown before the stream starts: the snapshot the query binds
    // must already exclude the tombstoned hash
    Dedup.deleteFromExactLedger(
      Seq("ledger alpha").toDF("text"), "text", dir)
    val mem = MemoryStream[StreamDoc]
    val scope = new Dedup.CacheScope
    val admitted = Dedup.streamingAdmitAgainstExactLedger(
      mem.toDF(), "text", "ts", "1 hour", dir, scope)
    val q = admitted.writeStream.format("memory").queryName("sledtd")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        StreamDoc(10L, ts(0), "ledger alpha"),  // tombstoned → admitted
        StreamDoc(11L, ts(1), "ledger beta"))   // still ledgered → rejected
      q.processAllAvailable()
      val got = spark.table("sledtd").select("doc_id").as[Long]
        .collect().toSet
      assert(got == Set(10L),
        s"takedown not honored by streaming admission: $got")
    } finally {
      q.stop()
      scope.release()
    }
  }

  test("streaming LSH ingest: admit → dedup → index, probe-identical to a batch rebuild") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-lshing").toString
    // 8-word docs → 6 word-3-shingles; a one-word tail edit keeps
    // jaccard at 5/7 ≈ 0.714 ≥ 0.5 (near-dup), disjoint words → 0
    val d1 = "alpha beta gamma delta epsilon zeta eta theta"
    val d1e = "alpha beta gamma delta epsilon zeta eta iota"
    val a = "red orange yellow green blue indigo violet ultraviolet"
    val ae = "red orange yellow green blue indigo violet infrared"
    val b = "one two three four five six seven eight"
    val be = "one two three four five six seven nine"
    val c = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    Dedup.writeLshIndex(
      Seq((1L, d1)).toDF("doc_id", "text"), "doc_id", "text", dir)

    val mem = MemoryStream[StreamDoc]
    val q = mem.toDF().writeStream
      .foreachBatch(Dedup.lshIngestBatch("doc_id", "text", dir) _)
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        StreamDoc(10L, ts(0), d1e), // near-dup of indexed → rejected
        StreamDoc(11L, ts(1), a),   // fresh → admitted
        StreamDoc(12L, ts(2), b),   // fresh → admitted
        StreamDoc(13L, ts(3), be))  // in-batch near-dup of 12 → rejected
      q.processAllAvailable()
      mem.addData(
        StreamDoc(14L, ts(4), ae),  // near-dup of now-INDEXED 11 → rejected
        StreamDoc(15L, ts(5), c))   // fresh → admitted
      q.processAllAvailable()
    } finally q.stop()

    val storedIds = spark.read.parquet(s"$dir/hashes")
      .select("id").as[Long].collect().toSet
    assert(storedIds == Set(1L, 11L, 12L, 15L), storedIds.toString)
    val log = spark.read.parquet(s"$dir/ingest_log")
      .as[(Long, Long)].collect().toMap
    assert(log == Map(0L -> 2L, 1L -> 1L), log.toString)

    // probe-identical to a batch rebuild over the same surviving docs
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-lshrb").toString
    Dedup.writeLshIndex(
      Seq((1L, d1), (11L, a), (12L, b), (15L, c)).toDF("doc_id", "text"),
      "doc_id", "text", rebuilt)
    val probe = Seq((90L, d1e), (91L, ae), (92L, be), (93L, c), (94L, "zz yy xx ww vv uu tt ss"))
      .toDF("doc_id", "text")
    def probeRows(p: String) =
      Dedup.dedupAgainstLshIndex(probe, "doc_id", "text", p)
        .collect().map(_.toString).sorted.toSeq
    assert(probeRows(dir) == probeRows(rebuilt),
      s"ingested index probe diverged from rebuild:\n${probeRows(dir)}\n${probeRows(rebuilt)}")
    def selfRows(p: String) =
      Dedup.selfDedupFromLshIndex(spark, p).collect().map(_.toString).sorted.toSeq
    assert(selfRows(dir) == selfRows(rebuilt))
    Dedup.unpersistAll()
  }

  test("streaming LSH ingest: replayed batch is a no-op; crash-window duplicates are probe-invisible") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-lshrp").toString
    val d1 = "alpha beta gamma delta epsilon zeta eta theta"
    val a = "red orange yellow green blue indigo violet ultraviolet"
    Dedup.writeLshIndex(
      Seq((1L, d1)).toDF("doc_id", "text"), "doc_id", "text", dir)
    val batch = Seq((20L, a)).toDF("doc_id", "text")
    Dedup.lshIngestBatch("doc_id", "text", dir)(batch, 7L)
    def idRows() = spark.read.parquet(s"$dir/hashes").count()
    val afterFirst = idRows()
    // restarted stream re-offers the logged batch id → no-op
    Dedup.lshIngestBatch("doc_id", "text", dir)(batch, 7L)
    assert(idRows() == afterFirst, "replayed batch re-appended rows")

    // crash window: data landed but the log write was lost → the
    // replay re-appends byte-identical rows; probes must not change
    val probe = Seq((90L, "red orange yellow green blue indigo violet infrared"))
      .toDF("doc_id", "text")
    val cleanProbe = Dedup.dedupAgainstLshIndex(probe, "doc_id", "text", dir)
      .collect().map(_.toString).sorted.toSeq
    val cleanSelf = Dedup.selfDedupFromLshIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    Dedup.appendToLshIndex(batch, "doc_id", "text", dir) // the replay
    assert(idRows() == afterFirst * 2 - 1) // duplicate rows really exist
    val dupProbe = Dedup.dedupAgainstLshIndex(probe, "doc_id", "text", dir)
      .collect().map(_.toString).sorted.toSeq
    val dupSelf = Dedup.selfDedupFromLshIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(dupProbe == cleanProbe,
      s"duplicate index rows changed the probe:\n$dupProbe\n$cleanProbe")
    assert(dupSelf == cleanSelf)
    Dedup.unpersistAll()
  }

  test("lsh compaction crash window: append interleaved between log copy and data snapshot loses zero documents on stream resume") {
    import graft.operators.Dedup
    val src = java.nio.file.Files.createTempDirectory("graft-lshcw-s").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-lshcw-d").toString
    val d1 = "alpha beta gamma delta epsilon zeta eta theta"
    val a = "red orange yellow green blue indigo violet ultraviolet"
    val b = "one two three four five six seven eight"
    Dedup.writeLshIndex(
      Seq((1L, d1)).toDF("doc_id", "text"), "doc_id", "text", src)
    // batch 0 ingested + logged through the streaming loop
    Dedup.lshIngestBatch("doc_id", "text", src)(
      Seq((10L, a)).toDF("doc_id", "text"), 0L)
    Dedup.unpersistAll()
    // compaction leg 1: the ingest log copies FIRST (round-13 order) …
    Dedup.copyLshIngestLog(spark, src, dst)
    // … the adversarial interleave: batch 1 lands on src INSIDE the
    // compaction window (under the old log-last ordering this window,
    // mirrored, produced a logged-but-absent batch that a resumed
    // stream silently skipped — data loss) …
    Dedup.lshIngestBatch("doc_id", "text", src)(
      Seq((20L, b)).toDF("doc_id", "text"), 1L)
    Dedup.unpersistAll()
    // … compaction leg 2: the data snapshot
    Dedup.compactLshData(spark, src, dst)
    // invariant the ordering buys: log ⊆ data. dst's log must NOT
    // claim batch 1 (its rows may or may not have made the snapshot —
    // either is safe, because the resume below replays it)
    val loggedBefore = spark.read.parquet(s"$dst/ingest_log")
      .select("batch_id").as[Long].collect().toSet
    assert(loggedBefore == Set(0L),
      s"compacted log claims an in-window batch: $loggedBefore")
    // stream resume against the compacted path re-offers batch 1:
    // either a fresh append (rows missed the snapshot) or an
    // all-rejected self-collision (rows made it) — both end with the
    // batch present and logged
    Dedup.lshIngestBatch("doc_id", "text", dst)(
      Seq((20L, b)).toDF("doc_id", "text"), 1L)
    Dedup.unpersistAll()
    val srcIds = spark.read.parquet(s"$src/hashes")
      .select("id").distinct().as[Long].collect().toSet
    val dstIds = spark.read.parquet(s"$dst/hashes")
      .select("id").distinct().as[Long].collect().toSet
    assert(dstIds == srcIds && dstIds == Set(1L, 10L, 20L),
      s"documents lost across compaction + resume: src=$srcIds dst=$dstIds")
    val loggedAfter = spark.read.parquet(s"$dst/ingest_log")
      .select("batch_id").as[Long].collect().toSet
    assert(loggedAfter == Set(0L, 1L), loggedAfter.toString)
    // and the resumed index is probe-identical to the source
    val probe = Seq((90L, "one two three four five six seven nine"))
      .toDF("doc_id", "text")
    def rows(p: String) =
      Dedup.dedupAgainstLshIndex(probe, "doc_id", "text", p)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(dst) == rows(src))
    Dedup.unpersistAll()
  }

  test("lsh ingest-log fold: the tail collapses to one file, replay stays refused, and index compaction carries the FOLDED history") {
    import graft.operators.Dedup
    import graft.sources.BatchLog
    val src = java.nio.file.Files.createTempDirectory("graft-lshf-s").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-lshf-d").toString
    val logPath = s"$src/ingest_log"
    Dedup.writeLshIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "doc_id", "text", src)
    val texts = Seq(
      "red orange yellow green blue indigo violet ultraviolet",
      "one two three four five six seven eight",
      "north south east west up down left right",
      "spring summer autumn winter solstice equinox dawn dusk")
    texts.zipWithIndex.foreach { case (t, i) =>
      Dedup.lshIngestBatch("doc_id", "text", src)(
        Seq((10L + i, t)).toDF("doc_id", "text"), i.toLong)
      Dedup.unpersistAll()
    }
    assert(BatchLog.tailFiles(spark, logPath).size == 4)
    assert(Dedup.compactIngestReplayLog(spark, src) == 4)
    assert(BatchLog.tailFiles(spark, logPath).isEmpty)
    assert(BatchLog.watermark(spark, logPath).contains(3L))
    // replay across the fold is a no-op: the index is byte-unchanged
    val before = spark.read.parquet(s"$src/hashes").count()
    (0 until 4).foreach { i =>
      Dedup.lshIngestBatch("doc_id", "text", src)(
        Seq((10L + i, texts(i))).toDF("doc_id", "text"), i.toLong)
      Dedup.unpersistAll()
    }
    assert(spark.read.parquet(s"$src/hashes").count() == before)
    // index compaction carries the FOLDED history — the ids live
    // nowhere else, and a naive tail copy would un-guard them
    Dedup.compactLshIndex(spark, src, dst)
    (0 until 4).foreach(i =>
      assert(BatchLog.contains(spark, s"$dst/ingest_log", i.toLong),
        s"folded batch $i lost by the compaction carry"))
    val dstBefore = spark.read.parquet(s"$dst/hashes").count()
    Dedup.lshIngestBatch("doc_id", "text", dst)(
      Seq((10L, texts(0))).toDF("doc_id", "text"), 0L)
    Dedup.unpersistAll()
    assert(spark.read.parquet(s"$dst/hashes").count() == dstBefore,
      "a folded-and-carried batch id re-ingested at the compacted path")
  }

  test("batch-log missing-file classification: PATH_NOT_FOUND analysis errors retry like FNF; copyTo no-ops on a log never written") {
    import graft.sources.BatchLog
    // r18 ADVICE: a concurrent fold deleting the resolved gen=<k>
    // file between resolution and spark.read's ANALYSIS surfaces as
    // AnalysisException PATH_NOT_FOUND with no FNF cause — contains()
    // must classify it as a retryable missing-file, not a corrupt log
    val pnf = new org.apache.spark.sql.AnalysisException(
      errorClass = "PATH_NOT_FOUND",
      messageParameters = Map("path" -> "/nowhere/gen=3/LOG.parquet"))
    assert(BatchLog.isMissingFile(pnf),
      "PATH_NOT_FOUND AnalysisException not classified retryable")
    val fnfWrapped = new org.apache.spark.SparkException("task failed",
      new RuntimeException(
        new java.io.FileNotFoundException("/gone.parquet")))
    assert(BatchLog.isMissingFile(fnfWrapped),
      "FNF-caused SparkException not classified retryable")
    // a corrupt log must never silently downgrade exactly-once
    assert(!BatchLog.isMissingFile(
      new RuntimeException("parquet footer corrupt")))
    // carry of an absent log: a rebuild of a never-stream-fed index
    // writes nothing (and the probe at the new path stays false)
    val dst = java.nio.file.Files
      .createTempDirectory("graft-blog-copy").toString
    BatchLog.copyTo(spark, s"$dst/absent_src", s"$dst/ingest_log")
    assert(BatchLog.tailFiles(spark, s"$dst/ingest_log").isEmpty)
    assert(!BatchLog.contains(spark, s"$dst/ingest_log", 0L))
  }

  test("streaming semantic decontamination flags near-parallel vectors, statelessly") {
    import graft.operators.{Dedup, Similarity}
    implicit val sqlCtx = spark.sqlContext
    val dim = 16
    // eval vectors: two well-separated directions
    def unit(axis: Int): Seq[Float] =
      Seq.tabulate(dim)(j => if (j == axis) 1f else 0f)
    val eval = Seq((100L, unit(0)), (101L, unit(7))).toDF("vec_id", "embedding")
    val mem = MemoryStream[(Long, Seq[Float])]
    val scope = new Dedup.CacheScope
    val flagged = Similarity.streamingCosineDecontaminate(
      mem.toDF().toDF("vec_id", "embedding"), eval, "vec_id", "embedding",
      dim = dim, threshold = 0.9, bands = 8, bitsPerBand = 4, scope = scope)
    val q = flagged.writeStream.format("memory").queryName("scdecon")
      .outputMode(OutputMode.Append()).start()
    try {
      assert(scope.size == 2, s"expected banded + norm eval caches, got ${scope.size}")
      mem.addData(
        (1L, unit(0).map(_ * 3f)),                       // parallel to eval 100
        (2L, Seq.tabulate(dim)(j => (j % 3 - 1).toFloat))) // unrelated
      q.processAllAvailable()
      // a batch caller's cleanup must not touch this stream's scope
      Dedup.unpersistAll()
      assert(scope.size == 2, "unpersistAll released streaming-owned caches")
      mem.addData((3L, unit(7))) // exact copy of eval 101, later batch
      q.processAllAvailable()
      val out = spark.table("scdecon")
        .select("id_left", "id_right").distinct()
        .as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 100L), (3L, 101L)), s"flags were $out")
      val lastProgress = q.lastProgress
      assert(lastProgress != null, "no progress after processAllAvailable")
      assert(lastProgress.stateOperators.isEmpty,
        "streaming semantic decontamination must be stateless, found: " +
          lastProgress.stateOperators.mkString(", "))
    } finally { q.stop(); scope.release() }
  }

  test("streaming weighted stratified sample equals the batch sampler, incl. mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Sampling
    val heavy = Seq("src0", "src1", "src2", "src3", "src4")
    def w = when(col("source").isin(heavy.map(lit): _*), 8).otherwise(1)
    val k = 5
    def batchWinners(df: org.apache.spark.sql.DataFrame): Map[String, List[Long]] =
      Sampling.weightedStratifiedSample(df, "doc_id", "lang", w, k)
        .orderBy("lang", "sample_key", "doc_id")
        .select("lang", "doc_id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap

    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "source")
    val mem = MemoryStream[(Long, String, String)]
    val out = Sampling.streamingWeightedStratifiedSample(
      mem.toDF().toDF("doc_id", "lang", "source"), "doc_id", "lang", w, k)
    val q = out.writeStream.format("memory").queryName("swss")
      .outputMode(OutputMode.Complete()).start()
    try {
      def streamed(): Map[String, List[Long]] = spark.table("swss").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      val all = docs.as[(Long, String, String)].collect()
      val (evens, odds) = all.partition(_._1 % 2 == 0)
      // prefix consistency: after the first half, the leaderboard IS
      // the batch sampler over that half
      mem.addData(evens.toIndexedSeq: _*)
      q.processAllAvailable()
      assert(streamed() == batchWinners(docs.where($"doc_id" % 2 === 0)))
      // drained: equals the batch sampler over the full corpus — the
      // heap state merged correctly across micro-batches
      mem.addData(odds.toIndexedSeq: _*)
      q.processAllAvailable()
      assert(streamed() == batchWinners(docs))
    } finally q.stop()
  }

  test("streaming LM perplexity scores row-identical to the batch scorer, statelessly") {
    import graft.operators.{Dedup, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sfDir, "documents")
    val scope = new Dedup.CacheScope
    val lm = TextAnalysis.bigramLmTrain(
      docs.where(col("doc_id") % 10 =!= 0), "text", scope)
    val local = TextAnalysis.collectLm(lm)
    // batch truth from the JOIN path — the streaming broadcast path
    // must match it row for row, exact longs included
    val expected = TextAnalysis.bigramLmPerplexity(
      lm, docs, "doc_id", "text")
    try {
      val rows = docs.select("doc_id", "text").as[(Long, String)]
        .collect().sortBy(_._1)
        .map { case (id, text) => StreamDoc(id, ts(0), text) }
      val mem = MemoryStream[StreamDoc]
      val scored = TextAnalysis.streamingLmPerplexity(
        mem.toDF(), local, "doc_id", "text")
      val q = scored.writeStream.format("memory").queryName("slm")
        .outputMode(OutputMode.Append()).start()
      try {
        val (a, b) = rows.splitAt(rows.length / 2)
        mem.addData(a.toIndexedSeq: _*)
        q.processAllAvailable()
        mem.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        assertSameRows(spark.table("slm"), expected)
        val p = q.lastProgress
        assert(p != null && p.stateOperators.isEmpty,
          "broadcast-model scoring must be stateless")
      } finally q.stop()
    } finally scope.release()
  }

  test("batch sessionization on the real events table is consistent") {
    val ev = Tables.load(spark, sfDir, "events")
    val sessions = EventsStream.sessionizeBatch(ev, 30 * 60 * 1000L)
    val n = sessions.agg(sum("n_events")).head().getLong(0)
    assert(n == ev.count(), "every event lands in exactly one session")
    assert(sessions.where(col("session_end") < col("session_start")).isEmpty)
  }

  test("streamingCurriculumPack: one-batch run reproduces curriculumPack exactly") {
    import graft.operators.Packing
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    // deterministic per-row quality (a function of the id, like the
    // real score is a function of the text) spanning all four bands
    val quality = pmod(col("doc_id"), lit(100L)).cast("double") / lit(100.0)
    val rows = (0L until 200L).map(i => (i, (i * 37 % 500) + 1))
    val mem = MemoryStream[(Long, Long)]
    val q = Packing.streamingCurriculumPack(
        mem.toDS().toDF("doc_id", "n_tok"), "doc_id", quality,
        col("n_tok"), seqLen = 1000, nShards = 4)
      .writeStream.format("memory").queryName("cur_pack_one")
      .outputMode("append").start()
    try {
      mem.addData(rows.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("cur_pack_one")
        .select("doc_id", "phase", "shard", "chunk_id", "start_tok")
      val batch = Packing.curriculumPack(rows.toDF("doc_id", "n_tok"),
        "doc_id", quality, col("n_tok"), seqLen = 1000, nShards = 4)
      assertSameRows(streamed, batch)
    } finally q.stop()
  }

  test("streamingLengthBucketBatches: one-batch run reproduces the batch manifest") {
    import graft.operators.Packing
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val rows = (0L until 200L).map(i => (i, ((i * 37 % 90) + 5).toInt))
    val mem = MemoryStream[(Long, Int)]
    val q = Packing.streamingLengthBucketBatches(
        mem.toDS().toDF("doc_id", "n_tok"), "doc_id", col("n_tok"),
        bounds = Seq(30, 60), batchSize = 8, numShards = 4)
      .writeStream.format("memory").queryName("lb_one")
      .outputMode("append").start()
    try {
      mem.addData(rows.toIndexedSeq: _*); q.processAllAvailable()
      val streamedManifest = spark.table("lb_one")
        .groupBy("bucket", "shard", "batch")
        .agg(count(lit(1)).as("n_docs"), max("n_tok").as("max_tokens"),
          sum("n_tok").cast("long").as("sum_tokens"))
        .withColumn("pad_tokens",
          col("n_docs") * col("max_tokens") - col("sum_tokens"))
      val batch = Packing.lengthBucketBatches(rows.toDF("doc_id", "n_tok"),
        "doc_id", col("n_tok"), bounds = Seq(30, 60), batchSize = 8,
        numShards = 4)
      assertSameRows(streamedManifest, batch)
      // every slot within a batch is used exactly once
      val slots = spark.table("lb_one")
        .groupBy("bucket", "shard", "batch", "slot")
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
      assert(slots.isEmpty, "a (batch, slot) must be assigned once")
    } finally q.stop()
  }

  test("streamingLengthBucketBatches: counters continue across micro-batches") {
    import graft.operators.Packing
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val mem = MemoryStream[(Long, Int)]
    // one bucket (all counts < 30), one shard → one counter
    val q = Packing.streamingLengthBucketBatches(
        mem.toDS().toDF("doc_id", "n_tok"), "doc_id", col("n_tok"),
        bounds = Seq(30), batchSize = 2, numShards = 1)
      .writeStream.format("memory").queryName("lb_cont")
      .outputMode("append").start()
    try {
      mem.addData((10L, 5), (20L, 6), (30L, 7)); q.processAllAvailable()
      mem.addData((1L, 8)); q.processAllAvailable()
      val out = spark.table("lb_cont")
        .select("doc_id", "batch", "slot")
        .as[(Long, Int, Int)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      // micro-batch 1 fills batch 0 fully + batch 1 slot 0 (by ord
      // order); doc 1 arrives later and takes batch 1 slot 1 — the
      // counter continued, whatever doc 1's ord hash says
      assert(out(1L) == ((1, 1)), out.toString)
      assert(out.values.toSeq.sorted == Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    } finally q.stop()
  }

  test("streamingCurriculumPack: per-(phase,shard) counters continue across batches") {
    import graft.operators.Packing
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val mem = MemoryStream[(Long, Long)]
    // fixed quality → one phase; nShards=1 → one stream, one counter
    val q = Packing.streamingCurriculumPack(
        mem.toDS().toDF("doc_id", "n_tok"), "doc_id", lit(0.9),
        col("n_tok"), seqLen = 100, nShards = 1)
      .writeStream.format("memory").queryName("cur_pack_cont")
      .outputMode("append").start()
    try {
      mem.addData((10L, 60L), (20L, 70L)); q.processAllAvailable()
      // batch 2: arrival order appends AFTER batch 1's 130 tokens,
      // whatever its ord hash says — the live-packer contract
      mem.addData((1L, 50L)); q.processAllAvailable()
      val out = spark.table("cur_pack_cont")
        .select("doc_id", "phase", "chunk_id", "start_tok")
        .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(_._4)
      assert(out.map(_._2).forall(_ == 0), s"expected phase 0: $out")
      assert(out.map(_._1).toSet == Set(1L, 10L, 20L))
      // batch 1 packs 130 tokens (order within the batch by ord hash);
      // doc 1 then starts at exactly 130 → chunk 1
      assert(out.last == ((1L, 0, 1L, 130L)), s"got $out")
      assert(out.head._4 == 0L)
      val firstLen = if (out.head._1 == 10L) 60L else 70L
      assert(out(1)._4 == firstLen,
        s"second start must be the first doc's token count: $out")
    } finally q.stop()
  }

  test("multimodalFlagStream: arrivals flag against the static corpus per modality; hamming legs exactly once") {
    import graft.operators.{Dedup, Multimodal}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    // corpus ids pick their fromDocuments kind: 300 %3=0 image,
    // 301 %3=1 audio, 302 %3=2 video (no fingerprint — text leg only)
    val corpus = Seq(
      (300L, "alpha beta gamma delta epsilon zeta eta theta"),
      (301L, "red orange yellow green blue indigo violet ultra"),
      (302L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[StreamDoc]
    val scope = new Dedup.CacheScope
    val flagged = Multimodal.multimodalFlagStream(
      mem.toDF(), corpus, "doc_id", "text",
      shingleK = 2, numHashes = 32, bands = 16, threshold = 0.4,
      scope = scope)
    val rawByModality =
      new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val sink = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long, String)]())
    val q = flagged.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.groupBy("modality").count().collect().foreach(r =>
          rawByModality.merge(r.getString(0), r.getLong(1), _ + _))
        batch.dropDuplicates("id_left", "id_right", "modality")
          .select("id_left", "id_right", "modality").collect()
          .foreach(r => sink.add((r.getLong(0), r.getLong(1), r.getString(2))))
        ()
      }
      .start()
    try {
      mem.addData(
        // 3 %3=0 image-kind: exact copy of 300 → text + image flags
        StreamDoc(3, ts(0), "alpha beta gamma delta epsilon zeta eta theta"),
        // 4 %3=1 audio-kind: exact copy of 301 → text + audio flags
        StreamDoc(4, ts(0), "red orange yellow green blue indigo violet ultra"))
      q.processAllAvailable()
      mem.addData(
        // 5 %3=2 video-kind: exact copy of 302 → text flag ONLY
        StreamDoc(5, ts(1), "one two three four five six seven eight"),
        // 6 %3=0 image-kind, clean → no flags
        StreamDoc(6, ts(1), "totally different words nothing shared here at all"))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(sink.asScala.toSet == Set(
        (3L, 300L, "text"), (3L, 300L, "image"),
        (4L, 301L, "text"), (4L, 301L, "audio"),
        (5L, 302L, "text")),
        s"got ${sink.asScala.toSet}")
      // the hamming legs emit exactly once per flagged pair even
      // PRE-dedup (stateless first-agreeing-chunk filter: an exact
      // copy agrees on all 4 chunks yet yields one row); the text
      // leg keeps its documented per-colliding-band multiplicity
      assert(rawByModality.get("image") == 1L, rawByModality.toString)
      assert(rawByModality.get("audio") == 1L, rawByModality.toString)
      assert(rawByModality.get("text") > 3L, rawByModality.toString)
    } finally { q.stop(); scope.release() }
  }

  test("readCorpusStream: the living corpus as a streaming source — bootstrap, per-generation micro-batches, silent deletions, checkpointed restart") {
    // round 16: the change feed as a REAL Structured Streaming source
    // (generations as offsets) — Spark's own checkpoint replaces the
    // followCorpus offset file, so restart recovery is the engine's
    import graft.sources.CorpusStore
    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    val store = tmp("graft-rcs-store")
    val ckpt = tmp("graft-rcs-ckpt")
    val founding = (0L to 9L).map(i => (i, s"doc $i body"))
      .toDF("doc_id", "text")
    CorpusStore.writeCorpusCow(founding, store, "doc_id", numBuckets = 8)
    val seen =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    def start() = CorpusStore.readCorpusStream(spark, store)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val ids = df.select("doc_id").as[Long].collect().toSet
        seen.synchronized { seen += (id -> ids) }
        ()
      }
      .start()

    val q = start()
    try {
      q.processAllAvailable()
      // bootstrap: the full CURRENT version is batch 0
      assert(seen.map(_._2).reduce(_ ++ _) == (0L to 9L).toSet,
        seen.toString)
      // two delta generations through the streaming ingest writer:
      // the feed emits exactly the upserted rows (possibly split
      // across micro-batches — the poll thread may pick up the first
      // generation before the second commits)
      CorpusStore.cowIngestBatch(store)(
        Seq((20L, "doc 20")).toDF("doc_id", "text"), 0L)
      CorpusStore.cowIngestBatch(store)(
        Seq((21L, "doc 21"), (5L, "doc 5 v2")).toDF("doc_id", "text"), 1L)
      q.processAllAvailable()
      val fed = seen.synchronized {
        seen.filter(_._1 >= 1).map(_._2)
          .foldLeft(Set.empty[Long])(_ ++ _)
      }
      assert(fed == Set(20L, 21L, 5L), seen.toString)
      // a tombstone generation advances the offset but surfaces NO
      // rows (deletions are silent — the change-feed contract)
      CorpusStore.appendTombstonesToCorpusCow(
        Seq(21L).toDF("doc_id"), store)
      val b2 = seen.size
      q.processAllAvailable()
      assert(seen.drop(b2).map(_._2).forall(_.isEmpty), seen.toString)
    } finally q.stop()

    // restart from the SAME checkpoint: only generations committed
    // while the stream was down arrive — no re-bootstrap
    CorpusStore.cowIngestBatch(store)(
      Seq((22L, "doc 22")).toDF("doc_id", "text"), 2L)
    val preRestart = seen.size
    val q2 = start()
    try {
      q2.processAllAvailable()
      val replayed = seen.drop(preRestart)
        .map(_._2).foldLeft(Set.empty[Long])(_ ++ _)
      assert(replayed == Set(22L),
        s"restart must resume from the checkpointed generation: $seen")
    } finally q2.stop()
  }

  test("followCorpus: cowIngestBatch → change feed → LSH ingest, exactly-once in effect across a crash replay") {
    // round 16 — verdict stretch task 8: a downstream consumer
    // follows the living corpus through the generation-aware change
    // feed instead of rescanning CURRENT; the offset commits AFTER
    // the consumer body, so a crash replays the range and the
    // idempotent index append absorbs it
    import graft.operators.Dedup
    import graft.sources.CorpusStore
    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    def dtext(i: Long): String =
      (0 until 8).map(j => s"f${i}x$j").mkString(" ")
    val store = tmp("graft-fc-store")
    val lsh = tmp("graft-fc-lsh")
    val founding = (0L to 9L).map(i => (i, dtext(i)))
      .toDF("doc_id", "text")
    CorpusStore.writeCorpusCow(founding, store, "doc_id", numBuckets = 8)
    Dedup.writeLshIndex(founding, "doc_id", "text", lsh)
    def lshCollides(i: Long): Boolean =
      try Dedup.dedupAgainstLshIndex(
        Seq((900L + i, dtext(i))).toDF("doc_id", "text"),
        "doc_id", "text", lsh, threshold = 0.5).count() > 0
      finally Dedup.unpersistAll()

    // a fresh follower bootstraps with the full CURRENT version
    var seen = -1L
    assert(CorpusStore.followCorpus(spark, store, "lsh-ingest") { df =>
      seen = df.count()
    }.contains((-1, 0)))
    assert(seen == 10L)
    // already current: no body call, no commit
    var called = false
    assert(CorpusStore.followCorpus(spark, store, "lsh-ingest") { _ =>
      called = true
    }.isEmpty && !called)

    // two streamed micro-batches through the COW ingest writer
    // (delta generations — the change feed reads O(changes))
    CorpusStore.cowIngestBatch(store)(
      Seq((20L, dtext(20L))).toDF("doc_id", "text"), 0L)
    CorpusStore.cowIngestBatch(store)(
      Seq((21L, dtext(21L))).toDF("doc_id", "text"), 1L)
    var got = Set.empty[Long]
    assert(CorpusStore.followCorpus(spark, store, "lsh-ingest") { df =>
      got = df.select("doc_id").as[Long].collect().toSet
      Dedup.appendToLshIndex(df, "doc_id", "text", lsh)
    }.contains((0, 2)))
    assert(got == Set(20L, 21L), got.toString)
    assert(lshCollides(20L) && lshCollides(21L),
      "followed batches must be probe-visible in the index")

    // crash window: the append LANDED but the offset commit didn't
    // (body throws after its writes) — the replay re-offers the same
    // range and the byte-identical re-append is distinct-ed away by
    // every probe (exactly-once in effect)
    CorpusStore.cowIngestBatch(store)(
      Seq((22L, dtext(22L))).toDF("doc_id", "text"), 2L)
    intercept[RuntimeException] {
      CorpusStore.followCorpus(spark, store, "lsh-ingest") { df =>
        Dedup.appendToLshIndex(df, "doc_id", "text", lsh)
        throw new RuntimeException("crash after append, before commit")
      }
    }
    val replay = CorpusStore.followCorpus(spark, store, "lsh-ingest") { df =>
      assert(df.select("doc_id").as[Long].collect().toSet == Set(22L))
      Dedup.appendToLshIndex(df, "doc_id", "text", lsh)
    }
    assert(replay.contains((2, 3)), replay.toString)
    assert(lshCollides(22L))
    // the doubled append collapses to ONE match in the probe
    val hits =
      try Dedup.dedupAgainstLshIndex(
        Seq((922L, dtext(22L))).toDF("doc_id", "text"),
        "doc_id", "text", lsh, threshold = 0.5).count()
      finally Dedup.unpersistAll()
    assert(hits == 1L, s"replayed append must distinct away, got $hits")
    // and the follower is current again
    assert(CorpusStore.followCorpus(spark, store, "lsh-ingest")(_ => ())
      .isEmpty)
  }

  test("readCorpusStream maxGenerationsPerTrigger: backlog drains in capped batches, restart stays capped without re-bootstrap, and a vacuumed end still dies loudly") {
    // round 17 — r16 missing item 2: getOffset always returned
    // CURRENT, so N generations of downtime arrived as ONE unbounded
    // micro-batch; the cap turns catch-up into ceil(N/n) normal
    // checkpointed units
    import graft.sources.CorpusStore
    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    val store = tmp("graft-cap-store")
    val ckpt = tmp("graft-cap-ckpt")
    CorpusStore.writeCorpusCow(
      (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text"),
      store, "doc_id", numBuckets = 8)                          // gen 0
    // six delta generations BEFORE the stream ever starts: a cold
    // consumer facing a backlog
    (1 to 6).foreach(v => CorpusStore.appendDeltaToCorpusCow(
      Seq((100L + v, s"doc ${100 + v}")).toDF("doc_id", "text"), store))
    val seen =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    // the capped reader: bootstrap at min(cur, max(base, n-1)) = 1,
    // then (1,3], (3,5], (5,6] — four batches, none wider than 2 gens
    val q = spark.readStream.format("graft-corpus")
      .option("path", store)
      .option("maxGenerationsPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val ids = df.select("doc_id").as[Long].collect().toSet
        seen.synchronized { seen += (id -> ids) }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val snap = seen.synchronized(seen.toVector)
      assert(snap.size == 4, s"expected 4 capped batches: $snap")
      // bootstrap batch: the full gen-1 snapshot (10 founding + 1)
      assert(snap.head._2 == (0L to 9L).toSet + 101L, snap.toString)
      // catch-up batches: exactly the later deltas, in ranges
      assert(snap.drop(1).map(_._2) ==
        Vector(Set(102L, 103L), Set(104L, 105L), Set(106L)), snap.toString)
    } finally q.stop()

    // restart after more downtime: drains capped, never re-bootstraps
    (7 to 9).foreach(v => CorpusStore.appendDeltaToCorpusCow(
      Seq((100L + v, s"doc ${100 + v}")).toDF("doc_id", "text"), store))
    val pre = seen.size
    val q2 = spark.readStream.format("graft-corpus")
      .option("path", store)
      .option("maxGenerationsPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val ids = df.select("doc_id").as[Long].collect().toSet
        seen.synchronized { seen += (id -> ids) }
        ()
      }
      .start()
    try {
      q2.processAllAvailable()
      val snap = seen.synchronized(seen.drop(pre).toVector)
      assert(snap.map(_._2) ==
        Vector(Set(107L, 108L), Set(109L)), snap.toString)
    } finally q2.stop()

    // the cap does NOT weaken the retention fail-fast: vacuum the
    // store past the stream's checkpoint, and the capped next range's
    // END generation is below base — the stream dies loudly instead
    // of silently skipping history
    (10 to 13).foreach(v => CorpusStore.appendDeltaToCorpusCow(
      Seq((100L + v, s"doc ${100 + v}")).toDF("doc_id", "text"), store))
    CorpusStore.vacuumCorpusSnapshots(spark, store, keepLast = 1)
    val q3 = spark.readStream.format("graft-corpus")
      .option("path", store)
      .option("maxGenerationsPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val dead = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
      q3.awaitTermination(30000)
    }
    assert(dead.getMessage.contains("not retained") ||
      Option(dead.getCause).exists(_.getMessage.contains("not retained")),
      dead.getMessage)
    // option validation is analysis-time
    val bad = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-corpus")
        .option("path", store)
        .option("maxGenerationsPerTrigger", "0")
        .load()
    }
    assert(bad.getMessage.contains("maxGenerationsPerTrigger"),
      bad.getMessage)
  }

  test("a consumer-registered corpus stream survives aggressive vacuum: the follower floor holds its unread range across downtime") {
    // round 17: `.option("consumer", name)` makes the stream a
    // durable follower, so maintenance can run keepLast=1 retention
    // while the stream is DOWN and the resumed stream still drains —
    // the unregistered twin of this schedule dies on the
    // vacuumed-offset fail-fast (pinned in the cap test above)
    import graft.sources.CorpusStore
    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    val store = tmp("graft-fol-store")
    val ckpt = tmp("graft-fol-ckpt")
    CorpusStore.writeCorpusCow(
      (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text"),
      store, "doc_id", numBuckets = 8)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    def start() = spark.readStream.format("graft-corpus")
      .option("path", store)
      .option("consumer", "packer")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.select("doc_id").as[Long].collect().toSet
        seen.synchronized { seen += ids }
        ()
      }
      .start()
    val q = start()
    try {
      q.processAllAvailable()
      CorpusStore.appendDeltaToCorpusCow(
        Seq((100L, "doc 100")).toDF("doc_id", "text"), store) // gen 1
      q.processAllAvailable()
    } finally q.stop()
    // the stream acked generation 0 as its follower offset
    assert(CorpusStore.listCorpusFollowers(spark, store)
      .exists(_._1 == "packer"))
    // five generations land while the stream is down, then an
    // aggressive maintenance pass — retention floors at the follower
    (2 to 6).foreach(v => CorpusStore.appendDeltaToCorpusCow(
      Seq((100L + v, s"doc ${100 + v}")).toDF("doc_id", "text"), store))
    val r = CorpusStore.vacuumCorpusSnapshots(spark, store, keepLast = 1)
    assert(r.floor.exists(_._1 == "packer"), r.toString)
    // the resumed stream drains the downtime backlog without the
    // fail-fast, and the follower advances past the old floor
    val pre = seen.size
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = seen.synchronized(seen.drop(pre).toVector)
        .foldLeft(Set.empty[Long])(_ ++ _)
      assert(got == (2 to 6).map(100L + _).toSet, got.toString)
    } finally q2.stop()
    // the ack rides the checkpoint's COMMIT LOG (round 19 — r18
    // verdict task 5; before, it waited on Spark's one-trigger-late
    // commit callback and a stalled stream held retention a full
    // cadence): a restart with NO new generations re-reads the last
    // committed batch's end offset at its first poll and advances
    // the follower to the drained range — no fresh append needed
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    // with the follower advanced, the next pass reclaims to policy
    val r2 = CorpusStore.vacuumCorpusSnapshots(spark, store, keepLast = 1)
    assert(r2.floor.isEmpty && r2.base == r2.requestedBase, r2.toString)
    // lifecycle completes: a decommissioned stream stops flooring
    assert(CorpusStore.unregisterFollower(spark, store, "packer"))
  }

  test("a mid-stream schema evolution kills the corpus stream loudly — restart picks up the new shape") {
    // round 17: the V1 Source contract fixes the schema at stream
    // start; a store evolved underneath must fail the query with the
    // restart instruction, never feed new-shape batches into a sink
    // planned for the old shape
    import graft.sources.CorpusStore
    import org.apache.spark.sql.types._
    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    val store = tmp("graft-evo-store")
    val ckpt = tmp("graft-evo-ckpt")
    CorpusStore.writeCorpusCow(
      (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text"),
      store, "doc_id", numBuckets = 8)
    def start() = CorpusStore.readCorpusStream(spark, store)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val q = start()
    try q.processAllAvailable() finally ()
    // evolve while the stream is live, then commit a new-shape delta
    CorpusStore.evolveCorpusCowSchema(spark, store,
      StructType(Seq(StructField("lang", StringType))),
      defaults = Map("lang" -> "'und'"))
    CorpusStore.appendDeltaToCorpusCow(
      Seq((20L, "doc 20", "en")).toDF("doc_id", "text", "lang"), store)
    val dead = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(dead).exists(_.contains("restart the query")),
      msgs(dead).mkString(" | "))
    q.stop()
    // the restarted stream reads the evolved shape and drains the
    // backlog (the evolve generation + the new-shape delta)
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q2 = CorpusStore.readCorpusStream(spark, store)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        assert(df.columns.toSeq == Seq("doc_id", "text", "lang"))
        val ids = df.select("doc_id").as[Long].collect().toSet
        got.synchronized { got += ids }
        ()
      }
      .start()
    try {
      q2.processAllAvailable()
      assert(got.synchronized(got.toVector).exists(_.contains(20L)),
        got.toString)
    } finally q2.stop()
  }

  test("a capped stream lagging behind an evolve conforms old-epoch batches up with the recorded defaults instead of deadlocking") {
    // round 18 — r17 ADVICE: a capped batch whose end generation is
    // BELOW a later evolve reads in the old shape, while every
    // (re)started source fixes its schema to the CURRENT evolved
    // shape. The old guard fired on that mismatch at every restart,
    // so a lagging capped stream (or a capped bootstrap predating the
    // evolve) could never cross the boundary. Now the old-epoch batch
    // conforms UP — the same default fill a post-evolve batch read
    // applies — and only a batch NEWER than the stream's shape (the
    // true mid-stream evolve, pinned above) still fails.
    import graft.sources.CorpusStore
    import org.apache.spark.sql.types._
    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    val store = tmp("graft-evoc-store")
    val ckpt = tmp("graft-evoc-ckpt")
    CorpusStore.writeCorpusCow(
      (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text"),
      store, "doc_id", numBuckets = 8)                           // gen 0
    CorpusStore.appendDeltaToCorpusCow(
      Seq((20L, "doc 20")).toDF("doc_id", "text"), store)        // gen 1
    CorpusStore.evolveCorpusCowSchema(spark, store,
      StructType(Seq(StructField("lang", StringType))),
      defaults = Map("lang" -> "'und'"))                         // gen 2
    CorpusStore.appendDeltaToCorpusCow(
      Seq((21L, "doc 21", "en")).toDF("doc_id", "text", "lang"),
      store)                                                     // gen 3
    // a FRESH capped stream bootstraps at generation 0 — an old-epoch
    // snapshot — and then drains one generation per trigger across
    // the evolve boundary
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.format("graft-corpus")
      .option("path", store)
      .option("maxGenerationsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // EVERY batch arrives in the stream's fixed (evolved) shape
        assert(df.columns.toSeq == Seq("doc_id", "text", "lang"),
          df.columns.mkString(", "))
        val rows = df.select("doc_id", "lang").as[(Long, String)]
          .collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val byId = got.synchronized(got.toVector).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).toSet }
    // pre-evolve rows carry the recorded default; post-evolve rows
    // their written value
    assert(byId.get(0L).exists(_ == Set("und")), byId.toString)
    assert(byId.get(20L).exists(_.contains("und")), byId.toString)
    assert(byId.get(21L).exists(_ == Set("en")), byId.toString)
    assert((0L to 9L).forall(byId.contains), byId.keys.toSeq.sorted.toString)
  }
}
