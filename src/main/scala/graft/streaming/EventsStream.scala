package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events table shape
  * (event_id, ts, user_id, event_type, value).
  *
  * Batch/stream unification is the point: `tumblingCounts` is the
  * same declarative plan whether its input is `spark.read` or
  * `spark.readStream`, so the batch twin (`q27_events_bucket`)
  * verifies the logic while the streaming specs verify watermarking,
  * incremental emission, and stateful sessionization.
  *
  * Scale: the windowed aggregate shuffles on (window, event_type) and
  * keeps per-window partial state only until the watermark closes the
  * window; sessionization state is per-user, partitioned by user_id,
  * and evicted by event-time timeout once the watermark passes
  * `session_end + gap` (the final session is flushed at eviction) —
  * bounded memory at any input volume.
  */
object EventsStream {

  /** Tumbling-window counts with a watermark for late data. Works on
    * both batch and streaming DataFrames.
    */
  def tumblingCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("total_value"))
  }

  /** Streaming twin of [[graft.operators.EventsAnalytics.rollingActive]]:
    * distinct users over a trailing `windowDays`-day window sliding by
    * one day, computed live. Each event lands in its `windowDays`
    * overlapping sliding windows; a stateful per-(window, user) dedup
    * feeds a windowed count — the Spark-4 chained-stateful shape
    * (dedup state and window state both evicted once the watermark
    * closes the window, so state is |active users|·windowDays, never
    * history-sized). Exact COUNT(DISTINCT) without a distinct
    * aggregate, which streaming does not support.
    *
    * Emits (day, rolling_users) where `day` is the LAST day covered
    * by the window (the batch report's labeling). Contract vs the
    * batch twin: windows with zero actives are simply absent here
    * (the batch report emits 0 rows for them), and trailing windows
    * labeled past the final observed day are emitted (a live stream
    * has no "max day"); on any prefix of days ≤ the batch span's max,
    * rows match the batch report's non-zero rows exactly
    * (StreamingSpec pins this).
    */
  def rollingActiveStream(events: DataFrame, windowDays: Int = 7,
      watermark: String = "0 seconds"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .select(window(col("ts"), s"$windowDays days", "1 day").as("w"),
        col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("rolling_users"))
      .select(
        date_format(col("w.end") - expr("INTERVAL 1 DAY"), "yyyy-MM-dd")
          .as("day"),
        col("rolling_users"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double)

  /** Internal per-user state (public: the state encoder's generated
    * code must be able to reach the accessors).
    */
  final case class SessionState(start: Long, end: Long,
                                n: Long, total: Double)

  /** Per-user state: every session not yet FINAL, ascending by start.
    * A session is final only once the watermark passes
    * `end + gap` — before that, a late-but-within-watermark event can
    * still merge into it (or bridge it with a neighbour), so emitting
    * earlier would fragment sessions across micro-batches and diverge
    * from the batch twin. The list stays short: it holds at most the
    * sessions inside one watermark window.
    */
  final case class SessionsState(sessions: List[SessionState])

  /** Gap-based sessionization: a session closes when a user is idle
    * for `gapMs`. Custom per-key state via flatMapGroupsWithState —
    * the Spark-native shape for "operator the built-ins can't
    * express". Sessions are emitted exactly when the watermark
    * passes `session_end + gap` (no earlier event can arrive, so the
    * session can never change again — the same condition that makes
    * the emission agree with the batch twin even for late events
    * split across micro-batches); an idle user's remaining sessions
    * flush via event-time timeout and the state is evicted, so state
    * is bounded on an unbounded stream and every session is emitted
    * exactly once.
    *
    * Checkpoint compatibility: the state schema changed in round 5
    * (single SessionState → SessionsState list). A sessionize query
    * restarted from a pre-round-5 checkpoint fails LOUDLY at Spark's
    * state-schema check (StateSchemaNotCompatible) — discard the
    * checkpoint and reprocess from the source (the operator is
    * deterministic over the replayed input). Spark offers no
    * in-place FMGWS state migration; do not disable stateSchemaCheck
    * to force a restart, that would misdecode old rows.
    */
  // µs precision, matching sessionizeBatch's unix_micros semantics:
  // Timestamp.getTime alone truncates to ms, so sub-ms event spacing
  // would make the twins split sessions differently.
  private def tsMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  // per-value decimal(18,2) rounding, matching the batch twin's
  // sum(value.cast(decimal(18,2))) — raw double accumulation would
  // diverge on sub-cent values (sums of 2-decimal doubles stay exact)
  private def round2(v: Double): Double =
    BigDecimal(v).setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermarkDelay: String = "0 seconds")
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    // Batch inputs have no watermark: GroupState.getCurrentWatermarkMs
    // throws under NoTimeout-less batch execution, and no timeout ever
    // fires — so the batch path flushes the trailing session inline
    // instead of parking it in state.
    val streaming = events.isStreaming
    val src =
      if (streaming) events.withWatermark("ts", watermarkDelay)
      else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val gapUs = gapMs * 1000
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, Session](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionsState]) =>

          def toSession(s: SessionState) = Session(userId,
            tsFromMicros(s.start), tsFromMicros(s.end), s.n, s.total)

          // Emit every session the watermark has made FINAL
          // (end + gap < watermark ⇒ no admissible event can merge
          // into or bridge it), park the rest with a timeout at the
          // earliest pending deadline.
          def emitFinal(sessions: List[SessionState]): Iterator[Session] = {
            val wmUs = state.getCurrentWatermarkMs() * 1000
            val (done, open) = sessions.partition(s => s.end + gapUs < wmUs)
            if (open.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(SessionsState(open))
              // timeout is in ms: round the µs deadline UP so it can
              // never fire early; must also be strictly above the
              // current watermark or Spark rejects the timestamp
              val deadlineMs =
                math.floorDiv(open.head.end + gapUs + 999, 1000L)
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs() + 1))
            }
            done.map(toSession).iterator
          }

          if (state.hasTimedOut) {
            // watermark advanced past the earliest pending deadline:
            // flush what became final, re-arm for whatever remains
            emitFinal(state.get.sessions)
          } else {
            // Gap-merge over INTERVALS, with every pending state
            // session among them: sort (state ++ events) by start,
            // then merge neighbours whose gap is within `gapMs`. This
            // is the batch twin's semantics restated — in particular a
            // late-but-within-watermark event more than `gap` OLDER
            // than the live session groups with its own era (possibly
            // bridging two pending sessions), never absorbs into the
            // live one, and the result is independent of how the
            // events were split across micro-batches.
            val evIvs = it.toSeq
              .sortBy(e => (tsMicros(e.ts), e.event_id))
              .map { e =>
                val t = tsMicros(e.ts)
                SessionState(t, t, 1, round2(e.value))
              }
            val items =
              (state.getOption.map(_.sessions).getOrElse(Nil) ++ evIvs)
                .sortBy(s => (s.start, s.end))
            var cur: Option[SessionState] = None
            val merged = List.newBuilder[SessionState]
            for (iv <- items) {
              cur match {
                case Some(c) if iv.start - c.end <= gapUs =>
                  // min/max extension: an event inside the current
                  // interval must not regress session_end
                  cur = Some(SessionState(math.min(c.start, iv.start),
                    math.max(c.end, iv.end), c.n + iv.n, c.total + iv.total))
                case Some(c) =>
                  merged += c
                  cur = Some(iv)
                case None =>
                  cur = Some(iv)
              }
            }
            cur.foreach(merged += _)
            val sessions = merged.result()
            if (streaming) emitFinal(sessions)
            else sessions.map(toSession).iterator // batch: all final
          }
      }
  }

  /** Batch twin of [[sessionize]] as a declarative plan (lag + running
    * session-id assignment) — the cross-check used by the spec and the
    * shape you'd run for backfills.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    // gap measured in microseconds: cast("long") would truncate to
    // whole seconds and diverge from the streaming twin (which uses
    // millisecond Timestamp.getTime) for sub-second event spacing
    val tsUs = unix_micros(col("ts"))
    val gapFlag = when(
      tsUs - lag(tsUs, 1).over(byUser) > gapMs * 1000, 1L)
      .otherwise(0L)
    events
      .withColumn("new_session", gapFlag)
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"),
           // decimal sum: exact and order-independent (double partial
           // sums would drift with partitioning)
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .drop("session_id")
  }

  /** Per-step candidate event times (µs, ascending) for one user,
    * plus the max event time ever admitted for the user (µs) — the
    * idle-eviction clock's anchor. Public for the state encoder, like
    * [[SessionsState]].
    */
  final case class FunnelState(cand: List[List[Long]], maxSeenUs: Long)

  /** One funnel progress row: how far the user's strictly-ordered
    * chain currently reaches, and the chosen per-step times (length
    * == steps_reached).
    */
  final case class FunnelUpdate(user_id: Long, steps_reached: Int,
                                step_times: List[Timestamp])

  /** Streaming funnel: incrementally maintains, per user, the same
    * strictly-ordered chain [[graft.operators.EventsAnalytics]]
    * computes in batch (t_i = earliest `steps(i)` event strictly after
    * t_{i-1}), and emits an updated [[FunnelUpdate]] for every user
    * touched in a micro-batch (Update output mode).
    *
    * Out-of-order input is the whole difficulty: a late-but-admissible
    * step-1 event can LOWER t_1 and thereby re-qualify a step-2 time
    * that previously failed the strict `>` — so the state must retain
    * not just the chain but the candidate times that could still be
    * chosen. Retention is pruned with two sound rules (chain values
    * only ever decrease as events arrive; a late event must carry
    * ts ≥ watermark):
    *
    *  - above-chain: a step-i candidate > the currently chosen t_i can
    *    never win (t_i only decreases);
    *  - dead-below: a candidate x ≤ watermark with x ≤ lb_{i-1} can
    *    never qualify, where lb_i is a lower bound on every FUTURE
    *    t_i: lb_0 = min(cand_0 ∪ {W}), lb_i = min of (the earliest
    *    retained candidate > lb_{i-1}) and W — any future chain value
    *    is an existing candidate above its predecessor's bound or a
    *    new event above the watermark.
    *
    * Together these keep PER-USER state at (chain values) + (events
    * inside the watermark window). TOTAL state is still linear in
    * distinct users — an unbounded user space would grow the store
    * forever — so `evictAfterIdleMs` (recommended for production)
    * arms an event-time timeout re-set on every touch: a user idle
    * for that long in WATERMARK time is evicted. The tradeoff is
    * explicit: an evicted user who returns restarts from an empty
    * chain (their pre-idle steps are forgotten), the same
    * keep-or-bound contract sessionize resolves via its gap. Batch
    * inputs take W = +∞ (no late data), which collapses the state to
    * exactly the chain and makes the operator agree with the batch
    * twin by construction (spec-pinned).
    */
  def streamingFunnel(events: Dataset[Event], steps: Seq[String],
                      watermarkDelay: String = "0 seconds",
                      evictAfterIdleMs: Option[Long] = None)
                     (implicit spark: SparkSession): Dataset[FunnelUpdate] = {
    import spark.implicits._
    require(steps.nonEmpty)
    require(evictAfterIdleMs.forall(_ > 0))
    val streaming = events.isStreaming
    val stepIdx = steps.zipWithIndex.toMap
    val src =
      if (streaming) events.withWatermark("ts", watermarkDelay)
      else events
    val timeoutConf =
      if (streaming && evictAfterIdleMs.isDefined)
        GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src
      .filter(e => stepIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Update(), timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // idle past the eviction horizon: drop the state; the last
            // emitted update for this user already carried the final
            // pre-idle chain, so nothing new is emitted here
            state.remove()
            Iterator.empty
          } else {
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000
            else Long.MaxValue
          val prior = state.getOption.map(_.cand.toVector)
            .getOrElse(Vector.fill(steps.size)(List.empty[Long]))
          val priorMaxSeen = state.getOption.map(_.maxSeenUs)
            .getOrElse(Long.MinValue)
          // Enforce the watermark contract OURSELVES: Spark only
          // auto-drops late rows for stateful ops with an event-time
          // timeout, and the dead-below prune is sound precisely
          // because no event below the watermark is ever admitted.
          // (Batch: wm is −∞, nothing drops.)
          val lateCutoff = if (streaming) wmUs else Long.MinValue
          val fresh = it.toSeq
            .filter(e => tsMicros(e.ts) >= lateCutoff)
            .groupBy(e => stepIdx(e.event_type))
          val cand: Vector[List[Long]] = prior.zipWithIndex.map {
            case (old, i) =>
              val add = fresh.getOrElse(i, Nil).map(e => tsMicros(e.ts))
              (old ++ add).distinct.sorted
          }
          // greedy chain: earliest candidate strictly above the
          // previous step's chosen time (candidates sorted ⇒ find=min)
          val chain = Vector.newBuilder[Long]
          var prev = Long.MinValue
          var broken = false
          for (i <- steps.indices if !broken) {
            cand(i).find(_ > prev) match {
              case Some(t) => chain += t; prev = t
              case None => broken = true
            }
          }
          val chosen = chain.result()
          // lower bounds on all future chain values (see scaladoc)
          val lbs = Vector.newBuilder[Long]
          var lbPrev = Long.MinValue
          for (i <- steps.indices) {
            val viaCand = cand(i).find(_ > lbPrev).getOrElse(Long.MaxValue)
            val lb = math.min(viaCand, wmUs)
            lbs += lb
            lbPrev = lb
          }
          val lb = lbs.result()
          val pruned = steps.indices.map { i =>
            val belowChain =
              if (i < chosen.length) cand(i).filter(_ <= chosen(i))
              else cand(i)
            val lbPrevI = if (i == 0) Long.MinValue else lb(i - 1)
            belowChain.filter(x => x > lbPrevI || x > wmUs)
          }.toList
          val maxSeen = (priorMaxSeen +:
            fresh.values.flatten.map(e => tsMicros(e.ts)).toSeq).max
          state.update(FunnelState(pruned, maxSeen))
          // Re-arm the idle-eviction clock on every touch, anchored at
          // max(watermark, the user's max EVENT time): anchoring at the
          // watermark alone would let the effective idle horizon
          // collapse to (idle − watermark lag) — under a long
          // watermark delay a user could be evicted while
          // late-but-admissible events near their last activity were
          // still inside the window, losing exactly the candidates the
          // retention pruning exists to keep. With the event-time
          // anchor, eviction fires only once the watermark passes
          // last-activity + idle, so any post-eviction event is
          // genuinely after an idle gap in EVENT time and correctly
          // starts a new era.
          if (streaming) evictAfterIdleMs.foreach { ms =>
            val anchorMs = math.max(state.getCurrentWatermarkMs(),
              math.floorDiv(maxSeen, 1000L))
            state.setTimeoutTimestamp(anchorMs + ms)
          }
          Iterator.single(FunnelUpdate(userId, chosen.length,
            chosen.map(tsFromMicros).toList))
          }
      }
  }

  /** One emitted edge of the per-user event chain. */
  final case class Transition(user_id: Long, from_type: String,
                              to_type: String, from_ts: Timestamp,
                              to_ts: Timestamp)

  /** Per-user transition state (public for the state encoder): the
    * last LINKED event — the head the next final event chains from —
    * and events still above the watermark, which may yet be reordered
    * by a late arrival.
    */
  final case class PendingEvent(ts: Long, event_id: Long, tpe: String)
  final case class TransitionState(lastFinal: Option[PendingEvent],
                                   pending: List[PendingEvent])

  /** Streaming twin of [[EventsAnalytics.transitionMatrix]]'s pair
    * extraction: emits one [[Transition]] row per consecutive pair of
    * a user's events, exactly once, in a form a downstream streaming
    * `groupBy(from, to).count` turns into the live transition matrix.
    *
    * The naive formulation — link each batch's events to the last seen
    * event — breaks on late data: with events e1(t1), e3(t3) already
    * linked, a late e2 (t1 < t2 < t3) must produce e1→e2→e3, not an
    * extra edge dangling off e3. So a pair is emitted only when it is
    * FINAL under the watermark: (a, b) consecutive and `b.ts ≤ wm`
    * guarantees no admissible event can still land between them
    * (anything earlier than b is older than the watermark ⇒ dropped
    * at the source). Later events park in state and flush via
    * event-time timeout once the watermark passes them — the
    * sessionize emission discipline applied to chain edges.
    *
    * State per user: ONE linked-head event + the pending tail inside
    * the watermark window — the same bound as any per-user streaming
    * aggregate. The head is retained while the user lives so an edge
    * spanning a long idle gap still emits; pass `evictAfterIdleMs` to
    * trade that edge for state eviction on idle users (the funnel's
    * documented idle contract). Ties on (ts, event_id) boundary
    * equality with the linked head are dropped defensively — they can
    * only arise from an event EXACTLY at the watermark racing the
    * head, and emitting it would re-link a pair already emitted.
    *
    * Batch inputs run the same code with an infinite watermark: every
    * pair emits inline, no state survives — the batch-twin contract
    * (spec-pinned against transitionMatrix).
    */
  def transitionStream(events: Dataset[Event],
                       watermarkDelay: String = "0 seconds",
                       evictAfterIdleMs: Option[Long] = None)
                      (implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val src =
      if (streaming) events.withWatermark("ts", watermarkDelay)
      else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransitionState, Transition](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[TransitionState]) =>

          val st = state.getOption
            .getOrElse(TransitionState(None, Nil))
          // a timeout fire with nothing pending can only be the idle
          // timer (the flush deadline is armed strictly when pending
          // events exist): evict the head, ending this user's chain
          val idleFire = streaming && state.hasTimedOut && st.pending.isEmpty
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000
            else Long.MaxValue

          val fresh = it.map(e =>
            PendingEvent(tsMicros(e.ts), e.event_id, e.event_type)).toList
          val ord = Ordering.by[PendingEvent, (Long, Long)](
            e => (e.ts, e.event_id))
          // drop boundary races that sort at or before the linked head
          // (see scaladoc) — late-beyond-watermark data never reaches
          // here, Spark filtered it at the source
          val admissible = st.lastFinal match {
            case Some(h) => fresh.filter(e => ord.compare(e, h) > 0)
            case None => fresh
          }
          val all = (st.pending ++ admissible).sorted(ord)
          val (fin, pend) = all.partition(_.ts <= wmUs)

          val chain = st.lastFinal.toList ++ fin
          val edges = chain.zip(chain.drop(1)).map { case (a, b) =>
            Transition(userId, a.tpe, b.tpe,
              tsFromMicros(a.ts), tsFromMicros(b.ts))
          }

          val newHead = fin.lastOption.orElse(st.lastFinal)
          if (!streaming) {
            // batch: everything was final; keep nothing
            if (state.exists) state.remove()
          } else if (idleFire || (pend.isEmpty && newHead.isEmpty)) {
            if (state.exists) state.remove()
          } else {
            state.update(TransitionState(newHead, pend))
            if (pend.nonEmpty) {
              // flush deadline: earliest pending event, rounded UP to
              // ms, strictly above the current watermark
              val deadlineMs = math.floorDiv(pend.head.ts + 999, 1000L)
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs() + 1))
            } else evictAfterIdleMs.foreach { ms =>
              // no pending edges: the head alone can expire on idle
              val anchorMs = math.max(state.getCurrentWatermarkMs(),
                newHead.map(h => math.floorDiv(h.ts, 1000L)).getOrElse(0L))
              state.setTimeoutTimestamp(anchorMs + ms)
            }
          }
          edges.iterator
      }
  }
}
