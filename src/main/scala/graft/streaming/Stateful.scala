package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming breadth (SURVEY.md §7.3 step 5) over event-shaped
  * streams: watermarked tumbling windows, watermark-scoped exact dedup, and
  * custom session state via flatMapGroupsWithState.
  *
  * These operators have no DuckDB surface; their batch twins live in
  * `graft.operators.Windows` / `Dedup` and share semantics. Tests drive them
  * with MemoryStream + processAllAvailable (SURVEY.md §5.2.3).
  *
  * Scale: all three shapes shuffle once on their grouping key and keep O(1)
  * state per key in the state store; watermarks bound state size — without
  * them, streaming state grows with key cardinality forever (the reference
  * itself has exactly that problem: its Cassandra table is unbounded keyed
  * state with no eviction, cassandra_sink.scala:71-77).
  */
object Stateful {

  /** Watermarked tumbling-window counts: late events beyond the watermark
    * are dropped, finalized windows emit once (append mode). */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     window_ : String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Exact dedup on (event_id) with watermark-bounded state: duplicates
    * arriving within the watermark horizon are suppressed; state for old ids
    * is evicted. The unbounded-state variant is plain dropDuplicates. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (the streaming twin of
    * Windows.intervalJoin): purchases joined to the same user's clicks in
    * the preceding `windowMinutes`. Watermarks on BOTH sides + the time-range
    * condition let Spark bound the join state (clicks older than the
    * watermark minus the window are evicted). */
  def streamAttribution(clicks: DataFrame, purchases: DataFrame,
                        windowMinutes: Int = 30): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("c_ts"))).as("lag_ms"))
  }

  case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  val SessionGapMs: Long = 30L * 60 * 1000

  /** Millis for the `"N unit"` watermark-delay strings Spark accepts; used
    * only for the sessionize batch/stream-parity guard. */
  private[graft] def parseDelayMs(delay: String): Long =
    delay.trim.toLowerCase.split("\\s+") match {
      case Array(n, u) =>
        val v = n.toLong
        u.stripSuffix("s") match {
          case "millisecond" => v
          case "second"      => v * 1000
          case "minute"      => v * 60 * 1000
          case "hour"        => v * 3600 * 1000
          case "day"         => v * 86400 * 1000
          case other => throw new IllegalArgumentException(s"unsupported unit: $other")
        }
      case _ => throw new IllegalArgumentException(s"unsupported delay: $delay")
    }

  /** Custom session windows via flatMapGroupsWithState: per-user state holds
    * the open session; an explicit gap between consecutive event timestamps
    * closes it, and an event-time timeout flushes the final open session per
    * user once the watermark passes the session's gap horizon — without it
    * the last session per key would never be emitted and the stream would
    * under-report one session per key forever relative to the batch twin
    * Windows.sessions (gaps-and-islands, same gap rule). Event-time (not
    * processing-time) timeout on purpose: the flush is driven by the
    * watermark, so it is deterministic under replay and does not make the
    * micro-batch engine spin wall-clock no-data batches. Any same-user event
    * arriving after the flush necessarily has ts past the gap horizon (it
    * beat the watermark), so it would have started a new session anyway —
    * flush-then-new-session and gap-close-then-new-session agree. */
  def sessionize(events: Dataset[SessionEvent],
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    // the widening-merge argument above ("t < start − gap is impossible")
    // holds only while the accepted out-of-order horizon is shorter than the
    // session gap; a longer delay could admit an event before start − gap
    // that the batch twin would place in its own session
    require(parseDelayMs(watermarkDelay) < SessionGapMs,
      s"watermarkDelay '$watermarkDelay' must be < the $SessionGapMs ms " +
        "session gap, or stream and batch sessionization diverge")
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Watermark passed session_end + gap: no same-user event can
            // still extend this session — close and emit it, drop the state.
            val open = state.getOption.map(s =>
              SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
            state.remove()
            open.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // within the gap of the open session — including events that
                // arrived out of order ACROSS batches (t inside or before the
                // session span but above the watermark): merge by widening,
                // never move end backward. t < start − gap is impossible when
                // gap > watermark delay (such a row would be below the
                // watermark and already dropped), so widening covers every
                // accepted out-of-order arrival and keeps batch-twin parity.
                case Some(s) if t - s.end <= SessionGapMs =>
                  cur = Some(SessionState(
                    math.min(s.start, t), math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must be strictly beyond the current watermark or Spark rejects it
              state.setTimeoutTimestamp(
                math.max(s.end + SessionGapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  case class FunnelEvent(user_id: Long, event_id: Long, event_type: String, ts: Timestamp)
  case class FunnelState(stage: Int, anchorMs: Long)
  case class FunnelOut(user_id: Long, stage: Int)

  /** Streaming twin of `operators.Sequence.funnel`: per-user funnel stage
    * maintained incrementally at ingest via mapGroupsWithState (update
    * mode), same strict-ms + [[graft.operators.Sequence.FunnelDeadlineMs]]
    * advance rule — each micro-batch emits the user's current stage (0–3).
    *
    * Parity contract: with per-user in-order arrival the fold visits events
    * in the same (ms, event_id) order the batch twin's window sort does, so
    * the final stage per user is bit-identical (`StatefulSpec` pins it).
    * Under out-of-order arrival the stream is a LOWER BOUND: stage advance
    * is monotone and a late event below the current anchor can never
    * advance (the strict-ms rule rejects it), but an early-arriving later
    * step consumed before its prerequisite is not revisited — the batch
    * twin re-sorts, a one-pass stream cannot. [[funnelStagesReordered]]
    * closes exactly that gap with a WATERMARK-BOUNDED reorder buffer;
    * buffering every user's FULL history would be the unbounded-state trap
    * the reference's Cassandra table falls into, and stays refused.
    *
    * State is one (Int, Long) per user — no watermark needed for size, a
    * production deployment would add a TTL for abandoned users. */
  def funnelStages(events: Dataset[FunnelEvent]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelOut](GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            s = funnelStep(s, e.ts.getTime, e.event_type)
          }
          state.update(s)
          FunnelOut(userId, s.stage)
      }
  }

  /** One application of the strict-ms + deadline advance rule (shared by
    * both streaming funnels; bit-identical to the batch window chain). */
  private def funnelStep(s: FunnelState, t: Long, typ: String): FunnelState = {
    val steps = graft.operators.Sequence.FunnelSteps
    val deadline = graft.operators.Sequence.FunnelDeadlineMs
    if (s.stage < 3 && typ == steps(s.stage) &&
        (s.stage == 0 || (t > s.anchorMs && t <= s.anchorMs + deadline)))
      FunnelState(s.stage + 1, t)
    else s
  }

  /** Buffered events are (ms, event_id, event_type); `stage`/`anchorMs` is
    * the COMMITTED fold over everything the watermark has sealed. */
  case class FunnelBufState(stage: Int, anchorMs: Long,
                            buf: Seq[(Long, Long, String)])

  /** [[funnelStages]] with a WATERMARK-BOUNDED REORDER BUFFER — exact
    * batch-twin parity under out-of-order arrival within the watermark
    * horizon (the case the one-pass fold legitimately lower-bounds: an
    * early-arriving later step consumed before its prerequisite is never
    * revisited). Per user, arriving events buffer in state; once the
    * watermark passes an event's time, no earlier event can still arrive
    * (later rows are dropped as late input), so the sealed prefix folds
    * into the committed stage IN GLOBAL (ms, event_id) ORDER — drains
    * happen in watermark order, and each drain's band (wm_prev, wm_new]
    * is disjoint and ascending, so the committed fold replays exactly the
    * batch twin's sort. Each invocation emits the user's current ESTIMATE
    * (committed + a fold over the still-pending buffer): optimistic,
    * monotone-converging to the exact stage once the watermark seals the
    * horizon (`SequenceSpec` pins final-value parity on a workload where
    * the unbuffered fold provably diverges; an estimate may transiently
    * step DOWN when an earlier-ms event fills in and re-anchors the
    * deadline — that is the honest reading of incomplete data).
    *
    * State: one (stage, anchor) plus ONLY the horizon's events per user —
    * the watermark evicts, which is the entire difference from the
    * unbounded full-history buffer this family refuses on principle.
    * Event-time timeout (watermark + pending min) drives drains even when
    * a user receives no further events — the [[sessionize]] convention. */
  def funnelStagesReordered(events: Dataset[FunnelEvent],
      watermarkDelay: String = "10 minutes"): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    def fold(s0: FunnelState, evs: Seq[(Long, Long, String)]): FunnelState =
      evs.sortBy(e => (e._1, e._2)).foldLeft(s0) {
        case (s, (t, _, typ)) => funnelStep(s, t, typ) }
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBufState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelBufState]) =>
          val prev = state.getOption.getOrElse(FunnelBufState(0, Long.MinValue, Nil))
          val wm = state.getCurrentWatermarkMs()
          val all = prev.buf ++
            rows.map(e => (e.ts.getTime, e.event_id, e.event_type))
          // sealed band: nothing below the watermark can still arrive
          val (ripe, pending) = all.partition(_._1 <= wm)
          val committed = fold(FunnelState(prev.stage, prev.anchorMs), ripe)
          state.update(FunnelBufState(committed.stage, committed.anchorMs, pending))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm + 1))
          Iterator.single(FunnelOut(userId, fold(committed, pending).stage))
      }
  }
}
