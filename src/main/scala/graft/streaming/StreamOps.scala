package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics helpers (SURVEY.md §2.9 T4/T5): watermarked
  * tumbling / sliding / session windows over an event-time column.
  * Pure plan builders — they work identically on batch and streaming
  * DataFrames, which is how the specs test them (memory stream in,
  * memory sink out) and how batch backfill reuses the same code.
  */
// Serializable: closures shipped to executors (closedSessions /
// SessionProcessor) call mergeSessions through the module reference
object StreamOps extends Serializable {

  /** Tumbling window aggregation with a watermark bounding state. */
  def tumbling(df: DataFrame, tsCol: String, width: String,
      watermark: String, aggs: Seq[Column], groupBy: Seq[Column] = Nil)
      : DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width) +: groupBy: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding window aggregation. */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
      watermark: String, aggs: Seq[Column], groupBy: Seq[Column] = Nil)
      : DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide) +: groupBy: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session window (gap-based) aggregation per key. */
  def sessions(df: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Stale-event split (T4, spec.md:211): events with event-time older
    * than `maxAge` relative to processing time branch to the DLQ. */
  def staleSplit(df: DataFrame, tsCol: String, maxAge: String)
      : (DataFrame, DataFrame) = {
    val isStale = col(tsCol) < current_timestamp() - expr(s"INTERVAL $maxAge")
    (df.filter(!isStale), df.filter(isStale))
  }

  /** Streaming exact dedup on key columns with watermark-bounded
    * state: duplicates of the same key are dropped even when the
    * producer re-stamped the event time, as long as they arrive within
    * the watermark; state for old keys ages out instead of growing
    * unboundedly (the 100 TB-stream requirement). */
  def dedupeStream(df: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream interval join: rows pair when keys match AND the
    * right event time falls within [left + lower, left + upper] —
    * both bounds are OFFSETS from the left event time, so a window
    * reaching backward passes a negative `lower` (Flink interval-join
    * style: lower = "-10 minutes", upper = "5 minutes"). Both sides
    * carry watermarks, and the time-range condition bounds the join
    * STATE on both sides (without it a stream-stream inner join
    * buffers forever — the state-retention requirement of Spark's
    * stream-stream joins). Works identically on batch frames. Column
    * sets must be disjoint apart from the key.
    *
    * @note MIGRATION (round 3): `lower` changed meaning from "reach
    *       back by" (window `[leftTs - lower, leftTs + upper]`) to a
    *       SIGNED offset (window `[leftTs + lower, leftTs + upper]`).
    *       A caller that previously passed a positive `lower` to look
    *       backward must now negate it — e.g. `lower = "10 minutes"`
    *       becomes `lower = "-10 minutes"`; the old call now selects a
    *       forward-only window with no error. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, watermark: String,
      lower: String, upper: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, l(key) === r(key) &&
        r(rightTs) >= l(leftTs) + expr(s"INTERVAL $lower") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upper"))
      .drop(r(key))
  }

  final case class SessionOut(key: String, start_ms: Long, end_ms: Long,
      n_events: Long)
  /** A session interval held in [[closedSessions]] state. */
  final case class OpenSession(start: Long, end: Long, n: Long)
  /** Per-key state for [[closedSessions]]: every session — whether its
    * intra-batch gap has lapsed or not — stays here until the
    * WATERMARK passes `end + gap`, because until then an out-of-order
    * (but above-watermark) event can still extend or bridge it. */
  final case class SessionState(sessions: List[OpenSession])

  /** Session windows via `flatMapGroupsWithState` + EVENT-TIME timeout
    * (T5/T6): unlike the built-in `session_window` aggregation this
    * emits each CLOSED session exactly once, when the watermark passes
    * its gap — the shape alerting/billing pipelines need (act on a
    * finished session, never see it twice). A key's sessions live in
    * bounded per-key state: a session whose intra-batch gap has lapsed
    * is NOT emitted right away (a cross-batch out-of-order event above
    * the watermark could still fall inside its gap and extend it —
    * early emission would split one true session into two rows); it is
    * held until the watermark crosses `end + gap`, after which the
    * stateful operator drops any later event that could touch it, so
    * emission is final. The event-time timeout fires on the earliest
    * held deadline, so idle keys age out instead of accumulating (the
    * 100 TB-stream requirement).
    *
    * Append-mode output; works only on streaming frames (the batch
    * equivalent is the `session_window` aggregation, q24/T5).
    *
    * @note MIGRATION (round 5): the state type changed from
    *       `OpenSession` to `SessionState(List[OpenSession])`, which
    *       changes the state-store encoder schema — a query restarting
    *       from a pre-round-5 checkpoint cannot deserialize its state.
    *       Restart such queries from a fresh checkpoint location. */
  def closedSessions(df: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long, watermark: String): Dataset[SessionOut] = {
    val spark = df.sparkSession
    import spark.implicits._

    def merge(ss: Seq[OpenSession]): List[OpenSession] =
      mergeSessions(ss, gapMs)

    // Emit sessions the watermark has sealed (wm >= end + gap: no
    // surviving event can extend them), keep the rest in state with a
    // timeout on the earliest remaining deadline.
    def release(key: String, sessions: List[OpenSession], wm: Long,
        state: org.apache.spark.sql.streaming.GroupState[SessionState])
        : Iterator[SessionOut] = {
      val (ripe, held) = sessions.partition(_.end + gapMs <= wm)
      if (held.isEmpty) state.remove()
      else {
        state.update(SessionState(held))
        // the registered timestamp must sit above the current watermark
        state.setTimeoutTimestamp(
          math.max(held.map(_.end + gapMs).min, wm + 1))
      }
      ripe.iterator.map(s => SessionOut(key, s.start, s.end, s.n))
    }

    // project/cast BEFORE the watermark: a cast above it would mint a
    // fresh attribute without the watermark tag
    df.select(col(keyCol).cast("string").as("__k"),
        col(tsCol).cast("timestamp").as("__ts"))
      .withWatermark("__ts", watermark)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, _, state) if state.hasTimedOut =>
          release(key, state.get.sessions,
            state.getCurrentWatermarkMs(), state)
        case (key, events, state) =>
          val prev = state.getOption.map(_.sessions).getOrElse(Nil)
          val fresh = events.map(e =>
            OpenSession(e._2.getTime, e._2.getTime, 1)).toSeq
          release(key, merge(prev ++ fresh),
            state.getCurrentWatermarkMs(), state)
      }
  }

  /** Merge sorted session intervals: two sessions fuse when the gap
    * between them is < gapMs (half-open gap, matching session_window:
    * an event at exactly end+gap starts a NEW session). Linear fold
    * (prepend + one reverse). */
  private[streaming] def mergeSessions(ss: Seq[OpenSession],
      gapMs: Long): List[OpenSession] =
    ss.sortBy(s => (s.start, s.end))
      .foldLeft(List.empty[OpenSession]) {
        case (p :: rest, s) if s.start < p.end + gapMs =>
          OpenSession(p.start, math.max(p.end, s.end), p.n + s.n) :: rest
        case (acc, s) => s :: acc
      }
      .reverse

  /** Session windows via the Spark 4 `transformWithState` arbitrary-
    * state API — semantics identical to [[closedSessions]] (each
    * closed session emitted exactly once when the watermark passes its
    * gap), re-expressed on the modern processor model: named
    * `ListState` for the per-key open sessions (evolvable
    * independently of other state vars, unlike the single fused
    * case-class state of flatMapGroupsWithState) and explicit
    * event-time TIMERS re-pointed at the earliest held deadline each
    * batch. Requires the RocksDB state store provider (Spark 4
    * restricts transformWithState to it); [[closedSessions]] remains
    * the provider-agnostic fallback. */
  def closedSessionsTws(df: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long, watermark: String): Dataset[SessionOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"),
        col(tsCol).cast("timestamp").as("__ts"))
      .withWatermark("__ts", watermark)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** The [[closedSessionsTws]] processor: one ListState of open
    * sessions per key, one event-time timer at the earliest
    * `end + gap` deadline. */
  final class SessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, java.sql.Timestamp), SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode,
      TimerValues, TTLConfig}

    @transient private var sessions:
      org.apache.spark.sql.streaming.ListState[OpenSession] = _

    override def init(outputMode: OutputMode,
        timeMode: TimeMode): Unit =
      sessions = getHandle.getListState[OpenSession]("sessions",
        org.apache.spark.sql.Encoders.product[OpenSession],
        TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, java.sql.Timestamp)],
        timers: TimerValues): Iterator[SessionOut] = {
      val fresh = rows
        .map(r => OpenSession(r._2.getTime, r._2.getTime, 1L)).toSeq
      release(key,
        mergeSessions(sessions.get().toSeq ++ fresh, gapMs),
        timers.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] =
      release(key, sessions.get().toSeq,
        timers.getCurrentWatermarkInMs())

    private def release(key: String, all: Seq[OpenSession],
        wm: Long): Iterator[SessionOut] = {
      val (ripe, held) = all.partition(_.end + gapMs <= wm)
      // single-timer discipline: re-point at the earliest held
      // deadline (a stale earlier timer would fire into empty state —
      // harmless but wasteful; a stale LATER one would delay emission).
      // Materialize before deleting: removing entries while walking the
      // live state-store iterator is mutation-during-iteration.
      getHandle.listTimers().toSeq.foreach(t => getHandle.deleteTimer(t))
      if (held.isEmpty) sessions.clear()
      else {
        sessions.put(held.toArray)
        getHandle.registerTimer(
          math.max(held.map(_.end + gapMs).min, wm + 1))
      }
      ripe.iterator.map(s => SessionOut(key, s.start, s.end, s.n))
    }
  }

  final case class KeyCount(key: String, events: Long, sum: Double)

  /** Custom arbitrary state via mapGroupsWithState (T6): a per-key
    * running count + sum that survives micro-batches — the
    * KeyValueGroupedDataset state pattern for semantics no built-in
    * aggregation covers (here deliberately simple so the state
    * plumbing, not the arithmetic, is what's exercised). NoTimeout:
    * a processing-time timeout makes the no-trigger engine re-fire
    * timer-check batches continuously (processAllAvailable never
    * settles); bound state instead by key cardinality or use an
    * event-time timeout with a watermark. */
  def runningPerKeyState(df: DataFrame, keyCol: String, valCol: String)
      : Dataset[KeyCount] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[KeyCount, KeyCount](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[KeyCount]) =>
          val prev = state.getOption.getOrElse(KeyCount(key, 0L, 0.0))
          var n = prev.events
          var s = prev.sum
          rows.foreach { r => n += 1; s += r._2 }
          val updated = KeyCount(key, n, s)
          state.update(updated)
          updated
      }
  }
}
