package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/**
 * Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState` /
 * `flatMapGroupsWithState` — the arbitrary-state tier below the built-in
 * `session_window` operator (which `s7_stream_sessions` uses): explicit
 * per-key state the built-ins cannot express, here per-user session tracking
 * with gap semantics identical to the batch `ev_sessionize` window
 * (a new session starts when `us − lastUs >= gapUs`; ties order by
 * (us, event_id)).
 *
 * Scale: state is O(distinct users) × a few dozen bytes (one open-session
 * record each) — a billion-user plane is tens of GB spread across the state
 * store's shuffle partitions, not a driver concern. Events fold into state
 * sorted per batch; exactness across batches needs each user's events to
 * arrive time-ordered BETWEEN batches (time-ranged chunk files / Kafka
 * per-key ordering give this; late events belong to the watermark + timeout
 * regime below).
 *
 * Extension component (no reference analogue — the reference has no event
 * plane; SURVEY §2.7 streaming semantics).
 */
object StatefulSessions {

  /** Run `body` with the RocksDB state-store provider (transformWithState
    * requires it), restoring the session's previous provider after — the
    * withStatefulShuffle pattern applied to the provider knob. */
  def withRocksDbStateStore[A](s: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.get(key,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally s.conf.set(key, prev)
  }

  /** Per-user session-fold state: the open session's start/size, the last
    * event time, and running totals. ~40 bytes per user in the state store. */
  final case class SessionState(
      lastUs: Long, openStartUs: Long, openEvents: Long, nSessions: Long, nEvents: Long)

  final case class UserSessionCounts(user_id: Long, n_sessions: Long, n_events: Long)

  final case class ClosedSession(
      user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

  private val emptyState = SessionState(Long.MinValue, Long.MinValue, 0L, 0L, 0L)

  private def fold(st: SessionState, us: Long, gapUs: Long): (SessionState, Boolean) = {
    val isNew = st.nEvents == 0L || us - st.lastUs >= gapUs
    (SessionState(
      lastUs = us,
      openStartUs = if (isNew) us else st.openStartUs,
      openEvents = if (isNew) 1L else st.openEvents + 1L,
      nSessions = st.nSessions + (if (isNew) 1L else 0L),
      nEvents = st.nEvents + 1L), isNew)
  }

  /**
   * Running per-user (n_sessions, n_events) via `mapGroupsWithState` —
   * Update-mode output, one row per touched user per micro-batch; both
   * counts are monotone, so the drained answer is `max` per user (or simply
   * the latest row). Input columns: `user_id`, `us` (event-time micros),
   * `event_id` (tie-break). Matches the batch `ev_sessionize` aggregation
   * exactly when each user's events arrive time-ordered across batches.
   */
  def sessionCounts(events: DataFrame, gapUs: Long): Dataset[UserSessionCounts] = {
    val ss = events.sparkSession
    import ss.implicits._
    events.select(col("user_id").cast("long"), col("us").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long)], state: GroupState[SessionState]) =>
          val evs = it.toArray.sortBy(e => (e._2, e._3))
          var st = state.getOption.getOrElse(emptyState)
          evs.foreach { case (_, us, _) => st = fold(st, us, gapUs)._1 }
          state.update(st)
          UserSessionCounts(user, st.nSessions, st.nEvents)
      }
  }

  /**
   * The SAME session fold on Spark 4's `transformWithState` — the modern
   * arbitrary-state API (typed named-state handles, TTL, timers) that
   * supersedes mapGroupsWithState and requires the RocksDB state-store
   * provider. State layout and semantics are IDENTICAL to [[sessionCounts]]
   * (one ~40-byte SessionState per user in a named ValueState), so the two
   * implementations share `fold` and the same batch oracle; what changes is
   * the operator contract — explicit state declaration in `init`, per-batch
   * `handleInputRows`, and state-store-native TTL instead of hand-rolled
   * timeout plumbing. TTLConfig.NONE here: a production deployment bounds
   * idle-user state with a TTL instead of an event-time timeout.
   */
  final class SessionCountsProcessor(gapUs: Long)
    extends StatefulProcessor[Long, (Long, Long, Long), UserSessionCounts] {
    @transient private var st: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[UserSessionCounts] = {
      val evs = rows.toArray.sortBy(e => (e._2, e._3))
      var s = if (st.exists()) st.get() else emptyState
      evs.foreach { case (_, us, _) => s = fold(s, us, gapUs)._1 }
      st.update(s)
      Iterator.single(UserSessionCounts(user, s.nSessions, s.nEvents))
    }
  }

  /** [[sessionCounts]] on transformWithState (see SessionCountsProcessor).
    * The session must run the RocksDB state-store provider. */
  def sessionCountsTws(events: DataFrame, gapUs: Long): Dataset[UserSessionCounts] = {
    val ss = events.sparkSession
    import ss.implicits._
    events.select(col("user_id").cast("long"), col("us").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionCountsProcessor(gapUs),
        TimeMode.None(), OutputMode.Update())
  }

  /**
   * CLOSED-session emission on `transformWithState` with EVENT-TIME TIMERS —
   * the modern-API twin of [[closedSessions]]: a session row emits when a
   * later event opens the next session, or when the registered per-user
   * timer (end-of-session + gap) fires as the watermark passes it
   * (`handleExpiredTimer` flushes the open session and CLEARS the state —
   * bounded by active users, identical to the EventTimeTimeout regime).
   * Each batch re-arms the single per-user timer: the old one is deleted,
   * end-of-session + gap registered.
   */
  final class ClosedSessionsProcessor(gapUs: Long)
    extends StatefulProcessor[Long, (Long, Long, Long, java.sql.Timestamp), ClosedSession] {
    @transient private var st: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val evs = rows.toArray.sortBy(e => (e._2, e._3))
      var s = if (st.exists()) st.get() else emptyState
      val out = Seq.newBuilder[ClosedSession]
      evs.foreach { case (_, us, _, _) =>
        val (next, isNew) = fold(s, us, gapUs)
        if (isNew && s.nEvents > 0L)
          out += ClosedSession(user, s.openStartUs, s.lastUs, s.openEvents)
        s = next
      }
      st.update(s)
      getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
      getHandle.registerTimer((s.lastUs + gapUs) / 1000L)
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!st.exists()) Iterator.empty
      else {
        val s = st.get()
        st.clear()
        Iterator.single(ClosedSession(user, s.openStartUs, s.lastUs, s.openEvents))
      }
    }
  }

  /** [[closedSessions]] on transformWithState event-time timers (see
    * ClosedSessionsProcessor). RocksDB provider required; the input must be
    * watermarked on `tts` exactly like the flatMapGroupsWithState form. */
  def closedSessionsTws(events: DataFrame, gapUs: Long,
      watermarkDelay: String): Dataset[ClosedSession] = {
    val ss = events.sparkSession
    import ss.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("us").cast("long").as("us"), col("event_id").cast("long").as("event_id"))
      .withColumn("tts", timestamp_micros(col("us")))
      .withWatermark("tts", watermarkDelay)
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new ClosedSessionsProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /**
   * CLOSED sessions via `flatMapGroupsWithState` + `EventTimeTimeout` —
   * Append-mode: a session row emits when a later event of the same user
   * opens the next session, or when the event-time watermark passes the open
   * session's end + gap (the timeout branch flushes it). `watermarkDelay`
   * is the lateness horizon: a production tail sets it to the source's
   * redelivery/lateness bound so idle users' sessions close and their state
   * is REMOVED (bounded state); a drain that must emit only
   * definitely-closed sessions sets it effectively infinite (timeouts never
   * fire, each user's open tail session stays unemitted — the
   * `s7_closed_sessions` oracle shape).
   */
  def closedSessions(events: DataFrame, gapUs: Long,
      watermarkDelay: String): Dataset[ClosedSession] = {
    val ss = events.sparkSession
    import ss.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("us").cast("long").as("us"), col("event_id").cast("long").as("event_id"))
      .withColumn("tts", timestamp_micros(col("us")))
      .withWatermark("tts", watermarkDelay)
      // the watermark column must survive into the stateful operator's input
      // (projecting it away drops the watermark tag)
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, java.sql.Timestamp)], state: GroupState[SessionState]) =>
          if (!it.hasNext && state.hasTimedOut) {
            // Watermark passed the open session's end + gap: nothing can
            // extend it any more — flush and DROP the state (idle users cost
            // nothing once closed).
            val st = state.get
            state.remove()
            Iterator.single(ClosedSession(user, st.openStartUs, st.lastUs, st.openEvents))
          } else {
            val evs = it.toArray.sortBy(e => (e._2, e._3))
            var st = state.getOption.getOrElse(emptyState)
            val out = Seq.newBuilder[ClosedSession]
            evs.foreach { case (_, us, _, _) =>
              val (next, isNew) = fold(st, us, gapUs)
              if (isNew && st.nEvents > 0L)
                out += ClosedSession(user, st.openStartUs, st.lastUs, st.openEvents)
              st = next
            }
            state.update(st)
            // Event-time timeout at end-of-session + gap (ms resolution).
            state.setTimeoutTimestamp((st.lastUs + gapUs) / 1000L)
            out.result().iterator
          }
      }
  }

  // ------------------------------------------------ MapState/ListState (r10)

  final case class UserActivitySummary(
      user_id: Long, n_types: Long, n_events: Long, top_ids: Seq[Long])

  /**
   * Per-user activity summary on `transformWithState` with the two COMPOSITE
   * state types the ValueState sessions above don't exercise:
   *  - `MapState[event_type → count]`: per-key INCREMENTS — a new event
   *    touches exactly its type's entry, never rewrites the whole map (the
   *    state-store point of MapState: a user with 1000 distinct types costs
   *    one key update per event, not a 1000-entry value rewrite);
   *  - `ListState[top event ids]`: the running top-`k` ids, merged per batch
   *    and written back bounded (order-independent, so cross-batch arrival
   *    order cannot change the result).
   * Emits the user's current (n_types, n_events, top_ids) each batch
   * (Update mode); all three are monotone under accumulation, so the drained
   * sink's per-user MAX row is the final state — which is what the oracle
   * states in SQL.
   */
  final class ActivitySummaryProcessor(topK: Int)
    extends StatefulProcessor[Long, (Long, String, Long), UserActivitySummary] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var topIds: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState("typeCounts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      topIds = getHandle.getListState("topIds", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[UserActivitySummary] = {
      val evs = rows.toArray
      evs.foreach { case (_, tpe, _) =>
        val cur = if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L
        counts.updateValue(tpe, cur + 1L)
      }
      val merged = (topIds.get().toSeq ++ evs.map(_._3))
        .sorted(Ordering[Long].reverse).take(topK)
      topIds.put(merged.toArray)
      var nTypes = 0L
      var nEvents = 0L
      counts.iterator().foreach { p => nTypes += 1; nEvents += p._2 }
      Iterator.single(UserActivitySummary(user, nTypes, nEvents, merged))
    }
  }

  /** Per-user (n_types, n_events, top-k ids) via [[ActivitySummaryProcessor]]
    * (RocksDB state store required). Input columns: user_id, event_type,
    * event_id. */
  def activitySummaryTws(events: DataFrame, topK: Int): Dataset[UserActivitySummary] = {
    val ss = events.sparkSession
    import ss.implicits._
    events.select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("event_id").cast("long"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new ActivitySummaryProcessor(topK),
        TimeMode.None(), OutputMode.Update())
  }
}
