package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed-state operators via `flatMapGroupsWithState` — the
  * Structured Streaming extension point for semantics the built-in
  * stateful operators can't express (SURVEY.md §2.10; the engine-surface
  * analog of Autoloader/DLT's managed state).
  *
  * Scale notes: state lives in the state store keyed by the group key
  * (hash-partitioned, checkpointed, incrementally committed per batch);
  * `ProcessingTimeTimeout` bounds state lifetime so long-running streams
  * don't grow without limit — the knob the reference's unbounded
  * `dropDuplicates` lacks (SURVEY §2.7 D1 late-data note).
  */
object StatefulOps {

  /** Keyed first-arrival-wins dedup with explicit state (NoTimeout):
    * emits the first row per key ever seen, drops all re-sends. State is
    * unbounded — the reference's own `dropDuplicates` semantics — but
    * here it is *explicit*, checkpointed, and AvailableNow-friendly
    * (NoTimeout never schedules timer-only batches, so drain-and-stop
    * triggers terminate). */
  def dedupWithState[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K): Dataset[V] = {
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, V](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[V], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
  }

  /** Keyed dedup with a processing-time TTL: drops re-sends while the
    * key's state is alive and expires state after `ttlMs` of inactivity —
    * the bounded-memory knob the built-in unbounded `dropDuplicates`
    * lacks. ONLY for continuously-triggered streams: with
    * `Trigger.AvailableNow` the pending timeout timers keep scheduling
    * micro-batches until the TTL elapses (observed as a busy drain loop) —
    * use [[dedupWithState]] for drain-and-stop jobs. */
  def dedupWithTtl[K: Encoder, V: Encoder](
      ds: Dataset[V], key: V => K, ttlMs: Long): Dataset[V] = {
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, V](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (_: K, rows: Iterator[V], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            state.setTimeoutDuration(ttlMs)
            Iterator.empty // duplicate within TTL window
          } else {
            state.update(true)
            state.setTimeoutDuration(ttlMs)
            rows.take(1) // first arrival wins
          }
      }
  }

  /** Keyed running aggregate with custom state: per-key event count and
    * value sum, emitted per batch (update semantics). Demonstrates
    * arbitrary accumulator state beyond built-in aggs. */
  case class RunningStat(key: Long, n: Long, total: Double)

  def runningStats(ds: Dataset[(Long, Double)]): Dataset[RunningStat] = {
    implicit val statEnc: Encoder[RunningStat] = Encoders.product[RunningStat]
    implicit val bufEnc: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), RunningStat](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          Iterator.single(RunningStat(key, n, s))
      }
  }

  // ── transformWithState (Spark 4 arbitrary-state API) ───────────────────

  /** [[runningStats]] re-expressed on `transformWithState`, Spark 4's
    * successor to `flatMapGroupsWithState`: typed per-key `ValueState`
    * handles with store-managed TTL (TTL eviction happens in the state
    * store, not in user code — no timer-driven busy drains), plus timers
    * and multi-state composition the old API lacks. Requires the RocksDB
    * state store provider. */
  class RunningStatProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double), RunningStat] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)]("acc",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[RunningStat] = {
      val (n0, s0) = Option(state.get()).getOrElse((0L, 0.0))
      var n = n0; var s = s0
      rows.foreach { case (_, v) => n += 1; s += v }
      state.update((n, s))
      Iterator.single(RunningStat(key, n, s))
    }
  }

  def runningStatsTws(ds: Dataset[(Long, Double)]): Dataset[RunningStat] = {
    implicit val statEnc: Encoder[RunningStat] = Encoders.product[RunningStat]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(_._1)
      .transformWithState(new RunningStatProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  // ── Event-time timer sessionization (transformWithState + timers) ──────

  /** A closed session: emitted when the event-time watermark passes the
    * last event plus the gap — the streaming-native answer to "the user
    * stopped"; no poll loop, no processing-time coupling. Times in ms. */
  case class SessionOut(user: Long, startMs: Long, endMs: Long, nEvents: Long)

  /** Per-user gap sessionization with EVENT-TIME TIMERS: state holds the
    * open session (start, last, count); every batch re-arms one timer at
    * `last + gap`, and the session is emitted from `handleExpiredTimer`
    * when the watermark crosses it — state is cleared, so memory is one
    * tuple per ACTIVE user, not per user ever seen. Within-batch gap
    * splits emit immediately (they can never reopen). This is the timer
    * surface `flatMapGroupsWithState` never had cleanly: the old API
    * couples timeouts to batch planning; timers here are store-managed
    * and fire exactly when the watermark says so. */
  class SessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp), SessionOut] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("sess",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, java.sql.Timestamp)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] = {
      val times = rows.map(_._2.getTime).toArray.sorted
      var closed = List.empty[SessionOut]
      var cur = Option(st.get())
      times.foreach { t =>
        cur match {
          case Some((s0, l0, n0)) if t - l0 <= gapMs =>
            cur = Some((s0, math.max(l0, t), n0 + 1))
          case Some((s0, l0, n0)) =>
            closed ::= SessionOut(key, s0, l0, n0)
            cur = Some((t, t, 1L))
          case None =>
            cur = Some((t, t, 1L))
        }
      }
      cur.foreach { case (s0, l0, n0) =>
        st.update((s0, l0, n0))
        getHandle.listTimers().foreach(getHandle.deleteTimer) // re-arm
        getHandle.registerTimer(l0 + gapMs)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(key: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] =
      Option(st.get()) match {
        case Some((s0, l0, n0)) if info.getExpiryTimeInMs >= l0 + gapMs =>
          st.clear()
          Iterator.single(SessionOut(key, s0, l0, n0))
        case _ => Iterator.empty // superseded timer of an extended session
      }
  }

  // ── MapState: per-key sub-keyed state (the third tws state shape) ──────

  /** Per-user per-event-type running counts on `MapState` — sub-keyed
    * state the old API could only fake by serializing a whole map into
    * one value (rewriting the full map every batch). MapState reads and
    * writes individual (user, type) entries in the store, so a user with
    * thousands of types pays per-touched-type, not per-map. Emits the
    * updated (user, event_type, n) rows each batch (Update mode). */
  class TypeCountsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String), (Long, String, Long)] {
    @transient private var m:
      org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      m = getHandle.getMapState[String, Long]("typeCounts",
        Encoders.STRING, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, String, Long)] = {
      val touched = scala.collection.mutable.LinkedHashSet[String]()
      rows.foreach { case (_, t) =>
        val cur = if (m.containsKey(t)) m.getValue(t) else 0L
        m.updateValue(t, cur + 1L)
        touched += t
      }
      touched.iterator.map(t => (key, t, m.getValue(t)))
    }
  }

  /** Running (user, event_type) counts over a stream; per-entry state IO. */
  def typeCountsTws(ds: Dataset[(Long, String)]): Dataset[(Long, String, Long)] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[(Long, String, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong)
    ds.groupByKey(_._1)
      .transformWithState(new TypeCountsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Sessionize a watermarked (user, event-time) stream; emits each
    * session once, when the watermark passes its close. */
  def sessionizeTws(ds: Dataset[(Long, java.sql.Timestamp)],
      gapMs: Long): Dataset[SessionOut] = {
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }
}
