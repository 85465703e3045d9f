package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event record for the stateful/streaming layer (events table,
  * FIXTURES.md §1; ts carried as epoch-micros long so the Encoder is
  * timezone-free). */
case class Ev(event_id: Long, tsMicros: Long, user_id: Long,
              event_type: String, valueMicros: Long)

/** Per-user running state — the Spark-native form of the reference's
  * running counter `results_counted += result_count`
  * (reference src/main.py:156), kept per key in the state store. */
case class UserState(n_events: Long, value_c: Long,
                     last_type: String, lastTsMicros: Long, lastId: Long)

object Stateful {

  /** mapGroupsWithState update fn — processes each micro-batch's new
    * events for a user with a single-pass incremental fold: count and sum
    * are commutative and last_type is max-by-(tsMicros, event_id), so no
    * ordering of the input is needed — results are deterministic for ANY
    * iterator order and identical to the batch q_stream_stateful query.
    *
    * Deliberately O(1) heap per key: the group iterator streams from
    * Spark's (disk-backed) shuffle, so a whale key that receives millions
    * of events in one micro-batch costs no executor memory. (The previous
    * toSeq.sortBy materialized + sorted the whole batch per key — one
    * skewed key could OOM an executor; WhaleKeySuite pins the new bound.) */
  def update(user: Long, events: Iterator[Ev],
             state: GroupState[UserState]): (Long, UserState) = {
    val next = fold(
      state.getOption.getOrElse(UserState(0L, 0L, null, Long.MinValue, Long.MinValue)),
      events)
    state.update(next)
    (user, next)
  }

  private def fold(init: UserState, events: Iterator[Ev]): UserState = {
    var n = init.n_events
    var v = init.value_c
    var lastType = init.last_type
    var lastTs = init.lastTsMicros
    var lastId = init.lastId
    while (events.hasNext) {
      val e = events.next()
      n += 1
      v += e.valueMicros
      if (e.tsMicros > lastTs || (e.tsMicros == lastTs && e.event_id > lastId)) {
        lastType = e.event_type; lastTs = e.tsMicros; lastId = e.event_id
      }
    }
    UserState(n, v, lastType, lastTs, lastId)
  }

  /** §2.I6 with state expiry — the other half of state hardening: per-key
    * O(1) heap (the incremental fold) bounds a BATCH; TTL eviction bounds
    * the STORE. At 100 TB key cardinalities (billions of users), state
    * for idle keys must age out or the state store grows without bound.
    * `ProcessingTimeTimeout`: a key idle past `ttl` emits its final state
    * once more (flush) and is removed; if it reappears, it restarts from
    * zero (tested in StreamingSuite I6c). */
  def userCountersWithTtl(events: Dataset[Ev],
                          ttl: java.time.Duration): Dataset[(Long, UserState)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            (user, last)
          } else {
            val next = fold(
              state.getOption.getOrElse(UserState(0L, 0L, null, Long.MinValue, Long.MinValue)),
              evs)
            state.update(next)
            state.setTimeoutDuration(ttl.toMillis)
            (user, next)
          }
      }
  }

  /** Streaming per-user counters over a (possibly streaming) Dataset[Ev].
    * Output rows carry the state after each update — in Update mode the
    * last row per user is the final state. */
  def userCounters(events: Dataset[Ev]): Dataset[(Long, UserState)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  /** The events table as Dataset[Ev] (batch) — for the batch≡stream test. */
  def eventsDs(spark: SparkSession, dir: String): Dataset[Ev] = {
    import spark.implicits._
    graft.Tables.events(spark, dir)
      .select(
        $"event_id",
        unix_micros($"ts").as("tsMicros"),
        $"user_id",
        $"event_type",
        floor($"value" * 1000000).cast("long").as("valueMicros"))
      .as[Ev]
  }

  /** Streaming watermark + dedup (§2.I4/I5): drop events later than the
    * 30-min tolerated lateness, dedup re-deliveries by event_id — the
    * overlapping-24h-window dedup the reference needs but never wrote
    * (src/main.py:263). */
  def dedupStream(events: Dataset[Ev]): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros($"tsMicros"))
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("event_id")
      .drop("ts")
      .as[Ev]
  }

  /** §2.I5b — `dropDuplicatesWithinWatermark` (Spark 3.5+): unlike plain
    * dropDuplicates (whose per-key state lives forever unless the event-
    * time column is part of the key), state here is EVICTED once the key
    * falls behind the watermark — the form that holds at 100 TB where a
    * re-delivery can only arrive within the delay bound, so the dedup
    * state is O(events-in-watermark-window), not O(all keys ever seen).
    * Re-deliveries may carry a DIFFERENT event time within the bound
    * (retry after seconds — the real shape) and still dedupe. */
  def dedupWithinWatermark(events: Dataset[Ev]): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros($"tsMicros"))
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .drop("ts")
      .as[Ev]
  }

  /** Streaming tumbling 1-day window counts (§2.I1) with watermark —
    * OutputMode.Append-capable; batch-equivalent of q_stream_tumbling. */
  def tumblingCounts(events: Dataset[Ev]) = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros($"tsMicros"))
      .withWatermark("ts", "30 minutes")
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"valueMicros").as("value_c"))
      .select(date_format($"w.start", "yyyy-MM-dd").as("day"), $"event_type", $"n", $"value_c")
  }

  val outputModeUpdate: OutputMode = OutputMode.Update()

  /** flatMapGroupsWithState surface (§2.I6's 0..n-emissions form): emits
    * one alert per 10-value-unit threshold a user's running value sum
    * crosses — the "notify on milestone" pattern.
    *
    * The emission is deliberately order-free: with non-negative event
    * values the thresholds a batch crosses are exactly
    * (floor(accBefore/step), floor(accAfter/step)], which depends only on
    * the running sum — not on the order events are folded in, and not on
    * how the stream is batched. That makes the operator a single-pass
    * O(1)-heap fold per key (whale-safe, same reasoning as `update`) and
    * exactly-once across any batching. Attributing each crossing to the
    * specific event that crossed it would require a total (ts, id) order
    * over arbitrary arrival — i.e. buffering a whale key's entire
    * micro-batch — for a decoration the alert semantic doesn't need. */
  case class Milestone(user_id: Long, threshold: Long)

  val MilestoneStep: Long = 10L * 1000000L // 10 value-units in micros

  /** The state fn, named so WhaleKeySuite can drive it directly with a
    * lazily-generated 10^7-event iterator through one key. */
  def milestoneFold(user: Long, evs: Iterator[Ev],
                    state: GroupState[Long]): Iterator[Milestone] = {
    var acc = state.getOption.getOrElse(0L)
    val before = acc / MilestoneStep
    while (evs.hasNext) acc += evs.next().valueMicros
    state.update(acc)
    (before + 1 to acc / MilestoneStep).iterator.map(k => Milestone(user, k * MilestoneStep))
  }

  def milestones(events: Dataset[Ev]): Dataset[Milestone] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(milestoneFold _)
  }

  /** §2.I6e — the same per-user counters on Spark 4's `transformWithState`
    * operator (the arbitrary-state API that replaces mapGroupsWithState:
    * named state variables, per-variable TTL, timers, and RocksDB-only
    * state). The fold is the shared O(1)-heap incremental one, so results
    * are batch-identical for any event arrival order; StreamingSuite I6e
    * asserts equality with the batch oracle. */
  class CountersProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Ev, (Long, UserState)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[UserState] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[UserState]("counters",
        org.apache.spark.sql.Encoders.product[UserState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, UserState)] = {
      val next = fold(
        if (st.exists()) st.get()
        else UserState(0L, 0L, null, Long.MinValue, Long.MinValue), rows)
      st.update(next)
      Iterator.single((user, next))
    }
  }

  def userCountersTws(events: Dataset[Ev]): Dataset[(Long, UserState)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new CountersProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }
}
