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
    * events for a user, folding them into the running state in
    * (event-time, id) order so results are deterministic and identical
    * to the batch q_stream_stateful query. */
  def update(user: Long, events: Iterator[Ev],
             state: GroupState[UserState]): (Long, UserState) = {
    val init = state.getOption.getOrElse(UserState(0L, 0L, null, Long.MinValue, Long.MinValue))
    val next = events.toSeq.sortBy(e => (e.tsMicros, e.event_id)).foldLeft(init) { (st, e) =>
      val isNewer = e.tsMicros > st.lastTsMicros ||
        (e.tsMicros == st.lastTsMicros && e.event_id > st.lastId)
      UserState(
        st.n_events + 1,
        st.value_c + e.valueMicros,
        if (isNewer) e.event_type else st.last_type,
        if (isNewer) e.tsMicros else st.lastTsMicros,
        if (isNewer) e.event_id else st.lastId)
    }
    state.update(next)
    (user, next)
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
    * crosses — the "notify on milestone" pattern. Emission count depends
    * on state, not batch boundaries, so streaming output over any
    * batching equals the batch computation (asserted in tests). */
  case class Milestone(user_id: Long, threshold: Long, atEventId: Long)

  def milestones(events: Dataset[Ev]): Dataset[Milestone] = {
    import events.sparkSession.implicits._
    val step = 10L * 1000000L // 10 value-units in micros
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) => {
          var acc = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[Milestone]()
          evs.toSeq.sortBy(e => (e.tsMicros, e.event_id)).foreach { e =>
            val before = acc / step
            acc += e.valueMicros
            val after = acc / step
            (before + 1 to after).foreach(k => out += Milestone(user, k * step, e.event_id))
          }
          state.update(acc)
          out.iterator
        })
  }
}
