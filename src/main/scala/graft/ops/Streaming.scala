package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing / dedup / stateful queries — SURVEY.md §2.I, in
  * their batch-equivalent forms (identical `window`/`session_window`
  * expressions run over the same plans in Structured Streaming; the
  * streaming-specific plumbing — watermark, AvailableNow, state store —
  * lives in graft.streaming and its ScalaTest suite).
  *
  * Reference anchors: daily tumbling micro-batch (main.tf:214-218 cron),
  * 24 h look-back (src/main.py:263), 30-min tolerated lateness
  * (main.tf:309), overlapping-window dedup need (src/main.py:263),
  * running per-key counter (src/main.py:156).
  */
object Streaming {

  val qs: Map[String, Q] = Map(
    // I1: tumbling 1-day event-time window — the reference's daily batch.
    "q_stream_tumbling" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "1 day").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), sum(U.micros($"value")).as("value_c"))
        .select(U.dayStr($"w.start").as("day"), $"event_type", $"n", $"value_c")
        .orderBy("day", "event_type")
    }),
    // I2: sliding window (1 h every 30 min) — each event in 2 buckets.
    "q_stream_sliding" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(U.tsStr($"w.start").as("w_start"), $"event_type", $"n")
        .orderBy("w_start", "event_type")
    }),
    // I3: session window, 30-min gap per user. Batch `session_window`
    // merges exactly like the gaps-and-islands oracle: a session breaks
    // where ts - prev_ts > gap.
    "q_stream_session" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n"), sum(U.micros($"value")).as("value_c"))
        .select($"user_id", U.tsStr($"w.start").as("session_start"), $"n", $"value_c")
        .orderBy("user_id", "session_start")
    }),
    // I3b: DYNAMIC-gap session window — the gap is a per-event
    // expression (purchases close a session in 10 min, everything else
    // 30), so session shape adapts to behavior. Spark merges the
    // per-event [ts, ts+gap) intervals; the oracle reproduces the merge
    // as gaps-and-islands over a running MAX of interval ends.
    "q_stream_session_dyn" -> ((s, d) => {
      import s.implicits._
      val gap = when($"event_type" === "purchase", lit("10 minutes"))
        .otherwise(lit("30 minutes"))
      Tables.events(s, d)
        .groupBy(session_window($"ts", gap).as("w"), $"user_id")
        .agg(count(lit(1)).as("n"), sum(U.micros($"value")).as("value_c"))
        .select($"user_id", U.tsStr($"w.start").as("session_start"), $"n", $"value_c")
        .orderBy("user_id", "session_start")
    }),
    // I5: dedup — first occurrence per (user_id, event_type) in arrival
    // (event-time) order, the deterministic batch form of
    // withWatermark().dropDuplicates() on a re-delivered stream.
    "q_stream_dedup" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id".as("first_event_id"))
        .orderBy("user_id", "event_type")
    }),
    // I9: stream-stream interval join (click attribution): for each
    // purchase, the same user's clicks in the preceding hour. Batch form
    // here (oracle-backed; equi-join on user_id + time-range residual);
    // the TRUE two-stream form — both sides watermarked, the interval
    // condition bounding join state so clicks older than the watermark
    // are evicted — runs in StreamingSuite and is asserted equal to this
    // plan's pairs on the same input.
    "q_stream_join" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
      purchases.join(clicks, Seq("user_id"))
        .filter($"click_ts" <= $"purchase_ts" &&
          $"click_ts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"))
        .groupBy($"user_id", $"purchase_id")
        .agg(count(lit(1)).as("n_clicks_1h"), min($"click_id").as("first_click_id"))
        .orderBy("user_id", "purchase_id")
    }),
    // Funnel analysis (ordered event-pattern match): how far each user
    // progresses through click → view → purchase IN ORDER — the product-
    // analytics query every event warehouse runs. Each step is the min
    // event time strictly after the previous step's time: three
    // partial-aggregable per-user min-aggregates chained by equi-joins
    // on user_id (each join's right side is one row per user — AQE
    // broadcasts the later stages as the funnel narrows), never a
    // per-user ordered scan, so the op is three shuffles flat at 100 TB.
    "q_funnel" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val users = e.select($"user_id").distinct()
      val s1 = e.filter($"event_type" === "click")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val s2 = e.filter($"event_type" === "view")
        .join(s1, "user_id").filter($"ts" > $"t1")
        .groupBy($"user_id").agg(min($"ts").as("t2"))
      val s3 = e.filter($"event_type" === "purchase")
        .join(s2, "user_id").filter($"ts" > $"t2")
        .groupBy($"user_id").agg(min($"ts").as("t3"))
      users
        .join(s1, Seq("user_id"), "left")
        .join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select($"user_id",
          when($"t3".isNotNull, 3L).when($"t2".isNotNull, 2L)
            .when($"t1".isNotNull, 1L).otherwise(0L).as("stage"),
          U.tsStr($"t1").as("t1"), U.tsStr($"t2").as("t2"), U.tsStr($"t3").as("t3"))
        .orderBy("user_id")
    }),
    // Cohort retention (the activity matrix behind every retention
    // chart): users cohorted by their first-activity day; each
    // (cohort_day, day_offset) cell counts distinct cohort members
    // active offset days later. Cohort assignment is one per-user min
    // (partial-aggregable), activity is a distinct (user, day) aggregate
    // — both map-side-combinable — chained by ONE user_id equi-join, so
    // the matrix costs two shuffles + a join at any corpus size.
    "q_retention" -> ((s, d) => {
      import s.implicits._
      val acts = Tables.events(s, d)
        .select($"user_id", to_date($"ts").as("day")).distinct()
      val cohorts = acts.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      acts.join(cohorts, "user_id")
        .select($"cohort_day", datediff($"day", $"cohort_day").cast("long").as("day_offset"))
        .groupBy($"cohort_day", $"day_offset")
        .agg(count(lit(1)).as("n_users"))
        .select(date_format($"cohort_day", "yyyy-MM-dd").as("cohort_day"),
          $"day_offset", $"n_users")
        .orderBy("cohort_day", "day_offset")
    }),
    // I15: event-transition matrix — per-user next-event bigram counts
    // plus each transition's share of its source state's outflow (the
    // Markov chain behind journey/Sankey analytics). One user-partitioned
    // lag window (the same single-exchange shape as q_sessionize), then a
    // partial-aggregable (from, to) count; the per-source outflow total
    // rides a second tiny aggregate joined back on the |types|²-bounded
    // matrix — never on the event stream. Share in exact ppm (int64 of
    // count·1e6 div total), so the matrix is engine-identical.
    "q_transitions" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val m = Tables.events(s, d)
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
        .agg(count(lit(1)).as("n"))
      val out = m.groupBy($"from_type").agg(sum($"n").as("outflow"))
      m.join(out, Seq("from_type"))
        .select($"from_type", $"to_type", $"n",
          expr("n * 1000000L div outflow").as("share_ppm"))
        .orderBy("from_type", "to_type")
    }),
    // I16: interval concurrency via sweep-line delta decomposition — how
    // many orders are "open" (within 30 days of placement) on each
    // calendar day. The naive form is a day×interval range join (corpus ×
    // days rows); the scale form aggregates each interval to a +1 delta
    // on its start day and a −1 on its end day (partial-aggregable — the
    // full shuffle carries one row per DAY, not per order), then a
    // running sum over the day DOMAIN — bounded by the calendar, not the
    // corpus, so the single-partition cumsum window is O(days) at any
    // scale. Same decomposition family as q_join_theta's histogram+cumsum.
    "q_interval_concurrency" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .select(to_date($"o_orderdate").as("lo"),
          date_add(to_date($"o_orderdate"), 30).as("hi"))
      val deltas = o.select($"lo".as("day"), lit(1L).as("delta"))
        .unionAll(o.select($"hi".as("day"), lit(-1L).as("delta")))
        .groupBy($"day").agg(sum($"delta").as("delta"))
      val w = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("open_orders", sum($"delta").over(w))
        .select(date_format($"day", "yyyy-MM-dd").as("day"), $"delta", $"open_orders")
        .orderBy("day")
    }),
    // I14: time-series resample to a fixed per-key grid + gap fill — the
    // batch form of "regularize an irregular event stream before
    // windowed feature extraction". Unlike q_win_fill (which fills nulls
    // in EXISTING rows), this GENERATES the missing buckets: per-user
    // hourly buckets are aggregated (map-side-combinable int64 sums),
    // the (min,max) hour span per user is one tiny aggregate, and
    // `sequence(lo, hi, 1 hour)` exploded generator-side densifies the
    // grid without a shuffle beyond the bucket join. Forward fill is a
    // per-user ordered window (partitioned on the grid key — bounded by
    // span-hours per user, not corpus size). Empty buckets report n=0
    // and carry the last observed value (0 before any observation).
    "q_resample_gapfill" -> ((s, d) => {
      import s.implicits._
      val b = Tables.events(s, d)
        .select($"user_id", date_trunc("hour", $"ts").as("h"),
          U.micros($"value").cast("long").as("vm"))
        .groupBy($"user_id", $"h")
        .agg(sum($"vm").as("vm"), count(lit(1)).as("n"))
      // Densification contract (scale guard): the generated grid is
      // users × span-hours — inherent to resampling, and the one term
      // here that does NOT track input size (a single user with a
      // 10-year-wide pair of events mints 87k rows from 2). Cap the
      // per-user span at 3 years (26 281 hourly buckets) and fail
      // LOUDLY past it rather than silently densifying: a span that
      // wide is an upstream data bug (stale clock, epoch-zero ts), and
      // the operator's cost model is void beyond the stated envelope.
      // The guard is one expression over the per-user (lo, hi) roll-up
      // — corpus-size-free. Pinned by StreamingSuite.
      val maxSpanHours = 26281L
      val grid = b.groupBy($"user_id").agg(min($"h").as("lo"), max($"h").as("hi"))
        .withColumn("_span_ok",
          when(expr("timestampdiff(HOUR, lo, hi)") <= maxSpanHours, lit(true))
            .otherwise(raise_error(concat(
              lit(s"resample span exceeds $maxSpanHours h for user "),
              $"user_id".cast("string")))))
        .filter($"_span_ok")
        .select($"user_id", explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      val w = Window.partitionBy($"user_id").orderBy($"h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // MERGE hint — the gap-fill join must be a SHUFFLE join at every
      // scale. Generator amplification is invisible to AQE: it sizes
      // the pre-explode exchange on the tiny per-user (lo, hi) roll-up
      // and coalesces it, and if the hourly aggregate then broadcasts
      // (it does at small SF), NOTHING downstream ever redistributes —
      // the 100-1000× densified grid runs the join, the fill window and
      // the output sort on a handful of starved partitions (measured
      // 3.7× slower at sf0.1×10 than the shuffle plan). The hinted
      // shuffle join plants an exchange AFTER the explode, sized on the
      // real grid bytes — and at crawl scale the per-hour aggregate
      // could never broadcast anyway, so this also pins the one plan
      // shape that exists at 100 TB.
      grid.join(b.hint("merge"), Seq("user_id", "h"), "left")
        .select($"user_id", $"h", coalesce($"n", lit(0L)).as("n"),
          coalesce(last($"vm", ignoreNulls = true).over(w), lit(0L)).as("vm_filled"))
        .select($"user_id", U.tsStr($"h").as("hour"), $"n", $"vm_filled")
        .orderBy("user_id", "hour")
    }),
    // I6: stateful per-key processing — the final state a
    // mapGroupsWithState counter would hold per user: event count,
    // value sum, last event type. (The true streaming form is in
    // graft.streaming.Stateful, asserted equal to this in tests.)
    "q_stream_stateful" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      val last = e.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"event_type".as("last_type"))
      e.groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), sum(U.micros($"value")).as("value_c"))
        .join(last, Seq("user_id"))
        .orderBy("user_id")
    })
  )
}
