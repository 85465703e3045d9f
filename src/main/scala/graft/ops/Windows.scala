package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions — SURVEY.md §2.E. Anchors: "the latest posts"
  * (reference README.md:2), time-ordered file layout (src/main.py:177),
  * ranking by public_metrics (src/main.py:90).
  *
  * Determinism: every window ORDER BY carries event_id as a unique
  * tiebreaker, except the ranking family where tie semantics are the
  * point (rank/dense_rank/percent_rank are tie-stable by definition;
  * ntile is not, so it gets the fully-ordered spec). events.ts is ns in
  * parquet (µs in Spark), so the oracle orders by CAST(ts AS TIMESTAMP).
  */
object Windows {

  /** Low-cardinality-key hardening for trailing-RANGE frames: a window
    * partitioned on a 5-value key is 5 giant per-key sorts at 100 TB,
    * and windows are NOT AQE-skew-splittable (the sort must see the
    * whole partition). This variant re-partitions each key by time
    * CHUNK of the window width and adds each row as a non-emitting
    * "ghost" contributor to the NEXT chunk: a row's trailing frame
    * [sec−W+1, sec] can only reach its own and the previous chunk, so
    * every frame is complete inside the (key, chunk) partition and the
    * sort fans out over key × time instead of key. Costs one duplication
    * of the input through the shuffle; returns exactly the naive
    * window's rows (SkewSuite proves equality on a planted whale key,
    * and q_win_range_salted carries the same DuckDB oracle as
    * q_win_range). */
  def saltedTrailingRange(df: DataFrame, key: String, sec: String,
                          valueMicros: Column, windowSecs: Long): DataFrame = {
    val chunk = floor(col(sec) / windowSecs)
    val own = df.withColumn("_chunk", chunk).withColumn("_ghost", lit(false))
    val ghost = df.withColumn("_chunk", chunk + 1).withColumn("_ghost", lit(true))
    val w = Window.partitionBy(col(key), col("_chunk")).orderBy(col(sec))
      .rangeBetween(-(windowSecs - 1), 0)
    own.unionByName(ghost)
      .withColumn("trailing_c", sum(valueMicros).over(w))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .filter(!col("_ghost"))
      .drop("_chunk", "_ghost")
  }

  /** Low-cardinality-key hardening for the ranking family: two passes,
    * neither of which sorts a whole key's rows. Pass 1 is a
    * partial-aggregable (key, value) histogram — the whale key's
    * duplicate values combine map-side, so the full-data shuffle carries
    * distinct pairs, not rows. Pass 2 does the rank arithmetic on that
    * value-domain-sized set (rank = 1 + count of strictly-greater rows;
    * dense_rank = position among distinct values) and joins it back on
    * (key, value) — an equi-join AQE CAN skew-split, unlike the window
    * sort it replaces. Same tie semantics as rank()/dense_rank(). The
    * join-back is null-SAFE (<=>): a window function keeps NULL keys and
    * values (they're just another group / another order position), so
    * the helper must too, or it silently drops rows the naive window
    * ranks. NULL values sort last under desc in both the histogram
    * window and the naive one, so the rank arithmetic already agrees. */
  def saltedRank(df: DataFrame, key: String, value: String): DataFrame = {
    val hist = df.groupBy(col(key), col(value)).agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy(col(key)).orderBy(col(value).desc)
    val ranked = hist.select(col(key).as("_sk"), col(value).as("_sv"),
      (coalesce(sum(col("_cnt")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) + 1L).as("rnk"),
      row_number().over(w).cast("long").as("drnk"))
    df.join(ranked, col(key) <=> col("_sk") && col(value) <=> col("_sv"))
      .drop("_sk", "_sv")
  }

  val qs: Map[String, Q] = Map(
    // E1: row_number — newest-first sequence per user.
    "q_win_rownum" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.events(s, d)
        .select($"user_id", $"event_id", row_number().over(w).cast("long").as("rn"))
        .orderBy("user_id", "rn")
    }),
    // E2: ranking family. rank/dense_rank/percent_rank over the tie-bearing
    // key; ntile over the totally-ordered key (position-dependent).
    "q_win_rank" -> ((s, d) => {
      import s.implicits._
      val ties = Window.partitionBy($"event_type").orderBy($"value".desc)
      val total = Window.partitionBy($"event_type").orderBy($"value".desc, $"event_id")
      Tables.events(s, d)
        .select($"event_type", $"event_id", $"value",
          rank().over(ties).cast("long").as("rnk"),
          dense_rank().over(ties).cast("long").as("drnk"),
          percent_rank().over(ties).as("prnk"),
          ntile(4).over(total).cast("long").as("quartile"))
        .orderBy("event_type", "rnk", "event_id")
    }),
    // E3: lag / lead along each user's event-time sequence.
    "q_win_lag_lead" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .select($"user_id", $"event_id", $"value",
          lag($"value", 1).over(w).as("prev_value"),
          lead($"event_type", 1).over(w).as("next_type"))
        .orderBy("event_id")
    }),
    // E4: moving average over a 3-row frame; int64 sum / count division.
    "q_win_moving_avg" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-2, 0)
      Tables.events(s, d)
        .select($"user_id", $"event_id",
          (sum(U.micros($"value")).over(w).cast("double") /
           count(lit(1)).over(w)).as("mov_avg_micros"))
        .orderBy("event_id")
    }),
    // E5: cumulative sum (unbounded preceding frame).
    "q_win_cumsum" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .select($"user_id", $"event_id", sum(U.micros($"value")).over(w).as("cum_c"))
        .orderBy("event_id")
    }),
    // E6: RANGE frame — trailing 1 hour by epoch-second key (peers included).
    "q_win_range" -> ((s, d) => {
      import s.implicits._
      val withSec = Tables.events(s, d).withColumn("sec", $"ts".cast("long"))
      val w = Window.partitionBy($"event_type").orderBy($"sec")
        .rangeBetween(-3599, 0)
      withSec
        .select($"event_type", $"event_id",
          sum(U.micros($"value")).over(w).as("trailing_c"),
          count(lit(1)).over(w).as("trailing_n"))
        .orderBy("event_id")
    }),
    // E6b: the same trailing-hour RANGE computation through the salted
    // two-pass path — identical output (same oracle SQL as q_win_range),
    // but the sort parallelism is event_type × hour-chunk instead of the
    // 5 event_type values.
    "q_win_range_salted" -> ((s, d) => {
      import s.implicits._
      val withSec = Tables.events(s, d).withColumn("sec", $"ts".cast("long"))
      saltedTrailingRange(withSec, "event_type", "sec", U.micros($"value"), 3600L)
        .select($"event_type", $"event_id", $"trailing_c", $"trailing_n")
        .orderBy("event_id")
    }),
    // E2b: rank/dense_rank through the salted histogram path — identical
    // tie semantics, no whole-key sort.
    "q_win_rank_salted" -> ((s, d) => {
      import s.implicits._
      saltedRank(Tables.events(s, d), "event_type", "value")
        .select($"event_type", $"event_id", $"value", $"rnk", $"drnk")
        .orderBy("event_type", "rnk", "event_id")
    }),
    // E8: value-positional family — first/last/nth over an explicit frame
    // (last_value needs the full-partition frame; the default frame stops
    // at CURRENT ROW and silently returns the current row's value).
    "q_win_first_last" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select($"user_id", $"event_id",
          first($"event_type").over(w).as("first_type"),
          last($"event_type").over(w).as("last_type"),
          nth_value($"event_type", 2).over(w).as("second_type"))
        .orderBy("event_id")
    }),
    // E7: top-K per group — "top tweets per team per day" shape.
    "q_win_topk_per_group" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"value".desc, $"event_id")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"event_type", $"rn", $"event_id", $"value")
        .orderBy("event_type", "rn")
    }),
    // E11: percent-of-total (ratio-to-report) — each (day, type)'s share
    // of its day's value total, in exact ppm so both engines agree
    // bit-for-bit. The unordered full-partition window sum runs on the
    // day×type aggregate (bounded by the type domain), never the event
    // stream; nullif guards an all-zero day (NULL share in both engines
    // rather than a DuckDB division error).
    "q_win_pct_of_total" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
        .select(U.dayStr($"ts").as("day"), $"event_type",
          U.micros($"value").cast("long").as("vm"))
        .groupBy($"day", $"event_type").agg(sum($"vm").as("vm"))
      val w = Window.partitionBy($"day")
      e.withColumn("day_total", sum($"vm").over(w))
        .select($"day", $"event_type", $"vm",
          expr("vm * 1000000L div nullif(day_total, 0L)").as("share_ppm"))
        .orderBy("day", "event_type")
    }),
    // E10: batch sessionization — assign NUMBERED sessions per user by
    // the 30-minute-gap rule (lag → new-session flag → running sum), the
    // composite-window idiom behind every clickstream session table.
    // Distinct from q_stream_session (a session_window AGGREGATE): this
    // yields a per-session id usable as a join key for downstream
    // attribution. Both windows share one (user_id, ts) sort — Catalyst
    // plans a single Exchange+Sort and evaluates lag and the running sum
    // in consecutive Window operators over it; per-user state, not
    // corpus-sized (user_id cardinality grows with the corpus, so
    // partitions stay balanced; a whale user would route through the E9
    // salted two-pass variants).
    "q_sessionize" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag($"ts", 1).over(w))
        .withColumn("new_s",
          when($"prev_ts".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum($"new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(U.tsStr(min($"ts")).as("session_start"),
          U.tsStr(max($"ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(U.micros($"value").cast("long")).as("value_micros"))
        .orderBy("user_id", "session_id")
    })
  )
}
