package graft.ops

import graft.{Q, Tables, U}
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
    })
  )
}
