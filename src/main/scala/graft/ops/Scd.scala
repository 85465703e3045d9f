package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 validity-interval history — SURVEY.md §2.A8b. The SQL-warehouse
  * form of the reference's same-key daily re-run overwrite (reference
  * src/main.py:70-73): instead of replacing a partition wholesale, each
  * key keeps a row per VERSION with [valid_from, valid_to) bounds, the
  * open version carrying valid_to = NULL — the shape a MERGE INTO ...
  * WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT statement maintains in
  * a warehouse.
  *
  * Scale notes: `scd2History` is two window passes over the same
  * (key → ts) sort — one shuffle, E-family shape; change-row filtering
  * happens before the second window, so the lead() pass runs on the
  * (much smaller) version set. `scd2Apply` is one equi-join on the key
  * between the OPEN slice and the batch (closed history never moves),
  * the standard lakehouse merge plan; the three output branches reuse
  * one exchange (identical join subtrees).
  */
object Scd {

  /** Build the full SCD2 history of `attr` per `key` from an event log:
    * one row per version, valid_from = first ts of the run, valid_to =
    * next version's valid_from (NULL = current). Change points compare
    * null-safely, with row_number distinguishing "first version" from
    * "previous attr was NULL". `tie` makes the per-key order total when
    * ts collides. */
  def scd2History(df: DataFrame, key: String, attr: String, ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    df
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 || !(col("_prev") <=> col(attr)))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col(attr), col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** One MERGE round over an SCD2 serving table: `current` is the
    * history (key, attr, valid_from, valid_to); `batch` is the new
    * snapshot (key, attr) observed at `batchTs`. Open rows whose attr
    * changed are CLOSED (valid_to = batchTs) and the new version is
    * INSERTED; unchanged open rows, closed history, and brand-new keys
    * flow through — MERGE INTO ... WHEN MATCHED / WHEN NOT MATCHED as a
    * single-join DataFrame plan. Precondition: batch attr non-null
    * (a null snapshot value is a delete, which SCD2 models as a closing
    * row the caller crafts explicitly). */
  def scd2Apply(current: DataFrame, batch: DataFrame, key: String, attr: String, batchTs: Column): DataFrame = {
    val tsType = current.schema("valid_from").dataType
    val open = current.filter(col("valid_to").isNull)
    val closed = current.filter(col("valid_to").isNotNull)
    val b = batch.select(col(key), col(attr).as("_new"))
    val j = open.join(b, Seq(key), "full_outer")
    val keepOpen = j
      .filter(col("valid_from").isNotNull && (col("_new").isNull || (col(attr) <=> col("_new"))))
      .select(col(key), col(attr), col("valid_from"), lit(null).cast(tsType).as("valid_to"))
    val closedNow = j
      .filter(col("valid_from").isNotNull && col("_new").isNotNull && !(col(attr) <=> col("_new")))
      .select(col(key), col(attr), col("valid_from"), batchTs.cast(tsType).as("valid_to"))
    val inserted = j
      .filter(col("_new").isNotNull && (col("valid_from").isNull || !(col(attr) <=> col("_new"))))
      .select(col(key), col("_new").as(attr), batchTs.cast(tsType).as("valid_from"),
        lit(null).cast(tsType).as("valid_to"))
    closed.select(col(key), col(attr), col("valid_from"), col("valid_to"))
      .unionByName(keepOpen).unionByName(closedNow).unionByName(inserted)
  }

  val qs: Map[String, Q] = Map(
    // A8b: SCD2 history of each user's event_type from the event log —
    // every (ts, event_id)-ordered change opens a version and closes its
    // predecessor. Open rows surface a high-date sentinel instead of NULL
    // (sidesteps engine-dependent NULL ordering/serialization in the
    // row-order-sensitive hash compare). The sentinel must sit INSIDE the
    // int64-nanosecond timestamp range (< 2262-04-11): the classic
    // 9999-12-31 overflows every ns-resolution reader (pyarrow renders
    // INT96/ns parquet as timestamp[ns] and silently wraps), so the two
    // engines' dumps diverge at the comparer even though both computed
    // the same instant. 2200-01-01 is safely representable everywhere.
    "q_scd2" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id", $"event_type", $"ts", $"event_id")
      scd2History(ev, "user_id", "event_type", "ts", "event_id")
        .withColumn("valid_to",
          coalesce($"valid_to", lit("2200-01-01 00:00:00").cast("timestamp")))
        .orderBy($"user_id", $"valid_from", $"event_type", $"valid_to")
    })
  )
}
