package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** L48: Incremental data-quality report — the third (and last)
  * corpus-statistics member of the incremental lifecycle (L46 TF-IDF,
  * L47 domain stats; VERDICT r12 #6 named all three daily full-rescans).
  *
  * `q_quality_report` recomputes five corpus-wide constraint counters
  * over the full event stream every run. Four of them — row count, null
  * FK, negative value, FK orphans — are per-ROW properties whose daily
  * partials are plain int64 sums; they live in the O(days) `_qc_counts`
  * marker (day-keyed, so replays overwrite their own line) and serving
  * reads them as driver-side literals, no scan at all. The fifth,
  * pk_dupes = rows − COUNT(DISTINCT event_id), is the interesting one:
  * distinct is not additive across days under arbitrary slicing, so its
  * state is the D14b mergeable-bitmap shape —
  *
  *   - `{prefix}_pk` (bkt, src_day, bm) — per-day 32k-bit bitmaps of
  *     the day's event_ids (`bitmap_construct_agg`), BUCKETED on `bkt`
  *     and day-partitioned; `src_day` is the provenance column (epoch
  *     compaction rewrites the physical `day` but per-day bitmaps must
  *     stay distinct rows until serving ORs them; a replayed day's
  *     byte-identical copy dedups on (bkt, src_day)).
  *
  * Serving ORs the bitmaps per bucket (`bitmap_or_agg` — exact, unlike
  * an HLL merge) and popcounts: correct under ANY slicing, even if the
  * same event_id lands on several days — a strictly stronger losslessness
  * argument than the disjoint-doc-set one L46/L47 lean on. Both the
  * replay dedup and the OR-merge group on clusterings that contain
  * `bkt`, so the state side is exchange-free; what remains is the
  * one-row global popcount sum and the 5-row presentation sort. The
  * bitmap state is ~|id-space|/32768 rows per day and compacts through
  * the shared IncrState lifecycle; at 100 TB serving reads state,
  * never the event stream. Oracle = `q_quality_report`'s SQL verbatim
  * (the planted dirt is a function of event_id, so a slice's dirt is
  * the dirt of the slice).
  */
object QualityIncr {

  private def pkTable(prefix: String) = s"${prefix}_pk"
  private val CountsMarker = "_qc_counts"

  private def stateTables(prefix: String): Seq[IncrState.StateTable] = Seq(
    IncrState.StateTable(pkTable(prefix), "bkt", Seq("bkt", "src_day")))

  /** The batch query's planted-dirt transform (deterministic in
    * event_id, so slicing commutes with it): null/orphan uids, negated
    * values, a duplicated slice. */
  private def dirty(slice: DataFrame): DataFrame = {
    val s = slice.sparkSession
    import s.implicits._
    val ev = slice.select($"event_id",
      when($"event_id" % 97 === 0, lit(null).cast("long"))
        .when($"event_id" % 103 === 0, $"user_id" + 1000000L)
        .otherwise($"user_id").as("uid"),
      when($"event_id" % 89 === 0, -$"value").otherwise($"value").as("v"))
    ev.union(ev.filter($"event_id" % 101 === 0))
  }

  /** Per-day marker lines: "day row_count null_user_id negative_value
    * fk_orphans" (keyed by day — a replay rewrites its own line). */
  private def readCounts(s: SparkSession, wh: String): Map[Int, Seq[Long]] =
    IncrState.readMarker(s, wh, CountsMarker).map(_.linesIterator.flatMap { l =>
      l.trim.split(' ') match {
        case Array(d, rest @ _*) if rest.length == 4 =>
          for (di <- d.toIntOption; vs <- Some(rest.flatMap(_.toLongOption))
               if vs.length == 4) yield di -> vs
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  private def writeCounts(s: SparkSession, wh: String,
                          counts: Map[Int, Seq[Long]]): Unit =
    IncrState.writeMarker(s, wh, CountsMarker,
      counts.toSeq.sortBy(_._1)
        .map { case (d, vs) => s"$d ${vs.mkString(" ")}" }.mkString("\n"))

  /** Fold one day's RAW events into the quality state: apply the dirt
    * transform, one pass for the four additive counters (the orphan
    * check rides the same pass as a broadcast-dim left join — customer
    * is the static FK dimension), one bucketed bitmap write for the
    * distinct-PK state. Cost ∝ slice; history never re-read. */
  def runDay(s: SparkSession, slice: DataFrame, customers: DataFrame,
             prefix: String, warehouse: String, day: Int,
             nBuckets: Int = 32): Unit = {
    import s.implicits._
    val Seq(pkT) = stateTables(prefix)
    val d = dirty(slice)
    // four additive counters in ONE pass (c_custkey is the customer PK,
    // so the left join never multiplies rows; absent match = orphan)
    val row = d
      .join(broadcast(customers.select($"c_custkey")),
        $"uid" === $"c_custkey", "left")
      .agg(count(lit(1)).as("rc"),
        sum(when($"uid".isNull, 1L).otherwise(0L)).as("nulls"),
        sum(when($"v" < 0, 1L).otherwise(0L)).as("negs"),
        sum(when($"uid".isNotNull && $"c_custkey".isNull, 1L).otherwise(0L))
          .as("orph"))
      .collect()(0)
    val vals = Seq(row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1),
      if (row.isNullAt(2)) 0L else row.getLong(2),
      if (row.isNullAt(3)) 0L else row.getLong(3))
    // the day's event_id bitmaps (dup rows OR into the same bits, so
    // the bitmap is exactly the day's DISTINCT ids)
    val bm = d
      .select(expr("bitmap_bucket_number(event_id)").as("bkt"),
        expr("bitmap_bit_position(event_id)").as("pos"))
      .groupBy($"bkt").agg(expr("bitmap_construct_agg(pos)").as("bm"))
      .withColumn("src_day", lit(day))
      .withColumn("day", lit(day))
    IncrState.writeDay(s, bm, pkT, warehouse, day, nBuckets)
    writeCounts(s, warehouse, readCounts(s, warehouse) + (day -> vals))
    IncrState.writeLastDay(s, warehouse, day)
  }

  /** Path-based twin for the suite's input-bytes test. */
  def runDayPath(s: SparkSession, slicePath: String, custDir: String,
                 prefix: String, warehouse: String, day: Int,
                 nBuckets: Int = 32): Unit =
    runDay(s, s.read.parquet(slicePath), Tables.customer(s, custDir),
      prefix, warehouse, day, nBuckets)

  /** The full quality report off the persisted state — output identical
    * to `q_quality_report`. The four additive counters are LITERALS
    * from the marker; pk_dupes = Σrows − exact distinct from the
    * OR-merged bitmap state (dedup and merge both exchange-free under
    * the `bkt` bucketing). */
  def report(s: SparkSession, prefix: String, warehouse: String): DataFrame = {
    import s.implicits._
    stateTables(prefix).foreach(IncrState.ensureRegistered(s, _, warehouse))
    val sums = readCounts(s, warehouse).values
      .foldLeft(Seq(0L, 0L, 0L, 0L))((a, b) => a.zip(b).map(t => t._1 + t._2))
    val Seq(rc, nulls, negs, orph) = sums
    s.table(pkTable(prefix))
      .select($"bkt", $"src_day", $"bm")
      .dropDuplicates("bkt", "src_day")
      .groupBy($"bkt").agg(expr("bitmap_count(bitmap_or_agg(bm))").as("c"))
      .agg(coalesce(sum($"c"), lit(0L)).as("nd"))
      .selectExpr(s"""stack(5,
          'fk_orphans', ${orph}L,
          'negative_value', ${negs}L,
          'null_user_id', ${nulls}L,
          'pk_dupes', ${rc}L - nd,
          'row_count', ${rc}L) AS (check_name, violations)""")
      .orderBy("check_name")
  }

  /** Lifecycle accessors + hooks (IncrState; the one table drives sizing). */
  def deltaDays(s: SparkSession, prefix: String, warehouse: String): Seq[Int] =
    IncrState.deltaDays(s, pkTable(prefix), warehouse)
  def maxFilesPerBucket(s: SparkSession, prefix: String, warehouse: String): Int =
    IncrState.maxFilesPerBucket(s, pkTable(prefix), warehouse)
  def epochSizes(s: SparkSession, prefix: String, warehouse: String): Map[Int, Long] =
    IncrState.epochSizes(s, pkTable(prefix), warehouse)
  def maybeCompact(s: SparkSession, prefix: String, warehouse: String,
                   nBuckets: Int = 32, maxDeltaDays: Int = 8): Boolean =
    IncrState.sizeTieredCompact(s, warehouse, stateTables(prefix),
      pkTable(prefix), nBuckets, maxDeltaDays)
  def compactState(s: SparkSession, prefix: String, warehouse: String,
                   nBuckets: Int = 32): Unit =
    IncrState.compactAll(s, warehouse, stateTables(prefix), nBuckets)

  /** Highest day ever folded into this warehouse; -1 when none. */
  def lastDay(s: SparkSession, warehouse: String): Int =
    IncrState.lastDay(s, warehouse)

  def dropState(s: SparkSession, prefix: String): Unit =
    s.sql(s"DROP TABLE IF EXISTS ${pkTable(prefix)}")

  /** Daily loop over `days` slices (event_id mod days) + report — the
    * oracle is the full-corpus recompute (`q_quality_report`'s SQL
    * verbatim). */
  def incremental(s: SparkSession, dir: String, days: Int): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("value"))
    val cust = Tables.customer(s, dir)
    val prefix = "quality_incr_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = IncrState.newWarehouse()
    (0 until days).foreach { day =>
      runDay(s, ev.filter(pmod(col("event_id"), lit(days.toLong)) === day),
        cust, prefix, wh, day, nBuckets = 8)
    }
    report(s, prefix, wh)
      .write.mode("overwrite").parquet(s"$wh/result")
    dropState(s, prefix)
    s.read.parquet(s"$wh/result").orderBy("check_name")
  }

  val qs: Map[String, Q] = Map(
    "q_quality_incr" -> ((s, d) => incremental(s, d, 3))
  )
}
