package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L46: Incremental TF-IDF — the corpus-statistics family joins the
  * incremental-state lifecycle (L43 curation, L44 near-dup, L45 ANN).
  * `q_text_tfidf` re-tokenizes and re-aggregates the ENTIRE corpus every
  * run to refresh two corpus-wide statistics — per-term document
  * frequency and the document count — yet both are exactly the mergeable
  * int64 partials the D11/D14b aggregates already demonstrate: a day's
  * df contribution never changes once computed (documents are
  * append-only, reference src/main.py:263 daily landing), so the daily
  * full rescan is pure waste at 100 TB. This module persists:
  *
  *   - `{prefix}_tf` (doc_id, tok, tf, src_day) — per-document term
  *     frequencies, BUCKETED on `tok` (the serving join key) and
  *     partitioned by arrival day. doc_ids are disjoint across days, so
  *     rows are unique on (doc_id, tok, src_day) and each document is
  *     tokenized ONCE, ever; `src_day` is the provenance column (same
  *     role as the df table's — epoch compaction rewrites the physical
  *     `day` but a replayed day must still collapse against its epoch
  *     copy, and a delete day's NEGATED rows must stay distinct from
  *     the fold rows they retract until serving nets them).
  *   - `{prefix}_df` (tok, src_day, df_part) — the day's document-
  *     frequency partials, bucketed on `tok` likewise. `src_day` is a
  *     PROVENANCE column distinct from the physical `day` partition:
  *     epoch compaction rewrites `day` but must keep partials from
  *     different days additive, while a replayed day re-landing beside
  *     its epoch copy must still collapse — dedup on (tok, src_day)
  *     does both (partial values are deterministic functions of the
  *     slice, so the copies are byte-identical).
  *   - `_doc_counts` — the per-day document counts (IncrState day-count
  *     marker, O(days) bytes), so n_docs is a driver-side literal at
  *     serving time: no scan at all for the global count.
  *
  * A day's fold is tokenize → two map-side-combinable aggregates →
  * bucketed writes: cost ∝ slice, no join, no history read. Serving
  * reads the state exchange-free on every side — the tf·df join and
  * both dedup/sum aggregates are satisfied by the shared `tok`
  * bucketing (HashPartitioning(tok) satisfies any clustering that
  * CONTAINS tok) — so the only shuffle in the whole report is the
  * output-inherent per-document top-k window, identical to the batch
  * query's last stage. The DuckDB oracle is `q_text_tfidf`'s SQL
  * verbatim: summed per-day df partials equal the full-corpus df
  * because doc sets are disjoint across days.
  */
object TfidfIncr {

  private[ops] def tfTable(prefix: String) = s"${prefix}_tf"
  private[ops] def dfTable(prefix: String) = s"${prefix}_df"

  /** PER-PREFIX marker (round 16, the ClusterIncr/QualityIncr house
    * pattern): two TF-IDF members sharing one warehouse must not pool
    * their n_docs. */
  private def docCountsMarker(prefix: String) = s"_doc_counts.$prefix"

  private def stateTables(prefix: String): Seq[IncrState.StateTable] = Seq(
    IncrState.StateTable(tfTable(prefix), "tok", Seq("doc_id", "tok", "src_day")),
    IncrState.StateTable(dfTable(prefix), "tok", Seq("tok", "src_day")))

  /** Fold one day's documents into the statistics state. Reads ONLY the
    * slice (once, for the tf build) plus the fresh tf partition it just
    * wrote (the df partials derive from stored tf rows, not a second
    * scan of raw text — the family's no-runtime-cache discipline). */
  def runDay(s: SparkSession, slice: DataFrame, prefix: String,
             warehouse: String, day: Int, nBuckets: Int = 32): Unit =
    IncrState.withLease(s, warehouse, prefix) {
    import s.implicits._
    val Seq(tfT, dfT) = stateTables(prefix)
    val tf = slice
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      .withColumn("src_day", lit(day))
    IncrState.writeDay(s, tf.withColumn("day", lit(day)), tfT, warehouse, day, nBuckets)
    val freshTf = s.table(tfTable(prefix)).filter($"day" === day)
    // df partial: one row per distinct token of the slice — vocab-sized,
    // partial-aggregable (tf rows are already distinct on (doc_id, tok)).
    // The df write and the day's doc count both read the just-written
    // fresh partition and neither reads the other's output — overlap
    // them (§2.6; join() below publishes nDay to this thread)
    var nDay = 0L
    IncrState.concurrently(Seq(
      () => IncrState.writeDay(s,
        freshTf.groupBy($"tok").agg(count(lit(1)).as("df_part"))
          .withColumn("src_day", lit(day)).withColumn("day", lit(day)),
        dfT, warehouse, day, nBuckets),
      // the day's document count, read off the fresh partition (empty
      // ReadSchema scan) into the O(days) marker — serving never scans
      // for n_docs
      () => nDay = freshTf.select($"doc_id").distinct().count()))
    IncrState.writeDayCounts(s, warehouse, docCountsMarker(prefix),
      IncrState.readDayCounts(s, warehouse, docCountsMarker(prefix)) + (day -> nDay))
    IncrState.writeLastDay(s, warehouse, day, prefix)
    // keep the SQL report view's baked n_docs literal current (no-op
    // catalog probe unless IncrViews.registerTfidf ever ran)
    IncrViews.refreshTfidf(s, prefix, warehouse)
  }

  /** Path-based twin for the suite's input-bytes test. */
  def runDayPath(s: SparkSession, slicePath: String, prefix: String,
                 warehouse: String, day: Int, nBuckets: Int = 32): Unit =
    runDay(s, s.read.parquet(slicePath), prefix, warehouse, day, nBuckets)

  /** Retraction (VERDICT r13 #1, round 14): fold one day's DELETED
    * documents OUT of the statistics state — the takedown/GDPR path.
    * Both state tables are purely ADDITIVE int64 partials, so deletion
    * is exact and reads no state at all: the delete slice runs through
    * the SAME tokenize → tf → df pipeline as a fold with every partial
    * NEGATED, landing under its own fresh day id — cost ∝ delete slice,
    * history never touched, replay idempotent (the delete day
    * dynamic-overwrites its own partition and its rows dedup on
    * (doc_id, tok, src_day) / (tok, src_day) like any day's). Serving
    * nets the signed partials: a retracted document's tf rows sum to 0
    * and drop out, each of its tokens' df drops by one, and n_docs
    * shrinks via a negated marker line — exactly the batch recompute on
    * the reduced corpus. Contract: the delete slice must be documents
    * previously folded, with IDENTICAL text (the negation subtracts
    * whatever is passed); `day` must be a fresh day id (one day id per
    * fold or delete event, same as runDay). */
  def deleteDay(s: SparkSession, deleted: DataFrame, prefix: String,
                warehouse: String, day: Int, nBuckets: Int = 32): Unit =
    IncrState.withLease(s, warehouse, prefix) {
    import s.implicits._
    val Seq(tfT, dfT) = stateTables(prefix)
    val tf = deleted
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"tok").agg((-count(lit(1))).as("tf"))
      .withColumn("src_day", lit(day))
    IncrState.writeDay(s, tf.withColumn("day", lit(day)), tfT, warehouse, day, nBuckets)
    val freshTf = s.table(tfTable(prefix)).filter($"day" === day)
    // negative df partial: the fresh rows are one per (deleted doc,
    // distinct token), so count = the df this slice contributed at fold
    // time (identical text ⇒ identical token set). Same overlap as the
    // fold: the df write and the doc count are independent reads of the
    // just-written partition (§2.6)
    var nDel = 0L
    IncrState.concurrently(Seq(
      () => IncrState.writeDay(s,
        freshTf.groupBy($"tok").agg((-count(lit(1))).as("df_part"))
          .withColumn("src_day", lit(day)).withColumn("day", lit(day)),
        dfT, warehouse, day, nBuckets),
      () => nDel = freshTf.select($"doc_id").distinct().count()))
    IncrState.writeDayCounts(s, warehouse, docCountsMarker(prefix),
      IncrState.readDayCounts(s, warehouse, docCountsMarker(prefix)) + (day -> -nDel))
    IncrState.writeLastDay(s, warehouse, day, prefix)
    IncrViews.refreshTfidf(s, prefix, warehouse)
  }

  /** Path-based delete twin for the suite's input-bytes test. */
  def deleteDayPath(s: SparkSession, slicePath: String, prefix: String,
                    warehouse: String, day: Int, nBuckets: Int = 32): Unit =
    deleteDay(s, s.read.parquet(slicePath), prefix, warehouse, day, nBuckets)

  /** Serving read-views: dedup on the natural key over the tok-bucketed
    * scans (a day replayed after a compaction re-lands identical rows
    * beside its epoch copy until the next compaction collapses them),
    * then net the SIGNED partials (fold rows positive, delete rows
    * negative; a retracted document nets to 0 and drops out) — two
    * HashAggregates per bucket, NO exchange, because the bucketing on
    * `tok` satisfies any grouping that contains `tok`. */
  private def tfView(s: SparkSession, prefix: String): DataFrame = {
    import s.implicits._
    s.table(tfTable(prefix)).select($"doc_id", $"tok", $"tf", $"src_day")
      .dropDuplicates("doc_id", "tok", "src_day")
      .groupBy($"doc_id", $"tok").agg(sum($"tf").as("tf"))
      .filter($"tf" > 0)
  }

  private def dfTotals(s: SparkSession, prefix: String): DataFrame = {
    import s.implicits._
    s.table(dfTable(prefix)).select($"tok", $"src_day", $"df_part")
      .dropDuplicates("tok", "src_day")
      .groupBy($"tok").agg(sum($"df_part").as("df"))
      .filter($"df" > 0)
  }

  /** The full TF-IDF report off the persisted state — output identical
    * to `q_text_tfidf` (same expression, same tie-break). n_docs comes
    * from the `_doc_counts` marker as a LITERAL; tf→df is a
    * bucket-aligned join; the per-document top-k window is the one
    * shuffle, exactly as in the batch plan (output-inherent). */
  /** Live document count of the member's corpus, off the O(days)
    * marker (fold entries positive, delete entries negative). */
  private[ops] def nDocs(s: SparkSession, prefix: String, warehouse: String): Long =
    IncrState.readDayCounts(s, warehouse, docCountsMarker(prefix)).values.sum

  def report(s: SparkSession, prefix: String, warehouse: String): DataFrame = {
    import s.implicits._
    stateTables(prefix).foreach(IncrState.ensureRegistered(s, _, warehouse))
    val nDocs = this.nDocs(s, prefix, warehouse)
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"tok")
    tfView(s, prefix).join(dfTotals(s, prefix), "tok")
      .withColumn("score",
        round($"tf" * log(lit(nDocs).cast("double") / $"df"), 4))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"tok", $"score")
      .orderBy("doc_id", "rk")
  }

  /** Lifecycle accessors + hooks (IncrState; tf table drives sizing). */
  def deltaDays(s: SparkSession, prefix: String, warehouse: String): Seq[Int] =
    IncrState.deltaDays(s, tfTable(prefix), warehouse)
  def maxFilesPerBucket(s: SparkSession, prefix: String, warehouse: String): Int =
    IncrState.maxFilesPerBucket(s, tfTable(prefix), warehouse)
  def epochSizes(s: SparkSession, prefix: String, warehouse: String): Map[Int, Long] =
    IncrState.epochSizes(s, tfTable(prefix), warehouse)
  def maybeCompact(s: SparkSession, prefix: String, warehouse: String,
                   nBuckets: Int = 32, maxDeltaDays: Int = 8): Boolean =
    IncrState.withLease(s, warehouse, prefix) {
      IncrState.sizeTieredCompact(s, warehouse, stateTables(prefix),
        tfTable(prefix), nBuckets, maxDeltaDays)
    }
  def compactState(s: SparkSession, prefix: String, warehouse: String,
                   nBuckets: Int = 32): Unit =
    IncrState.withLease(s, warehouse, prefix) {
      IncrState.compactAll(s, warehouse, stateTables(prefix), nBuckets)
    }

  /** Highest day ever folded into this warehouse; -1 when none. */
  def lastDay(s: SparkSession, prefix: String, warehouse: String): Int =
    IncrState.lastDay(s, warehouse, prefix)

  def dropState(s: SparkSession, prefix: String): Unit =
    Seq(tfTable(prefix), dfTable(prefix)).foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"))

  /** Daily loop over `days` slices (doc_id mod days) + report — the
    * oracle is the full-corpus recompute (`q_text_tfidf`'s SQL
    * verbatim). The result lands in the warehouse and is read back so
    * state tables can drop before the caller consumes the lazy frame. */
  def incremental(s: SparkSession, dir: String, days: Int): DataFrame = {
    val docs = Tables.documents(s, dir)
    val prefix = "tfidf_incr_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = IncrState.newWarehouse()
    (0 until days).foreach { day =>
      runDay(s, docs.filter(pmod(col("doc_id"), lit(days.toLong)) === day),
        prefix, wh, day, nBuckets = 8)
    }
    report(s, prefix, wh)
      .write.mode("overwrite").parquet(s"$wh/result")
    dropState(s, prefix)
    s.read.parquet(s"$wh/result").orderBy("doc_id", "rk")
  }

  /** Fold `days` slices, then RETRACT the documents with
    * doc_id % 7 == 3 (a deterministic takedown set spanning every fold
    * day) as delete day `days` — the oracle is the batch recompute on
    * the REDUCED corpus (`q_text_tfidf`'s SQL with the takedown set
    * excluded), proving fold(deletes) == batch-on-reduced-corpus via
    * pure signed-partial netting on BOTH state tables plus the negated
    * doc-count marker line. */
  def incrementalDel(s: SparkSession, dir: String, days: Int): DataFrame = {
    val docs = Tables.documents(s, dir)
    val prefix = "tfidf_del_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = IncrState.newWarehouse()
    (0 until days).foreach { day =>
      runDay(s, docs.filter(pmod(col("doc_id"), lit(days.toLong)) === day),
        prefix, wh, day, nBuckets = 8)
    }
    deleteDay(s, docs.filter(pmod(col("doc_id"), lit(7L)) === 3),
      prefix, wh, days, nBuckets = 8)
    report(s, prefix, wh)
      .write.mode("overwrite").parquet(s"$wh/result")
    dropState(s, prefix)
    s.read.parquet(s"$wh/result").orderBy("doc_id", "rk")
  }

  val qs: Map[String, Q] = Map(
    "q_tfidf_incr" -> ((s, d) => incremental(s, d, 3)),
    "q_tfidf_del" -> ((s, d) => incrementalDel(s, d, 3))
  )
}
