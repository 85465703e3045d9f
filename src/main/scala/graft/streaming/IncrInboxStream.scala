package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** The shared inbox-drain loop of the incremental-state streaming
  * drives (L43 curation, L44 near-dup, L45 ANN, L46 TF-IDF, L47 domain
  * stats, L48 quality report): a file-stream inbox where each arriving parquet slice is "a
  * day" (reference main.tf:217's daily cadence), `Trigger.AvailableNow`
  * + maxFilesPerTrigger=1 so each slice is exactly one micro-batch, and
  * `foreachBatch` handing slice N to the member's day-N fold.
  *
  * Exactly-once without a transactional sink: the fold day IS the batch
  * id and every member's `runDay` is idempotent per day (dynamic
  * partition overwrite of exactly `day=N`; day-keyed markers), so a
  * failed/replayed micro-batch rewrites its own partitions
  * byte-identically. The checkpoint keeps the slice→batch-id mapping
  * stable across restarts; a restart after new slices land folds ONLY
  * the new slices — and thanks to IncrState's warehouse re-registration
  * the restart may be a REAL process restart, not just a new query.
  */
object IncrInboxStream {

  /** A checkpoint (and the warehouse it drives) is permanently bound to
    * ONE drive form (ADVICE r14): `drain` maps batch b → day b while
    * `drainCdc` maps b → days 2b/2b+1, so switching forms on one
    * warehouse+checkpoint would make a later plain batch k
    * dynamic-overwrite CDC batch k/2's add partition (day collision for
    * even k), silently destroying folded state. The form is recorded in
    * a marker beside the checkpoint on first drain and enforced loudly
    * on every later one. */
  private def pinDriveForm(spark: SparkSession, checkpointDir: String,
                           form: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$checkpointDir/_graft_drive_form")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val prev = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
      require(prev == form,
        s"inbox checkpoint '$checkpointDir' was driven as '$prev' but this " +
          s"drain is '$form': the two forms map batch ids to DIFFERENT day " +
          "spaces (plain: day=b; cdc: days 2b/2b+1), so mixing them on one " +
          "warehouse+checkpoint would dynamic-overwrite already-folded day " +
          "partitions. Use a fresh warehouse + checkpoint per drive form.")
    } else {
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      try out.write(form.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Drain every slice currently in `inboxDir` (one micro-batch per
    * file) through `fold(batch, day)`; returns the highest day folded,
    * or `fallback` when the drain saw no new files (a restart with
    * nothing to do — the state's own high-water marker answers, since
    * compaction folds settled day partitions into the epoch and the
    * layout alone cannot). Idempotent under restart with the same
    * `checkpointDir` — which is BOUND to this plain form forever
    * (see pinDriveForm). */
  def drain(spark: SparkSession, inboxDir: String, checkpointDir: String,
            schema: StructType)(fold: (DataFrame, Int) => Unit)
           (fallback: => Int): Int =
    drainForm(spark, inboxDir, checkpointDir, schema, "plain")(fold)(fallback)

  private def drainForm(spark: SparkSession, inboxDir: String, checkpointDir: String,
                        schema: StructType, form: String)
                       (fold: (DataFrame, Int) => Unit)
                       (fallback: => Int): Int = {
    pinDriveForm(spark, checkpointDir, form)
    val seen = new java.util.concurrent.atomic.AtomicInteger(-1)
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inboxDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fold(batch, batchId.toInt)
        seen.set(math.max(seen.get, batchId.toInt))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (seen.get >= 0) seen.get else fallback
  }

  /** The CDC drain (round 14): the same inbox loop over ONE ordered
    * stream of add/delete events — how a takedown feed actually arrives
    * next to the crawl feed. Each slice carries an `op` discriminator
    * column ('add' | 'del'); day ids split the batch-id space
    * deterministically — adds fold as day 2·batch, deletes as day
    * 2·batch+1 — so fold and delete events never collide, a slice
    * carrying BOTH ops lands each under its own day, and a replayed
    * micro-batch rewrites exactly its own partitions (the drain's
    * byte-idempotence argument, now covering retraction). Content-based
    * guards are replay-stable (the same file yields the same split) and
    * an op with no rows burns no day id on an empty partition write.
    * Ordering is the stream's: an id re-added after its own takedown in
    * a later slice stays retracted (delete wins at every member), and
    * add+delete in ONE slice nets to retracted because the delete day
    * (2b+1) follows the add day (2b). The checkpoint is BOUND to the
    * cdc form forever (see pinDriveForm — the 2b/2b+1 day space must
    * never be re-entered by a plain drain's day=b). */
  def drainCdc(spark: SparkSession, inboxDir: String, checkpointDir: String,
               schema: StructType)
              (fold: (DataFrame, Int) => Unit)
              (delete: (DataFrame, Int) => Unit)
              (fallback: => Int): Int = {
    import org.apache.spark.sql.functions.col
    drainForm(spark, inboxDir, checkpointDir, cdcSchema(schema), "cdc") { (batch, day) =>
      val adds = batch.filter(col("op") === "add").drop("op")
      val dels = batch.filter(col("op") === "del").drop("op")
      if (!adds.isEmpty) fold(adds, 2 * day)
      if (!dels.isEmpty) delete(dels, 2 * day + 1)
    }(fallback)
  }

  /** A member's inbox schema + the CDC op discriminator. */
  def cdcSchema(base: StructType): StructType =
    StructType(base.fields :+
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType))
}
