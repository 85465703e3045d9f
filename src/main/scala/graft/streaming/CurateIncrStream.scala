package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The daily-cadence curation loop DRIVEN AS A STREAM — ops.CurateIncr's
  * versioned partial-state fold wired to the engine's ingest layer
  * (VERDICT r9 #1 composed with the I-layer): a file-stream inbox where
  * each arriving parquet slice is "a day" (reference main.tf:217 daily
  * schedule), `Trigger.AvailableNow` + maxFilesPerTrigger=1 so each
  * slice is one micro-batch, and `foreachBatch` folding slice N into
  * state version N.
  *
  * Exactly-once without a transactional sink: the state version IS the
  * batch id. A failed/replayed micro-batch re-reads state v(N−1) —
  * which a partial failure never touched — and deterministically
  * rewrites v(N); the checkpoint guarantees the slice→batch-id mapping
  * is stable across restarts, so replay converges to byte-identical
  * state (same reasoning as the versioned-dir design in
  * ops.CurateIncr). Restarting with the same checkpoint after new
  * slices land processes ONLY the new slices — the suite drives two
  * sessions over a growing inbox and pins the final report to the
  * full-recompute oracle both times. */
object CurateIncrStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Drain every slice currently in `inboxDir` (one micro-batch per
    * file) into the CurateIncr state at `stateDir`; returns the highest
    * state version written (-1 if the inbox was empty). Idempotent
    * under restart with the same `checkpointDir`. */
  def drainInbox(spark: SparkSession, inboxDir: String, stateDir: String,
                 checkpointDir: String): Int = {
    val seen = new java.util.concurrent.atomic.AtomicInteger(-1)
    val q = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inboxDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.CurateIncr.runDay(batch.sparkSession, batch, stateDir, batchId.toInt)
        seen.set(math.max(seen.get, batchId.toInt))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // a restart that found no new files leaves `seen` at -1: recover the
    // current version from the state layout itself
    if (seen.get >= 0) seen.get
    else {
      val d = new java.io.File(stateDir)
      val vs = Option(d.list()).getOrElse(Array.empty[String])
        .filter(_.startsWith("v")).flatMap(s => s.drop(1).toIntOption)
      if (vs.isEmpty) -1 else vs.max
    }
  }
}
