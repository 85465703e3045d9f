package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** Precomputed eval-side reference for per-batch fuzzy
    * decontamination: the benchmark docs' shingle sets and MinHash band
    * rows (the L15b machinery). Built ONCE per drain — the eval side of
    * a real deployment is benchmark-sized (thousands of docs), so both
    * frames are broadcast-sized at any corpus scale; each micro-batch
    * only ever bands its own slice. */
  case class DecontamRef(evalBands: DataFrame, evalSh: DataFrame)

  def decontamRef(evalDocs: DataFrame): DecontamRef = {
    val sh = graft.ops.Dedup.withShingles(evalDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = graft.ops.Dedup.minhashBands(
      sh.select(col("doc_id"), explode(col("shs")).as("sh")), "doc_id", "sh")
      .select(col("band"), col("doc_id").as("eval_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    DecontamRef(bands, sh.select(col("doc_id").as("eval_id"), col("shs").as("sb")))
  }

  /** Drop every doc in `batch` that fuzzy-matches an eval doc: MinHash
    * band recall against the broadcast eval band table, exact-Jaccard
    * ≥ 0.2 verify (shared-randomness bands ⇒ deterministic recall, so a
    * replayed batch flags the same docs and the versioned-state replay
    * contract is untouched). */
  def decontaminate(batch: DataFrame, ref: DecontamRef): DataFrame = {
    val sh = graft.ops.Dedup.withShingles(batch)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val bands = graft.ops.Dedup.minhashBands(
      sh.select(col("doc_id"), explode(col("shs")).as("sh")), "doc_id", "sh")
    val flagged = bands
      .join(broadcast(ref.evalBands), "band")
      .select(col("doc_id"), col("eval_id")).distinct()
      .join(sh.select(col("doc_id"), col("shs").as("sa")), "doc_id")
      .join(broadcast(ref.evalSh), "eval_id")
      .withColumn("ni", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(round(col("ni").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("ni")), 6) >= 0.2)
      .select(col("doc_id")).distinct()
    val clean = batch.join(flagged, Seq("doc_id"), "left_anti")
    sh.unpersist(blocking = false)
    clean
  }

  /** One micro-batch fold: optional decontamination, then the versioned
    * CurateIncr state write (state version = batch id — exposed so the
    * suite can drive a REPLAY of a contaminated batch directly). */
  def foldBatch(batch: DataFrame, stateDir: String, batchId: Int,
                decontam: Option[DecontamRef]): Unit = {
    val slice = decontam.fold(batch)(r => decontaminate(batch, r))
    graft.ops.CurateIncr.runDay(batch.sparkSession, slice, stateDir, batchId)
  }

  /** Drain every slice currently in `inboxDir` (one micro-batch per
    * file) into the CurateIncr state at `stateDir`; returns the highest
    * state version written (-1 if the inbox was empty). Idempotent
    * under restart with the same `checkpointDir`. When `decontam` is
    * set, each slice is fuzzy-decontaminated against the eval reference
    * BEFORE it folds into curation state (VERDICT r10 #6). */
  def drainInbox(spark: SparkSession, inboxDir: String, stateDir: String,
                 checkpointDir: String,
                 decontam: Option[DecontamRef] = None): Int = {
    val seen = new java.util.concurrent.atomic.AtomicInteger(-1)
    val q = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inboxDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        foldBatch(batch, stateDir, batchId.toInt, decontam)
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
