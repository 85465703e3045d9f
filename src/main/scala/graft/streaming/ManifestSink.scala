package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Exactly-once-ish foreachBatch sink: each micro-batch lands under its
  * own `batch=<id>` directory and becomes visible only when its commit
  * line is appended to the manifest log. Replayed batch ids (restart
  * after failure between write and checkpoint) are skipped by log
  * membership — the idempotence the reference approximates by
  * overwriting whole date-partition keys on re-run (src/main.py:70-73,
  * SURVEY §2.A8), done at micro-batch granularity.
  *
  * The manifest is a SINGLE append-only log (`_manifests/commits.log`,
  * one `<batchId>\t<dir>` line per committed batch) rather than one file
  * per batch: at ~10^5 batches a per-batch layout turns every read into
  * 10^5 metadata ops (list + open per file — the classic small-file
  * problem on an object store), while the log is one sequential read of
  * a few MB. The commit point is the appended line: readers resolve
  * directories from the log only, so half-written batch directories are
  * never visible, and a torn tail line from a crash mid-append fails to
  * parse and is ignored (its batch simply replays).
  */
object ManifestSink {

  private def logPath(root: String) =
    Paths.get(s"$root/_manifests/commits.log")

  /** Committed batchId -> data directory, parsed from the log. Torn
    * tails from a crash mid-append are rejected two ways: (1) a line is
    * only accepted if its dir is EXACTLY the writer's canonical
    * `$root/batch=$id` — a truncated "12\t$root/batch=1" (torn from
    * "...batch=12") would otherwise alias batch 12 onto batch 1's
    * directory and double-read it; (2) the final line is dropped
    * entirely when the log doesn't end in '\n', since an unterminated
    * tail can never be a completed append. The rejected batch simply
    * replays (idempotent by log membership). */
  def committed(root: String): Map[Long, String] = {
    val p = logPath(root)
    if (!Files.exists(p)) Map.empty
    else {
      val raw = new String(Files.readAllBytes(p), UTF_8)
      val complete = if (raw.endsWith("\n")) raw else raw.take(raw.lastIndexOf('\n') + 1)
      complete.linesIterator
        .flatMap { ln =>
          ln.split('\t') match {
            case Array(id, dir) =>
              id.toLongOption.filter(b => dir == s"$root/batch=$b").map(_ -> dir)
            case _ => None
          }
        }
        .toMap // last write wins on a (impossible by construction) dup id
    }
  }

  /** The foreachBatch function: idempotent per batchId. */
  def write(root: String)(batch: DataFrame, batchId: Long): Unit = {
    if (!committed(root).contains(batchId)) {
      val dir = s"$root/batch=$batchId"
      batch.write.mode("overwrite").parquet(dir)
      val p = logPath(root)
      Files.createDirectories(p.getParent)
      // manifest commit point: the batch is visible from here on
      Files.write(p, s"$batchId\t$dir\n".getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Read all committed batches (uncommitted directories are invisible). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val dirs = committed(root).values.toSeq
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs: _*)
  }
}
