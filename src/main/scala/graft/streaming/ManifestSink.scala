package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Exactly-once-ish foreachBatch sink: each micro-batch lands under its
  * own `batch=<id>` directory and becomes visible only when its manifest
  * file commits. Replayed batch ids (restart after failure between write
  * and checkpoint) are skipped by manifest presence — the idempotence the
  * reference approximates by overwriting whole date-partition keys on
  * re-run (src/main.py:70-73, SURVEY §2.A8), done at micro-batch
  * granularity. Readers list manifests, not directories, so half-written
  * batches are never visible.
  */
object ManifestSink {

  private def manifestPath(root: String, batchId: Long) =
    Paths.get(s"$root/_manifests/$batchId.manifest")

  /** The foreachBatch function: idempotent per batchId. */
  def write(root: String)(batch: DataFrame, batchId: Long): Unit = {
    val m = manifestPath(root, batchId)
    if (!Files.exists(m)) {
      val dir = s"$root/batch=$batchId"
      batch.write.mode("overwrite").parquet(dir)
      Files.createDirectories(m.getParent)
      // manifest commit point: the batch is visible from here on
      Files.write(m, dir.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
  }

  /** Read all committed batches (uncommitted directories are invisible). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val mdir = Paths.get(s"$root/_manifests")
    val dirs =
      if (!Files.exists(mdir)) Seq.empty
      else {
        val s = Files.list(mdir)
        try s.iterator().asScala
          .filter(_.toString.endsWith(".manifest"))
          .map(p => new String(Files.readAllBytes(p), "UTF-8")).toList
        finally s.close()
      }
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs: _*)
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
