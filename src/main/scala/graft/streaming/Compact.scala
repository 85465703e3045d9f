package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for streaming-landed partitioned parquet — the
  * operational companion of `Ingest`: micro-batch sinks accrete one-file-
  * per-batch partitions (≙ the reference's per-run S3 uploads,
  * src/main.py:70-81), and a 100 TB table read through thousands of tiny
  * files pays per-file open/footer cost that dwarfs the actual scan.
  *
  * Scale design: the file listing is a metadata pass (O(files), the same
  * listing any compactor or the Glue crawler already does); rows are
  * NEVER collected. Each partition gets k = ceil(bytes / targetBytes)
  * output files, assigned by a deterministic hash-salt repartition —
  * rows of one (partition, salt) land in one task → one file, so the
  * shuffle is the only data movement and output sizes track the target.
  * The rewrite lands via dynamic partition overwrite: per-partition
  * atomic-ish on local/HDFS committers; on S3 the ManifestSink
  * commit-before-visibility pattern (ManifestSink.scala) is the
  * production-grade wrapper.
  */
object Compact {

  final case class CompactStats(filesBefore: Int, filesAfter: Int, rows: Long)

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
      kids.filter(_.isDirectory).flatMap(parquetFiles)
  }

  /** Partition-dir key (e.g. "lang=en/year=2024") for a leaf file. */
  private def partKey(root: java.io.File, f: java.io.File): String = {
    val rel = root.toPath.relativize(f.toPath.getParent).toString
    if (rel.isEmpty) "." else rel
  }

  /** Compact `root` (a partitioned parquet dataset) so each partition has
    * ceil(partitionBytes / targetBytes) files. Returns before/after file
    * counts and the (unchanged) row count. */
  def run(spark: SparkSession, root: String, partitionCols: Seq[String],
          targetBytes: Long = 128L * 1024 * 1024): CompactStats = {
    import spark.implicits._
    val rootF = new java.io.File(root)
    val before = parquetFiles(rootF)
    // per-partition byte totals → per-partition output file count k
    val kByPart: Map[String, Int] = before
      .groupBy(f => partKey(rootF, f))
      .map { case (p, fs) =>
        p -> math.max(1, math.ceil(fs.map(_.length).sum.toDouble / targetBytes).toInt)
      }
    val df = spark.read.parquet(root)
    val rows = df.count()
    val kDf = kByPart.toSeq.toDF("_part", "_k")
    val partKeyCol = concat_ws("/",
      partitionCols.map(c => concat_ws("=", lit(c), col(c).cast("string"))): _*)
    // deterministic salt: same input ⇒ same file assignment (rerun-stable)
    val salted = df
      .withColumn("_part", partKeyCol)
      .join(broadcast(kDf), Seq("_part"), "left")
      .na.fill(1, Seq("_k"))
      .withColumn("_salt", pmod(hash(struct(df.columns.toIndexedSeq.map(col): _*)), $"_k"))
    // one shuffle: when every partition compacts to a single file the
    // expression form suffices (each task writes one file per partition
    // dir it holds, whatever AQE coalesces to); when size-splitting is
    // requested, pin the task count to Σk — AQE would otherwise coalesce
    // the salt spread away and merge the splits back into one file.
    // Hash assignment makes per-partition counts approximate (±collision)
    // at scale; the k=1 compaction case stays exact.
    val sumK = kByPart.values.sum
    val parts = (partitionCols.map(col) :+ col("_salt"))
    val shaped = (if (kByPart.values.exists(_ > 1))
      salted.repartition(sumK, parts: _*)
    else salted.repartition(parts: _*))
      .drop("_part", "_k", "_salt")
    // land beside, then swap — readers of `root` never see a half-written
    // tree (local-FS analogue of the commit-before-visibility rule)
    val tmp = root.stripSuffix("/") + "_compact_tmp"
    shaped.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(tmp)
    val trash = new java.io.File(root.stripSuffix("/") + "_compact_old")
    delete(trash)
    require(rootF.renameTo(trash), s"swap-out failed for $root")
    require(new java.io.File(tmp).renameTo(rootF), s"swap-in failed for $tmp")
    delete(trash)
    CompactStats(before.size, parquetFiles(rootF).size, rows)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}
