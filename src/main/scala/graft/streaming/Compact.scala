package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
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
  *
  * All filesystem work goes through the Hadoop `FileSystem` API resolved
  * from the table's own URI, so the compactor runs unchanged against
  * `file://`, `hdfs://` or `s3a://` — the operator's entire motivation
  * is object-store-landed small files (reference src/main.py:70-81
  * accretes one S3 file per run). The swap is write-beside + two renames:
  * metadata-atomic on local/HDFS; on S3 rename is copy+delete, so the
  * production wrapper is the ManifestSink commit-before-visibility
  * pattern (ManifestSink.scala) — readers follow the manifest, the tree
  * swap is just storage reclamation.
  */
object Compact {

  final case class CompactStats(filesBefore: Int, filesAfter: Int, rows: Long)

  private def parquetFiles(fs: FileSystem, dir: Path): Seq[(Path, Long)] = {
    val buf = scala.collection.mutable.ArrayBuffer[(Path, Long)]()
    val it = fs.listFiles(dir, true) // recursive; one round-trip per 1000
                                     // entries on object stores
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        buf += st.getPath -> st.getLen
    }
    buf.toSeq
  }

  /** Hive's null/empty partition-value sentinel (the directory name Spark
    * writes for a null partition column). */
  private val DefaultPart = ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  /** Partition-dir key (e.g. "lang=en/year=2024") for a leaf file, with
    * each VALUE hive-unescaped so it byte-matches the in-row key built by
    * `partKeyCol` (directory names percent-encode ' ', '/', '=', ':' …;
    * the column values do not). */
  private def partKey(rootUriPath: String, f: Path): String = {
    val parent = f.getParent.toUri.getPath
    val rel =
      if (parent == rootUriPath) "."
      else parent.stripPrefix(rootUriPath).stripPrefix("/")
    if (rel == ".") rel
    else rel.split('/').map { seg =>
      seg.split("=", 2) match {
        case Array(c, v) => c + "=" + ExternalCatalogUtils.unescapePathName(v)
        case _ => seg
      }
    }.mkString("/")
  }

  /** In-row partition key matching `partKey`: null and empty-string
    * values take hive's default-partition sentinel (Spark writes both as
    * that directory). */
  private def partKeyCol(partitionCols: Seq[String]) = concat_ws("/",
    partitionCols.map { c =>
      val v = col(c).cast("string")
      concat_ws("=", lit(c),
        when(v.isNull || v === "", DefaultPart).otherwise(v))
    }: _*)

  /** Compact `root` (a partitioned parquet dataset) so each partition has
    * ceil(partitionBytes / targetBytes) files. Returns before/after file
    * counts and the (unchanged) row count.
    *
    * `zorderBy = Some((kx, ky))` is the OPTIMIZE … ZORDER BY form: the
    * rewrite range-partitions on (partitionCols…, morton(kx, ky)) and
    * sorts within tasks, so each landed file tiles a square-ish region
    * of (kx, ky) space — per-file min/max stats stay tight on BOTH keys
    * and range predicates on EITHER skip most files of each partition
    * (LayoutSuite asserts the post-compaction skip rate). Replaces the
    * hash salt; per-partition file counts become range-proportional
    * (≈ k) rather than exact. */
  def run(spark: SparkSession, root: String, partitionCols: Seq[String],
          targetBytes: Long = 128L * 1024 * 1024,
          zorderBy: Option[(String, String)] = None): CompactStats = {
    import spark.implicits._
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootQ = fs.makeQualified(rootPath)
    val rootUriPath = rootQ.toUri.getPath
    val before = parquetFiles(fs, rootQ)
    // per-partition byte totals → per-partition output file count k
    val kByPart: Map[String, Int] = before
      .groupBy { case (p, _) => partKey(rootUriPath, p) }
      .map { case (p, fs) =>
        p -> math.max(1, math.ceil(fs.map(_._2).sum.toDouble / targetBytes).toInt)
      }
    val df = spark.read.parquet(root)
    val rows = df.count()
    val kDf = kByPart.toSeq.toDF("_part", "_k")
    // deterministic salt: same input ⇒ same file assignment (rerun-stable)
    val salted = df
      .withColumn("_part", partKeyCol(partitionCols))
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
    val shaped = (zorderBy match {
      case Some((kx, ky)) =>
        val zCols = partitionCols.map(col) :+ col("__z")
        graft.ops.Layout.withZ(salted, kx, ky)
          .repartitionByRange(math.max(sumK, 1), zCols: _*)
          .sortWithinPartitions(zCols: _*)
          .drop("__z")
      case None =>
        if (kByPart.values.exists(_ > 1)) salted.repartition(sumK, parts: _*)
        else salted.repartition(parts: _*)
    }).drop("_part", "_k", "_salt")
    // land beside, then swap — readers of `root` never see a half-written
    // tree (metadata-atomic on local/HDFS; see the S3 note in the scaladoc)
    // siblings of the qualified root, so scheme+authority survive (an
    // s3a:// table swaps within its own bucket)
    val tmp = new Path(rootQ.getParent, rootQ.getName + "_compact_tmp")
    shaped.write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(tmp.toString)
    val trash = new Path(rootQ.getParent, rootQ.getName + "_compact_old")
    fs.delete(trash, true)
    require(fs.rename(rootQ, trash), s"swap-out failed for $root")
    require(fs.rename(tmp, rootQ), s"swap-in failed for $tmp")
    fs.delete(trash, true)
    CompactStats(before.size, parquetFiles(fs, rootQ).size, rows)
  }
}
