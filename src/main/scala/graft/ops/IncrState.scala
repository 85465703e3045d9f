package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for the incremental-state family (L43 curation, L44
  * near-dup, L45 ANN index): bucketed, day-partitioned parquet tables
  * that absorb one slice per day and keep the daily contract of the
  * reference (one micro-batch per day, main.tf:214-244) without ever
  * re-reading history.
  *
  * The layout every member shares:
  *   - BUCKETED on the table's join key, so the steady-state consumers
  *     (candidate joins, rerank joins) read the state side exchange-free;
  *   - PARTITIONED by arrival `day`, so a fold's fresh side prunes to one
  *     partition and a day's write is a dynamic partition OVERWRITE of
  *     exactly its own day — replayed batches rewrite their day
  *     byte-identically instead of appending duplicates;
  *   - size-tiered LSM compaction (settled days merge into epoch runs at
  *     negative day ids; runs within a 2× size band merge pairwise), so
  *     partition and file counts stay logarithmic in corpus/delta and
  *     total compaction write traffic is O(N log N) — all merges go
  *     THROUGH the bucketed write path (a plain parquet rewrite, like
  *     A11 `Compact.run`, would strip the bucket metadata the
  *     exchange-free joins stand on).
  *
  * Factored out of DedupIncr (round 12) when AnnIncr became the third
  * member; DedupIncr's suite pins the behavior end-to-end.
  */
object IncrState {

  /** One state table: bucketed on `bucketKey`, partitioned by `day`,
    * rows unique on `naturalKey` — the dedup key applied when partitions
    * merge (a day replayed AFTER a compaction re-lands rows its epoch
    * already holds; copies meet whenever their partitions merge). */
  final case class StateTable(name: String, bucketKey: String, naturalKey: Seq[String])

  /** Epoch sentinel partition value: compaction folds settled day
    * partitions into `day < 0` runs, which no real fold day (≥ 0) ever
    * collides with, so fresh-side pruning is untouched. */
  val EpochDay: Int = -1

  /** Run `body` with spark.sql.sources.partitionOverwriteMode pinned,
    * restoring the caller's setting after. */
  def withOverwriteMode[T](s: SparkSession, mode: String)(body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(key)
    s.conf.set(key, mode)
    try body finally prev.fold(s.conf.unset(key))(s.conf.set(key, _))
  }

  /** Write one day's rows of `t` (day 0 creates the table; day > 0 is a
    * dynamic overwrite of exactly the `day=N` partitions). The input must
    * already carry the `day` column. */
  def writeDay(s: SparkSession, df0: DataFrame, t: StateTable, warehouse: String,
               day: Int, nBuckets: Int): Unit = withOverwriteMode(s, "dynamic") {
    // repartition on the bucket key FIRST: HashPartitioning(key, n) uses
    // the same Murmur3-pmod as the bucketizer, so each task holds exactly
    // one bucket and the write emits n files — without it every task
    // writes a file per bucket it touches (tasks × buckets tiny files per
    // day: measured 15.2 s vs 0.7 s for the one-shot at sf0.1, almost all
    // of it file open/close)
    val df = df0.repartition(nBuckets, col(t.bucketKey))
    if (day == 0) {
      df.write.mode("overwrite").format("parquet").bucketBy(nBuckets, t.bucketKey)
        .partitionBy("day")
        .option("path", s"$warehouse/${t.name}").saveAsTable(t.name)
    } else {
      // dynamic overwrite of this day's partition only; align column
      // order to the table schema (insertInto is positional)
      df.select(s.table(t.name).columns.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").insertInto(t.name)
    }
  }

  /** Non-epoch day partitions currently in `table` — the compaction
    * trigger's input. A METADATA-ONLY pass (one file listing through the
    * table's own Hadoop FileSystem, the same listing the A11 compactor
    * does): no rows are read. */
  def deltaDays(s: SparkSession, table: String, warehouse: String): Seq[Int] = {
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("day=") => n.drop(4).toInt }
      .filter(_ >= 0)
      .sorted
  }

  /** Max parquet files sharing one bucket id in `table` — the
    * file-growth number the lifecycle bounds (again metadata-only). */
  def maxFilesPerBucket(s: SparkSession, table: String, warehouse: String): Int = {
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val bucketId = raw"_(\d{5})\.".r
    val counts = scala.collection.mutable.Map[String, Int]()
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        bucketId.findFirstMatchIn(f.getPath.getName)
          .foreach(m => counts.updateWith(m.group(1))(c => Some(c.getOrElse(0) + 1)))
    }
    if (counts.isEmpty) 0 else counts.values.max
  }

  /** Epoch partitions (day < 0) currently in `table`, with their on-disk
    * bytes — the size-tiering input (metadata-only listing). */
  def epochSizes(s: SparkSession, table: String, warehouse: String): Map[Int, Long] = {
    val root = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (!n.startsWith("day=")) None
        else n.drop(4).toIntOption.filter(_ < 0).map { d =>
          var bytes = 0L
          val it = fs.listFiles(st.getPath, true)
          while (it.hasNext) { val f = it.next(); if (f.isFile) bytes += f.getLen }
          d -> bytes
        }
      }.toMap
  }

  /** Merge the given day partitions of one state table into a NEW epoch
    * partition, through the BUCKETED write path. Stage →
    * dynamic-overwrite insertInto of day=newEpoch → DROP PARTITION + dir
    * reclaim for the merged inputs. dropDuplicates on the natural key
    * collapses replay copies. A crash mid-merge loses no source data
    * (inputs drop only after the new epoch lands); production object
    * stores would wrap the swap in the ManifestSink
    * commit-before-visibility pattern, like A11. */
  private def mergePartitions(s: SparkSession, warehouse: String, t: StateTable,
                              days: Seq[Int], newEpoch: Int, nBuckets: Int): Unit = {
    if (days.isEmpty) return
    val stage = s"$warehouse/_compact_stage_${t.name}"
    val cols = s.table(t.name).columns
    s.table(t.name).filter(col("day").isin(days.map(Int.box): _*))
      .withColumn("day", lit(newEpoch))
      .dropDuplicates(t.naturalKey)
      .write.mode("overwrite").parquet(stage)
    withOverwriteMode(s, "dynamic") {
      s.read.parquet(stage)
        .repartition(nBuckets, col(t.bucketKey))
        .select(cols.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").insertInto(t.name)
    }
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    days.foreach { d =>
      s.sql(s"ALTER TABLE ${t.name} DROP PARTITION (day=$d)")
      fs.delete(new org.apache.hadoop.fs.Path(s"$warehouse/${t.name}/day=$d"), true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  /** Merge `days` into `day=newEpoch` across every table of the group
    * (the members' partitions stay aligned so one listing drives all). */
  def mergeAll(s: SparkSession, warehouse: String, tables: Seq[StateTable],
               days: Seq[Int], newEpoch: Int, nBuckets: Int): Unit =
    tables.foreach(t => mergePartitions(s, warehouse, t, days, newEpoch, nBuckets))

  /** FULL merge: every partition (settled days and prior epochs alike)
    * folds into one epoch, one file per bucket. `sizingTable` drives the
    * listings (the group's partitions are aligned by construction). */
  def compactAll(s: SparkSession, warehouse: String, tables: Seq[StateTable],
                 sizingTable: String, nBuckets: Int): Unit = {
    val all = deltaDays(s, sizingTable, warehouse) ++
      epochSizes(s, sizingTable, warehouse).keys
    val target = math.min(EpochDay, all.minOption.getOrElse(0) - 1)
    mergeAll(s, warehouse, tables, all, target, nBuckets)
  }

  /** Daily-cadence lifecycle hook: once the settled day-partition count
    * passes `maxDeltaDays`, merge those days into a fresh epoch run, then
    * SIZE-TIER the epochs (merge the two smallest while they sit within a
    * 2× size band — keeps epoch count logarithmic in corpus/delta and
    * avoids rewriting the big old epoch on every trigger). Returns true
    * when a compaction ran; metadata-only otherwise. */
  def sizeTieredCompact(s: SparkSession, warehouse: String, tables: Seq[StateTable],
                        sizingTable: String, nBuckets: Int, maxDeltaDays: Int): Boolean = {
    val days = deltaDays(s, sizingTable, warehouse)
    if (days.size <= maxDeltaDays) false
    else {
      val newEpoch = math.min(EpochDay,
        epochSizes(s, sizingTable, warehouse).keys.minOption.getOrElse(0) - 1)
      mergeAll(s, warehouse, tables, days, newEpoch, nBuckets)
      var es = epochSizes(s, sizingTable, warehouse).toSeq.sortBy(_._2)
      while (es.size >= 2 && es(1)._2 <= 2L * math.max(es(0)._2, 1L)) {
        val next = math.min(EpochDay, es.map(_._1).min - 1)
        mergeAll(s, warehouse, tables, Seq(es(0)._1, es(1)._1), next, nBuckets)
        es = epochSizes(s, sizingTable, warehouse).toSeq.sortBy(_._2)
      }
      true
    }
  }

  private def lastDayPath(warehouse: String) =
    new org.apache.hadoop.fs.Path(s"$warehouse/_last_day")

  /** High-water marker: compaction folds day partitions into the epoch,
    * so the partition layout alone cannot answer "what was the last
    * fold?" after a quiet restart — a one-line marker can (idempotent: a
    * replayed day N only ever rewrites the same or a lower value).
    * Written via temp-file + rename so a crash mid-write never leaves a
    * truncated marker in place — the recovery aid must itself survive
    * crashes; the delete→rename window can at worst make the marker
    * briefly ABSENT, which reads as -1 and is repaired by the next
    * fold's write (monotonicity keeps that safe). */
  def writeLastDay(s: SparkSession, warehouse: String, day: Int): Unit = {
    val p = lastDayPath(warehouse)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (day >= lastDay(s, warehouse)) {
      val tmp = new org.apache.hadoop.fs.Path(s"$warehouse/_last_day.tmp")
      val out = fs.create(tmp, true)
      try out.write(day.toString.getBytes("UTF-8")) finally out.close()
      fs.delete(p, false)
      fs.rename(tmp, p)
    }
  }

  /** Highest day ever folded into this warehouse; -1 when none (or when
    * the marker is unreadable — parse defensively: the marker exists to
    * aid recovery, so a corrupt one must degrade, never throw). */
  def lastDay(s: SparkSession, warehouse: String): Int = {
    val p = lastDayPath(warehouse)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1
    else {
      val in = fs.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .trim.toIntOption.getOrElse(-1)
      finally in.close()
    }
  }

  /** Per-run state root, removed on JVM exit (results are read lazily
    * from parquet, so cleanup must not race the consumer). */
  lazy val stateRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_incr_state_")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(root)) {
        val s = Files.walk(root)
        try s.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.deleteIfExists(p))
        finally s.close()
      }
    }
    root
  }

  def newWarehouse(): String =
    stateRoot.resolve(java.util.UUID.randomUUID().toString).toString
}
