package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental daily-cadence curation — the composed form of the
  * reference's actual operating contract: one slice of new documents per
  * day (reference main.tf:217 daily schedule, src/main.py:263 24 h
  * window), folded into persisted partial state, with the serving report
  * finalized FROM THE PARTIALS ONLY. History is never rescanned — at
  * 100 TB a daily full recompute is the one cost no deployment pays,
  * and every stage here is chosen to be losslessly mergeable so the
  * incremental answer is bit-identical to the full recompute (which is
  * exactly what the DuckDB oracle computes):
  *
  *   - doc-local gate (lang + length + type-token ratio): decided once
  *     on arrival, never revisited — monotone, so partials only grow.
  *   - exact-dedup keeper (md5 → min doc_id): `min(struct)` is
  *     associative/commutative, so day-over-day merge == global min.
  *   - C4 line-level keeper (line → min (doc_id, idx)): same min-merge
  *     (the L22 pattern, partial-aggregable, no Window).
  *   - vocab/token-frequency table per (split, lang): additive counts
  *     (the L26 tf-table pattern; merge = sum of partials, the D11 shape).
  *
  * State layout: `stateDir/v{day}/{md5,line,tf}` parquet — versioned
  * subdirectories so a day's merge never reads and overwrites the same
  * path. Day N's run reads ONLY the day-N slice plus `v{N-1}`; the
  * CurateIncrSuite asserts that via task input-bytes metrics. The final
  * report is a handful of small aggregates over the state tables
  * (keeper-table-sized, not corpus-sized).
  */
object CurateIncr {

  /** Per-run state root, removed on JVM exit (results read lazily from
    * parquet, so cleanup must not race the consumer). */
  private lazy val stateRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_curate_incr_")
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

  def newStateDir(): String =
    stateRoot.resolve(java.util.UUID.randomUUID().toString).toString

  /** Deterministic train/valid/test split of a doc_id (same convention
    * as q_pipeline_curate2: portable h64 of "split:<id>" mod 1000). */
  private def splitOf(docId: org.apache.spark.sql.Column) = {
    val b = U.h64(concat(lit("split:"), docId)) % 1000
    when(b < 800, "train").when(b < 900, "valid").otherwise("test")
  }

  /** Doc-local gate + derived columns. Everything here depends on ONE
    * document only, so the decision is final on arrival day. */
  private def gated(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .filter(col("lang") === "en" && col("n_toks") >= 10 &&
        expr("n_distinct * 1000000 div n_toks") >= 300000)
      .withColumn("n_lines", expr("(n_toks + 2) div 3"))
      .withColumn("split", splitOf(col("doc_id")))

  /** One day slice → the three partial tables (flattened schemas). */
  def dayPartials(slice: DataFrame): (DataFrame, DataFrame, DataFrame) =
    dayPartialsOf(gated(slice))

  private def dayPartialsOf(g: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val md5P = g
      .groupBy(md5(col("text")).as("k_md5"))
      .agg(min(struct(col("doc_id"), col("lang"), col("n_toks"), col("n_lines"))).as("k"))
      .select(col("k_md5"), col("k.doc_id"), col("k.lang"), col("k.n_toks"), col("k.n_lines"))
    val lines = g.select(col("doc_id"), col("lang"), posexplode(expr(
      "transform(sequence(1, size(toks), 3), i -> concat_ws(' ', slice(toks, i, 3)))"))
      .as(Seq("idx", "line")))
    val lineP = lines
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("idx"), col("lang"), length(col("line")).cast("long").as("len"))).as("k"))
      .select(col("line"), col("k.doc_id"), col("k.idx"), col("k.lang"), col("k.len"))
    val tfP = g
      .select(col("split"), col("lang"), explode(col("toks")).as("tok"))
      .groupBy(col("split"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    (md5P, lineP, tfP)
  }

  /** Lossless merges — re-aggregation of unioned partials: min(struct)
    * for the two keeper tables, sum for the tf counts. Associativity +
    * commutativity of min/sum is WHY incremental == full recompute. */
  def mergeMd5(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("k_md5"))
      .agg(min(struct(col("doc_id"), col("lang"), col("n_toks"), col("n_lines"))).as("k"))
      .select(col("k_md5"), col("k.doc_id"), col("k.lang"), col("k.n_toks"), col("k.n_lines"))

  def mergeLine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("idx"), col("lang"), col("len"))).as("k"))
      .select(col("line"), col("k.doc_id"), col("k.idx"), col("k.lang"), col("k.len"))

  def mergeTf(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("split"), col("lang"), col("tok"))
      .agg(sum(col("c")).as("c"))

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Retention GC (VERDICT r10 #2): once v(day) is durably written,
    * versions ≤ day−2 are dead weight — at daily cadence the un-pruned
    * layout kept 365 full keeper-table copies a year, with the line
    * keeper being the largest table in the pipeline. Exactly ONE prior
    * version (v(day−1)) is kept so a replayed micro-batch N can still
    * re-read v(N−1) (the CurateIncrStream exactly-once contract: replay
    * deterministically rewrites v(N) from v(N−1), which GC never touches
    * until v(N+1) commits). */
  private def gcVersions(stateDir: String, day: Int): Unit =
    (0 to day - 2).foreach { n =>
      val p = java.nio.file.Paths.get(s"$stateDir/v$n")
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally s.close()
      }
    }

  /** Fold one day's slice into the state: read v{day-1} (if any), merge,
    * write v{day}. Reads ONLY the slice + previous partials. */
  def runDay(s: SparkSession, slice: DataFrame, stateDir: String, day: Int): Unit =
    IncrState.withLease(s, stateDir, "curate") {
    // the gate + derived columns are computed ONCE (ADVICE r10): the
    // three merge writes below are independent jobs whose lineages would
    // otherwise each re-scan, re-split and re-gate the day slice —
    // tripling the per-day slice I/O this module exists to bound.
    // DISK_ONLY, matching the Dedup convention for corpus-sized reuse.
    val g = gated(slice).persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val (md5D, lineD, tfD) = dayPartialsOf(g)
    val (md5M, lineM, tfM) =
      if (day == 0) (md5D, lineD, tfD)
      else {
        val prev = s"$stateDir/v${day - 1}"
        (mergeMd5(s.read.parquet(s"$prev/md5"), md5D),
          mergeLine(s.read.parquet(s"$prev/line"), lineD),
          mergeTf(s.read.parquet(s"$prev/tf"), tfD))
      }
    val v = s"$stateDir/v$day"
    // the three state writes are independent jobs — run them
    // concurrently so the day's wall time is the largest table's write,
    // not the sum (Spark schedules concurrent actions fine; each job's
    // lineage reads the same slice/prev-state inputs independently)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(Seq(
      Future(write(md5M, s"$v/md5")),
      Future(write(lineM, s"$v/line")),
      Future(write(tfM, s"$v/tf")))), Duration.Inf)
    g.unpersist(blocking = false)
    gcVersions(stateDir, day)
  }

  /** Path-based twin: the suite's input-bytes test uses this so the
    * day's inputs are, by construction, one slice dir + one state dir. */
  def runDayPath(s: SparkSession, slicePath: String, stateDir: String, day: Int): Unit =
    runDay(s, s.read.parquet(slicePath), stateDir, day)

  /** Serving report from the partials of version `day` — state-table
    * scans only (keeper-sized), no document ever re-read. */
  def report(s: SparkSession, stateDir: String, day: Int): DataFrame = {
    val v = s"$stateDir/v$day"
    reportFrom(s.read.parquet(s"$v/md5"), s.read.parquet(s"$v/line"),
      s.read.parquet(s"$v/tf"))
  }

  private def reportFrom(md5P: DataFrame, lineP: DataFrame, tfP: DataFrame): DataFrame = {
    val d1 = md5P
      .groupBy(splitOf(col("doc_id")).as("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("sum_toks"),
        sum(col("n_lines")).as("n_lines"))
    val d2 = lineP
      .groupBy(splitOf(col("doc_id")).as("split"), col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("len")).as("kept_chars"))
    val d3 = tfP
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_vocab"), sum(col("c")).as("n_tok_occ"))
    d1.join(d2, Seq("split", "lang"), "full_outer")
      .join(d3, Seq("split", "lang"), "full_outer")
      .select(col("split"), col("lang"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("sum_toks"), lit(0L)).as("sum_toks"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"),
        coalesce(col("n_vocab"), lit(0L)).as("n_vocab"),
        coalesce(col("n_tok_occ"), lit(0L)).as("n_tok_occ"))
      .orderBy("split", "lang")
  }

  // ---------- bucketed-state backend ----------
  //
  // The parquet backend's daily merge is union + re-aggregate: correct,
  // but it RE-SHUFFLES THE WHOLE STATE every day, and at 100 TB the
  // line-keeper state is the largest table in the pipeline — a daily
  // full state shuffle would dominate the whole job. This backend keeps
  // each state table as a BUCKETED catalog table (hash-bucketed on its
  // merge key, the BucketingSuite lever) and merges via a full-outer
  // join instead: the bucketed state scan already satisfies the join's
  // required partitioning, so the only exchange in the daily merge is
  // the day slice's own partials — state bytes never cross the wire.
  // least() on the keeper structs skips the null side of the full-outer
  // join, which is exactly min-merge; tf adds coalesced counts. The
  // suite pins result-equality with the parquet backend AND the
  // single-exchange plan shape.

  private def structMd5(df: DataFrame): DataFrame =
    df.select(col("k_md5"),
      struct(col("doc_id"), col("lang"), col("n_toks"), col("n_lines")).as("k"))
  private def structLine(df: DataFrame): DataFrame =
    df.select(col("line"),
      struct(col("doc_id"), col("idx"), col("lang"), col("len")).as("k"))

  private def tableName(prefix: String, kind: String, day: Int) =
    s"${prefix}_${kind}_v$day"

  /** Restart half of the bucketed backend (the IncrState.ensureRegistered
    * contract for these NON-partitioned versioned tables): the in-memory
    * catalog dies with the JVM but the warehouse dirs survive — if the
    * table is missing from the catalog and a `_graft_buckets` marker
    * (written at create: "<n> <col,col>") identifies the physical
    * layout, re-register it with the exact original bucket spec so the
    * exchange-free merge keeps standing after a process restart. */
  private def ensureRegisteredFlat(s: SparkSession, table: String,
                                   warehouse: String): Unit =
    if (!s.catalog.tableExists(table)) {
      val path = s"$warehouse/$table"
      val m = new org.apache.hadoop.fs.Path(s"$path/_graft_buckets")
      val fs = m.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(m)) {
        val in = fs.open(m)
        val txt = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
        txt.trim.split(' ') match {
          case Array(n, cols) if n.toIntOption.isDefined =>
            val ddlCols = s.read.parquet(path).schema.fields
              .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
            s.sql(
              s"""CREATE TABLE $table ($ddlCols)
                 |USING PARQUET
                 |CLUSTERED BY (${cols.split(',').mkString(", ")}) INTO ${n.toInt} BUCKETS
                 |LOCATION '$path'""".stripMargin)
          case _ => ()
        }
      }
    }

  /** The three day-N merged state DataFrames against the bucketed
    * v(N−1) tables (exposed so the suite can pin the plan shape). Pass
    * `warehouse` to make the read restart-safe (re-registration). */
  def mergedBucketed(s: SparkSession, prefix: String, day: Int,
                     partials: (DataFrame, DataFrame, DataFrame),
                     warehouse: Option[String] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    warehouse.foreach(w => Seq("md5", "line", "tf").foreach(k =>
      ensureRegisteredFlat(s, tableName(prefix, k, day - 1), w)))
    val (md5D, lineD, tfD) = partials
    val md5M = s.table(tableName(prefix, "md5", day - 1)).as("s")
      .join(structMd5(md5D).as("d"), Seq("k_md5"), "full_outer")
      .select(col("k_md5"), least(col("s.k"), col("d.k")).as("k"))
    val lineM = s.table(tableName(prefix, "line", day - 1)).as("s")
      .join(structLine(lineD).as("d"), Seq("line"), "full_outer")
      .select(col("line"), least(col("s.k"), col("d.k")).as("k"))
    val tfM = s.table(tableName(prefix, "tf", day - 1)).as("s")
      .join(tfD.as("d"), Seq("split", "lang", "tok"), "full_outer")
      .select(col("split"), col("lang"), col("tok"),
        (coalesce(col("s.c"), lit(0L)) + coalesce(col("d.c"), lit(0L))).as("c"))
    (md5M, lineM, tfM)
  }

  /** Fold one day into bucketed-catalog state (tables
    * `{prefix}_{md5,line,tf}_v{day}` under `warehouse`). */
  def runDayBucketed(s: SparkSession, slice: DataFrame, prefix: String,
                     warehouse: String, day: Int, nBuckets: Int = 8): Unit =
    IncrState.withLease(s, warehouse, prefix) {
    val g = gated(slice).persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val (md5D, lineD, tfD) = dayPartialsOf(g)
    val (md5M, lineM, tfM) =
      if (day == 0) (structMd5(md5D), structLine(lineD), tfD)
      else mergedBucketed(s, prefix, day, (md5D, lineD, tfD), Some(warehouse))
    def writeB(df: DataFrame, kind: String, cols: Seq[String]): Unit = {
      val t = tableName(prefix, kind, day)
      // repartition on the bucket key first (same Murmur3-pmod as the
      // bucketizer): each task then holds exactly one bucket, so the
      // write emits nBuckets files instead of tasks × buckets tiny ones
      df.repartition(nBuckets, cols.map(col): _*).write.mode("overwrite")
        .bucketBy(nBuckets, cols.head, cols.tail: _*)
        .option("path", s"$warehouse/$t")
        .saveAsTable(t)
      // record the physical bucket spec beside the data so a JVM restart
      // can re-register the table exactly (ensureRegisteredFlat)
      val m = new org.apache.hadoop.fs.Path(s"$warehouse/$t/_graft_buckets")
      val out = m.getFileSystem(s.sparkContext.hadoopConfiguration).create(m, true)
      try out.write(s"$nBuckets ${cols.mkString(",")}".getBytes("UTF-8"))
      finally out.close()
    }
    writeB(md5M, "md5", Seq("k_md5"))
    writeB(lineM, "line", Seq("line"))
    writeB(tfM, "tf", Seq("split", "lang", "tok"))
    g.unpersist(blocking = false)
    // retention: drop v(≤ day−2) tables AND their external files (same
    // replay contract as gcVersions — exactly one prior version kept)
    (0 to day - 2).foreach { n =>
      Seq("md5", "line", "tf").foreach { k =>
        val t = tableName(prefix, k, n)
        s.sql(s"DROP TABLE IF EXISTS $t")
        val p = java.nio.file.Paths.get(s"$warehouse/$t")
        if (java.nio.file.Files.exists(p)) {
          val w = java.nio.file.Files.walk(p)
          try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(q => java.nio.file.Files.deleteIfExists(q))
          finally w.close()
        }
      }
    }
  }

  def reportBucketed(s: SparkSession, prefix: String, day: Int,
                     warehouse: Option[String] = None): DataFrame = {
    warehouse.foreach(w => Seq("md5", "line", "tf").foreach(k =>
      ensureRegisteredFlat(s, tableName(prefix, k, day), w)))
    reportFrom(
      s.table(tableName(prefix, "md5", day)).select(col("k_md5"), col("k.*")),
      s.table(tableName(prefix, "line", day)).select(col("line"), col("k.*")),
      s.table(tableName(prefix, "tf", day)))
  }

  def dropBucketedState(s: SparkSession, prefix: String, upToDay: Int): Unit =
    (0 to upToDay).foreach { n =>
      Seq("md5", "line", "tf").foreach(k =>
        s.sql(s"DROP TABLE IF EXISTS ${tableName(prefix, k, n)}"))
    }

  // ---------- retractable member-level backend ----------
  //
  // RETRACTION (VERDICT r13 #1, round 14). The two append-only backends
  // above compress each keeper group to its MIN on the way in — the
  // cheapest possible state, but min() is lossy: when the keeper doc of
  // a group is taken down, the surviving members it displaced are gone
  // from the state, so no algebra can promote the next keeper. Exact
  // retraction therefore needs the keeper state held at MEMBER level
  // (one metadata row per gated document / per (line, doc) occurrence,
  // never the text) with the keeper re-derived at read — and because
  // the member tables are bucketed on the GROUP key, that re-derive is
  // a bucket-local min with NO exchange, so serving keeps the same
  // shuffle shape as the compressed backends. The trade is state size:
  // member rows ∝ gated corpus instead of ∝ distinct keys — the price
  // of takedown support, paid only by deployments that opt into this
  // backend (the reference's overwrite-a-day semantics, src/main.py:
  // 70-73, generalized to row-level deletes). The tf table stays the
  // additive signed-netting shape (the L46 pattern); deletes land
  // negated partials. Tombstones + the delete-epoch purge follow the
  // family contract: delete wins, replay idempotent, cost ∝ delete
  // slice, history never re-read.

  private[ops] def md5mTable(prefix: String) = s"${prefix}_md5m"
  private[ops] def linemTable(prefix: String) = s"${prefix}_linem"
  private[ops] def tfmTable(prefix: String) = s"${prefix}_tfm"
  private[ops] def delmTable(prefix: String) = s"${prefix}_del"

  private def retractableTables(prefix: String): Seq[IncrState.StateTable] = Seq(
    IncrState.StateTable(md5mTable(prefix), "k_md5", Seq("k_md5", "doc_id")),
    IncrState.StateTable(linemTable(prefix), "line", Seq("line", "doc_id", "idx")),
    IncrState.StateTable(tfmTable(prefix), "tok", Seq("split", "lang", "tok", "src_day")))

  private def tombMTable(prefix: String): IncrState.StateTable =
    IncrState.StateTable(delmTable(prefix), "doc_id", Seq("doc_id"))

  private def allRetractableTables(prefix: String): Seq[IncrState.StateTable] =
    retractableTables(prefix) :+ tombMTable(prefix)

  private def tombstonesM(s: SparkSession, prefix: String): Option[DataFrame] =
    if (!s.catalog.tableExists(delmTable(prefix))) None
    else Some(s.table(delmTable(prefix)).select(col("doc_id")).distinct())

  private def minusTombM(s: SparkSession, prefix: String, df: DataFrame): DataFrame =
    tombstonesM(s, prefix).fold(df)(t =>
      df.join(broadcast(t), Seq("doc_id"), "left_anti"))

  /** The member-level partials of one gated slice: per-doc md5 metadata
    * rows, per-(line, doc) occurrence rows, per-day tf counts. */
  private def memberPartialsOf(g: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val md5M = g.select(md5(col("text")).as("k_md5"), col("doc_id"), col("lang"),
      col("n_toks"), col("n_lines"))
    val lineM = g.select(col("doc_id"), col("lang"), posexplode(expr(
      "transform(sequence(1, size(toks), 3), i -> concat_ws(' ', slice(toks, i, 3)))"))
      .as(Seq("idx", "line")))
      .select(col("line"), col("doc_id"), col("idx"), col("lang"),
        length(col("line")).cast("long").as("len"))
    val tfM = g
      .select(col("split"), col("lang"), explode(col("toks")).as("tok"))
      .groupBy(col("split"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    (md5M, lineM, tfM)
  }

  /** Fold one day into the retractable state: gate once, three bucketed
    * writes — cost ∝ slice, no merge job at all (the member tables are
    * pure appends; the keeper min moved from write time to read time,
    * where the bucketing makes it free). */
  def runDayRetractable(s: SparkSession, slice: DataFrame, prefix: String,
                        warehouse: String, day: Int, nBuckets: Int = 8): Unit =
    IncrState.withLease(s, warehouse, prefix) {
    val Seq(md5T, lineT, tfT) = retractableTables(prefix)
    val g = gated(slice).persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val (md5M, lineM, tfM) = memberPartialsOf(g)
      // materialize the pinned gate pass with one cheap action first:
      // concurrent cold-cache first-touches race the block locks into
      // partial double-reads of the slice (the ClusterIncr input-bytes
      // bound caught the pattern) — then the three independent member
      // writes read blocks only and overlap (§2.6)
      g.count()
      IncrState.concurrently(Seq(
        () => IncrState.writeDay(s, md5M.withColumn("src_day", lit(day))
          .withColumn("day", lit(day)), md5T, warehouse, day, nBuckets),
        () => IncrState.writeDay(s, lineM.withColumn("src_day", lit(day))
          .withColumn("day", lit(day)), lineT, warehouse, day, nBuckets),
        () => IncrState.writeDay(s, tfM.withColumn("src_day", lit(day))
          .withColumn("day", lit(day)), tfT, warehouse, day, nBuckets)))
      IncrState.writeLastDay(s, warehouse, day, prefix)
    } finally { g.unpersist(blocking = false); () }
  }

  /** Path-based twin for the suite's input-bytes test. */
  def runDayRetractablePath(s: SparkSession, slicePath: String, prefix: String,
                            warehouse: String, day: Int, nBuckets: Int = 8): Unit =
    runDayRetractable(s, s.read.parquet(slicePath), prefix, warehouse, day, nBuckets)

  /** Retract one day's DELETED documents: tombstones by doc_id for the
    * member keepers (the read-side anti-join re-derives every affected
    * group's keeper from the surviving members — the whole point of the
    * member-level state) and NEGATED tf partials re-derived from the
    * delete slice (which must carry the documents as folded, the L46
    * contract). Cost ∝ delete slice; no state read, no history read. */
  def deleteDayRetractable(s: SparkSession, deleted: DataFrame, prefix: String,
                           warehouse: String, day: Int, nBuckets: Int = 8): Unit =
    IncrState.withLease(s, warehouse, prefix) {
    val Seq(_, _, tfT) = retractableTables(prefix)
    val g = gated(deleted).persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val tfNeg = g
        .select(col("split"), col("lang"), explode(col("toks")).as("tok"))
        .groupBy(col("split"), col("lang"), col("tok"))
        .agg((-count(lit(1))).as("c"))
      // build the gate-pass cache with one action (see runDayRetractable's
      // input-bytes note), then overlap the two independent writes (§2.6)
      g.count()
      IncrState.concurrently(Seq(
        () => IncrState.writeDay(s,
          g.select(col("doc_id")).distinct().withColumn("day", lit(day)),
          tombMTable(prefix), warehouse, day, nBuckets),
        () => IncrState.writeDay(s, tfNeg.withColumn("src_day", lit(day))
          .withColumn("day", lit(day)), tfT, warehouse, day, nBuckets)))
      IncrState.writeLastDay(s, warehouse, day, prefix)
      // first delete creates the keeper tombstone table — swap the SQL
      // report view to its tombstone-aware form (no-op unless registered)
      IncrViews.refreshCurate(s, prefix, warehouse)
    } finally { g.unpersist(blocking = false); () }
  }

  /** Path-based delete twin for the suite's input-bytes test. */
  def deleteDayRetractablePath(s: SparkSession, slicePath: String, prefix: String,
                               warehouse: String, day: Int, nBuckets: Int = 8): Unit =
    deleteDayRetractable(s, s.read.parquet(slicePath), prefix, warehouse, day, nBuckets)

  /** Physical delete epoch for the member keepers (the tf table's
    * retraction is the signed netting; tombstones are KEPT). */
  def purgeDeletedRetractable(s: SparkSession, prefix: String, warehouse: String,
                              nBuckets: Int = 8): Unit =
    IncrState.withLease(s, warehouse, prefix) {
      tombstonesM(s, prefix).foreach { tomb =>
        IncrState.compactAllWhere(s, warehouse, retractableTables(prefix).take(2),
          nBuckets, _ => df => df.join(broadcast(tomb), Seq("doc_id"), "left_anti"))
      }
    }

  /** Serving report off the retractable state — identical output to the
    * other backends. Keepers re-derive per group over the bucketed
    * member scans (replay dedup + min, both bucket-local, NO exchange);
    * tf nets the signed partials and drops fully-retracted rows. */
  def reportRetractable(s: SparkSession, prefix: String, warehouse: String): DataFrame = {
    allRetractableTables(prefix).foreach(IncrState.ensureRegistered(s, _, warehouse))
    val md5P = minusTombM(s, prefix,
      s.table(md5mTable(prefix))
        .select(col("k_md5"), col("doc_id"), col("lang"), col("n_toks"), col("n_lines"))
        .dropDuplicates("k_md5", "doc_id"))
      .groupBy(col("k_md5"))
      .agg(min(struct(col("doc_id"), col("lang"), col("n_toks"), col("n_lines"))).as("k"))
      .select(col("k_md5"), col("k.doc_id"), col("k.lang"), col("k.n_toks"), col("k.n_lines"))
    val lineP = minusTombM(s, prefix,
      s.table(linemTable(prefix))
        .select(col("line"), col("doc_id"), col("idx"), col("lang"), col("len"))
        .dropDuplicates("line", "doc_id", "idx"))
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("idx"), col("lang"), col("len"))).as("k"))
      .select(col("line"), col("k.doc_id"), col("k.idx"), col("k.lang"), col("k.len"))
    val tfP = s.table(tfmTable(prefix))
      .select(col("split"), col("lang"), col("tok"), col("src_day"), col("c"))
      .dropDuplicates("split", "lang", "tok", "src_day")
      .groupBy(col("split"), col("lang"), col("tok"))
      .agg(sum(col("c")).as("c"))
      .filter(col("c") > 0)
    reportFrom(md5P, lineP, tfP)
  }

  /** Lifecycle hooks for the retractable backend (IncrState; the line
    * member table — the largest — drives sizing). */
  def maybeCompactRetractable(s: SparkSession, prefix: String, warehouse: String,
                              nBuckets: Int = 8, maxDeltaDays: Int = 8): Boolean =
    IncrState.withLease(s, warehouse, prefix) {
      IncrState.sizeTieredCompact(s, warehouse, allRetractableTables(prefix),
        linemTable(prefix), nBuckets, maxDeltaDays)
    }
  def compactRetractable(s: SparkSession, prefix: String, warehouse: String,
                         nBuckets: Int = 8): Unit =
    IncrState.withLease(s, warehouse, prefix) {
      IncrState.compactAll(s, warehouse, allRetractableTables(prefix), nBuckets)
    }

  def dropRetractableState(s: SparkSession, prefix: String): Unit =
    allRetractableTables(prefix).foreach(t => s.sql(s"DROP TABLE IF EXISTS ${t.name}"))

  /** Run the full daily loop over `days` slices (doc_id mod days) and
    * finalize. The day split is arbitrary — the suite proves the report
    * is invariant to slice order and count, and the oracle (a full
    * recompute over all documents at once) proves the merge lossless. */
  def incremental(s: SparkSession, dir: String, days: Int): DataFrame = {
    val docs = Tables.documents(s, dir)
    val state = newStateDir()
    (0 until days).foreach { day =>
      runDay(s, docs.filter(pmod(col("doc_id"), lit(days.toLong)) === day), state, day)
    }
    report(s, state, days - 1)
  }

  /** Retractable-backend exhibit: fold `days` slices at member level,
    * RETRACT the documents with doc_id % 7 == 3 (spanning every fold
    * day), purge, report — the oracle is the batch recompute on the
    * REDUCED corpus, proving keeper re-derive (a taken-down keeper's
    * group falls to its surviving min), tf netting, and purge
    * harmlessness land exactly on batch-on-reduced-corpus. */
  def incrementalDel(s: SparkSession, dir: String, days: Int): DataFrame = {
    val docs = Tables.documents(s, dir)
    val prefix = "curate_del_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = IncrState.newWarehouse()
    (0 until days).foreach { day =>
      runDayRetractable(s, docs.filter(pmod(col("doc_id"), lit(days.toLong)) === day),
        prefix, wh, day)
    }
    deleteDayRetractable(s, docs.filter(pmod(col("doc_id"), lit(7L)) === 3),
      prefix, wh, days)
    purgeDeletedRetractable(s, prefix, wh)
    reportRetractable(s, prefix, wh)
      .write.mode("overwrite").parquet(s"$wh/result")
    dropRetractableState(s, prefix)
    s.read.parquet(s"$wh/result").orderBy("split", "lang")
  }

  val qs: Map[String, Q] = Map(
    "q_pipeline_curate_incr" -> ((s, d) => incremental(s, d, 3)),
    "q_curate_del" -> ((s, d) => incrementalDel(s, d, 3))
  )
}
