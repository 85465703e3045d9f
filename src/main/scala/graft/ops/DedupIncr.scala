package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental NEAR-dup — the MinHash band store folded into the daily
  * cadence (VERDICT r10 #1). The reference's operating contract is one
  * slice of new documents per day with overlapping 24 h windows
  * (reference main.tf:217 daily schedule, src/main.py:263), so cross-day
  * near-dups are the COMMON case; `q_dedup_minhash` answers it only by
  * re-banding the whole corpus, which at 100 TB is the daily full rescan
  * `q_pipeline_curate_incr` (L43) just eliminated for the exact-dedup
  * family. This module persists the band rows themselves as state:
  *
  *   - `{prefix}_bands` (band, doc_id) — BUCKETED on `band`, the join
  *     key, and PARTITIONED by arrival day: the day-N candidate join
  *     reads its fresh side partition-pruned from the store and its
  *     history side bucket-aligned, so NOTHING crosses the wire — both
  *     sides of the band join are exchange-free.
  *   - `{prefix}_docs` (doc_id, shs) — the shingle sets, BUCKETED on
  *     `doc_id` for the verify join and PARTITIONED by arrival day so
  *     the fresh slice's shingles prune to one partition; history
  *     documents are never re-shingled (the raw text is never re-read).
  *   - `{prefix}_pairs` parquet — the verified pair ledger, append-only.
  *
  * Both state tables are APPEND-ONLY: doc_ids are disjoint across days,
  * so a day's fold is a pure insert — no merge aggregation, no rewrite
  * of history (cheaper even than the L43 min-merge; appends to a
  * bucketed table add one file set per bucket, compacted by the A11
  * small-file pass when file counts grow).
  *
  * Losslessness: a pair (x, y) is recalled iff the two signatures share
  * a band — a pure function of the two documents (all randomness from
  * the shared `U.h64`), independent of arrival day. Day N's candidate
  * join (fresh bands × full band store, d1 ≠ d2) therefore discovers
  * exactly the pairs whose LATEST member arrived on day N: every pair is
  * found exactly once, and the union over days is bit-identical to the
  * full-corpus recompute — which is what the DuckDB oracle computes
  * (the same SQL as `q_dedup_minhash`).
  *
  * Verify is one scan of the doc store per day: candidates are melted to
  * (pair, member) rows and joined ONCE against `{prefix}_docs` (keyed on
  * its bucket column), then regrouped per pair for the exact Jaccard —
  * not one join per pair side, which would scan the corpus-sized shingle
  * state twice. DedupIncrSuite pins (a) 1/3/5-day slicings all equal to
  * the one-shot recompute, (b) day-2 input-bytes ≤ slice-2 + state
  * (history parquet never re-read), (c) the band join's state side
  * exchange-free under the bucketed scan.
  */
object DedupIncr {

  val JaccardThreshold = 0.2

  /** Per-run state root, removed on JVM exit (same contract as
    * CurateIncr.stateRoot: results are read lazily from parquet, so
    * cleanup must not race the consumer). */
  private lazy val stateRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_dedup_incr_")
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

  private def bandsTable(prefix: String) = s"${prefix}_bands"
  private def docsTable(prefix: String) = s"${prefix}_docs"
  def pairsPath(warehouse: String, prefix: String) = s"$warehouse/pairs"

  /** Fold one day's slice into the band store and append the day's
    * verified near-dup pairs to the ledger. Reads ONLY the slice plus
    * the state tables — no prior day's documents. */
  def runDay(s: SparkSession, slice: DataFrame, prefix: String,
             warehouse: String, day: Int, nBuckets: Int = 32): Unit = {
    import s.implicits._
    val mode = if (day == 0) "overwrite" else "append"
    def writeB(df0: DataFrame, t: String, key: String,
               partCols: Seq[String] = Nil): Unit = {
      // repartition on the bucket key FIRST: HashPartitioning(key, n)
      // uses the same Murmur3-pmod as the bucketizer, so each task holds
      // exactly one bucket and the write emits n files — without it every
      // task writes a file per bucket it touches (tasks × buckets tiny
      // files per day: measured 15.2 s vs 0.7 s for the one-shot at
      // sf0.1, almost all of it file open/close)
      val df = df0.repartition(nBuckets, col(key))
      var w = df.write.mode(mode).format("parquet").bucketBy(nBuckets, key)
      if (partCols.nonEmpty) w = w.partitionBy(partCols: _*)
      // path only on create: an append targets the existing table location
      (if (day == 0) w.option("path", s"$warehouse/$t") else w).saveAsTable(t)
    }
    // one shingling pass per document, EVER: the slice is shingled once
    // into the doc store (day-partitioned so the fresh partition prunes),
    // and the band build reads the shingles back from state — never from
    // a fat runtime cache (shingle arrays are O(tokens) wide; caching
    // them and re-reading counts as corpus-order I/O, which the suite's
    // input-bytes bound exists to forbid).
    writeB(Dedup.withShingles(slice).select($"doc_id", $"shs", lit(day).as("day")),
      docsTable(prefix), "doc_id", Seq("day"))
    val freshSh = s.table(docsTable(prefix)).filter($"day" === day)
    // band rows carry the arrival day too, so the candidate join's fresh
    // side is read BACK from the store partition-pruned — no runtime
    // cache (whose block re-reads would count as undeclared input), and
    // with BOTH sides bucketed on `band` the join is fully exchange-free
    writeB(Dedup.minhashBands(
      freshSh.select($"doc_id", explode($"shs").as("sh")), "doc_id", "sh")
      .withColumn("day", lit(day)), bandsTable(prefix), "band", Seq("day"))
    // candidate recall: fresh bands against the FULL store (which now
    // includes the fresh rows, so fresh×fresh pairs are found too)
    val store = s.table(bandsTable(prefix))
    val cand = store.filter($"day" === day).as("f")
      .join(store.as("h"), $"f.band" === $"h.band" && $"f.doc_id" =!= $"h.doc_id")
      .select(least($"f.doc_id", $"h.doc_id").as("d1"),
        greatest($"f.doc_id", $"h.doc_id").as("d2"))
      .distinct()
    // single-scan exact verify: melt each pair to two member rows, join
    // once against the bucketed doc store, regroup per pair. max(when)
    // picks the side's (unique) shingle array back out of the group.
    val docs = s.table(docsTable(prefix)).select($"doc_id", $"shs")
    val verified = cand
      .select(struct($"d1", $"d2").as("p"))
      .select($"p", explode(array($"p.d1", $"p.d2")).as("doc_id"))
      .join(docs, "doc_id")
      .groupBy($"p")
      .agg(max(when($"doc_id" === $"p.d1", $"shs")).as("sa"),
        max(when($"doc_id" === $"p.d2", $"shs")).as("sb"))
      .withColumn("ni", size(array_intersect($"sa", $"sb")).cast("long"))
      .withColumn("jac", round($"ni".cast("double") / (size($"sa") + size($"sb") - $"ni"), 6))
      .filter($"jac" >= JaccardThreshold)
      .select($"p.d1".as("d1"), $"p.d2".as("d2"), $"jac")
    verified.write.mode(mode).parquet(pairsPath(warehouse, prefix))
  }

  /** Path-based twin for the suite's input-bytes test (the day's inputs
    * are, by construction, one slice dir + the state tables). */
  def runDayPath(s: SparkSession, slicePath: String, prefix: String,
                 warehouse: String, day: Int): Unit =
    runDay(s, s.read.parquet(slicePath), prefix, warehouse, day)

  /** The cumulative verified pair ledger after the last fold. */
  def pairs(s: SparkSession, prefix: String, warehouse: String): DataFrame =
    s.read.parquet(pairsPath(warehouse, prefix)).orderBy("d1", "d2")

  def dropState(s: SparkSession, prefix: String): Unit =
    Seq(bandsTable(prefix), docsTable(prefix)).foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"))

  /** Daily loop over `days` slices (doc_id mod days) + final ledger —
    * the oracle is the full-corpus MinHash recompute (q_dedup_minhash's
    * SQL verbatim), which the suite also cross-checks at other slicings. */
  def incremental(s: SparkSession, dir: String, days: Int): DataFrame = {
    val docs = Tables.documents(s, dir)
    val prefix = "dedup_incr_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = newWarehouse()
    // bucket count is the deployment's scale knob (hundreds at crawl
    // scale, sized so one bucket ≈ one task's worth of band rows); 8
    // keeps the per-day file count sane at bench scale
    (0 until days).foreach { day =>
      runDay(s, docs.filter(pmod(col("doc_id"), lit(days.toLong)) === day),
        prefix, wh, day, nBuckets = 8)
    }
    // the ledger is plain parquet — the state tables can drop now (DROP
    // on the external tables leaves the files; JVM-exit cleanup owns them)
    dropState(s, prefix)
    pairs(s, prefix, wh)
  }

  val qs: Map[String, Q] = Map(
    "q_dedup_incr" -> ((s, d) => incremental(s, d, 3))
  )
}
