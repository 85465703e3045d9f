package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe harness: empirical evidence that the shuffle-heavy query
  * plans grow ~linearly in corpus size (the 100 TB posture argued from
  * plan shapes + sf0.1 telemetry, converted into measured data).
  *
  * `generate` derives a deterministic K× corpus from a driver SF dir
  * (never touching /root/testdata — output goes to a tmp dir): K
  * key-offset copies of every table, preserving referential integrity
  * within each copy (all FK/PK columns shift together), so joins and
  * group-bys scale exactly K× in row volume while dimension-value
  * cardinality stays realistic (constant).
  *
  * Two copy transforms keep the SIMILARITY queries honest: identical
  * text/vectors across copies would make every row a perfect near-dup
  * of its K−1 clones, scaling the true pair count by K²/... — a
  * super-linear OUTPUT, which would read as a super-linear plan. So
  * copy i>0 rotates the document alphabet by i (bijective translate —
  * every token AND every char-n-gram changes, cross-copy Jaccard ≈ 0
  * under word-shingles and char-grams alike) and sign-flips a
  * pseudo-random half of each embedding's dimensions (cross-copy
  * cosine ≈ 0). Within-copy structure — the thing the operators
  * actually mine — is untouched, so true positives scale exactly K×.
  *
  * `measure` times each probe query warm (min of 3 after a warm-up
  * run) with Bench's task-metrics listener attached; `main` runs the
  * probe at 1× and K× and writes scale_probe.json:
  * per-query {t_1x, t_Kx, ratio, spill_mb_Kx, shuffle_mb_Kx}.
  * ScaleProbeSuite runs the same harness in-suite at sf0.01×10 and
  * asserts ratio ≲ K (linear, with fixed-overhead slack), zero spill,
  * and bounded driver-heap growth.
  */
object ScaleProbe {

  /** The shuffle-heaviest queries of the round-7 bench capture
    * (bench_out.json shuffle_mb, read+write desc), plus the three
    * structural scale risks regardless of local shuffle volume: the
    * prefix-filtered Jaccard join (hot-key hazard) and the iterative
    * CC fixpoint pair (multi-round state). */
  val probeQueries: Seq[String] = Seq(
    "q_math_funcs", "q_project_compute", "q_scan_parquet",
    "q_pipeline_curate2", "q_text_repetition", "q_dedup_ngram",
    "q_text_keyphrases", "q_join_inner", "q_win_range_salted",
    "q_date_funcs", "q_sim_jaccard", "q_dedup_cluster", "q_dedup_survivors",
    // round-7 additions: span-hash profiling (hot-span d-not-d² claim)
    // and the broadcast-centroid assignment (N×K map-side claim).
    // q_dedup_semantic is intentionally absent: at the exhibit's fixed
    // K=8 a K× corpus is Σ|c|²-quadratic BY DESIGN; its scale rule is
    // K ∝ N, pinned with data in SkewSuite instead.
    "q_dedup_spans", "q_cluster_kmeans",
    // degree-oriented triangles (wedge stream is the structural risk;
    // key-offset copies are disjoint subgraphs so truth scales exactly
    // K×) and the drift monitor (explode-heavy token shuffle)
    "q_graph_triangles", "q_split_drift",
    // session-5 additions: the naive-Bayes classifier (token stream ×
    // vocab-weight join — rotation grows the vocab ×K, weights stay a
    // broadcast), BPE encoding (corpus explode against the merged
    // dict), and the salted join (the planted uk=0 whale key absorbs
    // rows from EVERY copy, so the K× corpus is a direct stress of the
    // salt fan-out itself)
    "q_quality_classify", "q_text_bpe_encode", "q_join_salted",
    // session-6 addition: the grid resample — its generator-side
    // sequence() amplifies rows by span-hours per user; key-shifted
    // copies multiply users K×, so the densified grid (and the
    // per-user fill windows over it) is a direct K× stress
    "q_resample_gapfill",
    // round-12 addition (VERDICT r11 #3): the incremental near-dup band
    // store — the K× corpus multiplies every daily slice AND the state
    // the candidate join scans, so the probe stresses the bucketed
    // write/read cycle and the band join together; the day-growth axis
    // (cost vs history length at constant slice size) is pinned
    // separately in DedupIncrSuite
    "q_dedup_incr",
    // round-12 addition: the incremental ANN index (L45) — K× embeddings
    // multiply the daily fold (two bucketed writes) and the serving
    // path's candidate volume together; sign-flipped copies keep
    // cross-copy collisions ≈ chance so candidates/query stay ∝ N/2^bits.
    // Round 13: the fold now derives the bit width from the corpus size,
    // so the rungs here exercise the derivation (×10 folds at 6→7 bits,
    // ×25 at 7→8 incl. one mid-history re-code epoch) — the committed
    // default-config row IS the deployment shape now
    "q_ann_incr",
    // round-13 addition (VERDICT r12 #6): the incremental TF-IDF — K×
    // documents multiply the daily tf/df folds and the report's
    // bucket-aligned join + output-inherent window together; the
    // alphabet rotation grows the vocab ~K× so the df state scales too
    "q_tfidf_incr",
    // round-13 additions: the colorful approximate-triangles rung (its
    // whole reason to exist is the ×m² wedge-stream cut vs the exact
    // L37 — the probe row is the evidence, side by side with
    // q_graph_triangles on the same scaled graph) and the incremental
    // domain stats + quality report (fourth and fifth incremental
    // headliners, same per-day-cost-∝-slice claim; quality skips the
    // ×25 rung because its two inputs — events AND the customer dim —
    // don't fit the rung-2 single-table generation)
    "q_graph_triangles_approx", "q_domains_incr", "q_quality_incr",
    // round-14 additions: the retraction folds (delete slice + report
    // must scale like any fold — negative partials for domains, the
    // tombstone bitmap and-not for quality, which like q_quality_incr
    // skips rung 2 for its two-table input) and the incremental k-means
    // (fold = seed argmax + partial write; the K× probe also exercises
    // the re-assign epoch over K× vector state)
    "q_domains_del", "q_quality_del", "q_cluster_incr",
    // round-14 session 2: the two structurally NEW retraction forms —
    // the keyed-tombstone delete (band store: tombstones + ledger
    // rewrite + candidate anti-filter + purge, all of which must stay
    // ∝ delete-slice + ledger as the corpus grows) and the member-level
    // curation backend (whose stated trade is state ∝ gated corpus —
    // the probe row is where that trade's actual cost lives)
    "q_dedup_del", "q_curate_del",
    // the incremental-triangles fold: per-day cost must stay ∝ the
    // day's fresh-edge wedges (edge-iterator bound) — probed at ×10
    // beside the batch q_graph_triangles row it amortizes
    "q_tri_incr",
    // round-15 addition (VERDICT r14 #3): the triangle RETRACTION —
    // the newest, most expensive family member gets the same two-rung
    // evidence bar as its fold twin (delete cost ∝ deleted edges'
    // wedges, the same enumeration negated)
    "q_tri_del")

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Entity-id columns shifted per copy (FK and PK together, so each
    * copy is a self-consistent universe). Everything else — measures,
    * dates, category strings — is left as-is. */
  private val keyCols = Set(
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "user_id",
    "doc_id", "vec_id")

  /** Key offset between copies: far above any driver-generated id, far
    * below INT overflow even ×9 for the INTEGER nation/region keys. */
  private val Offset = 100000000L

  private def copyOf(name: String, src: DataFrame, i: Int): DataFrame = {
    val shifted = src.columns.foldLeft(src) { (df, c) =>
      if (keyCols(c))
        df.withColumn(c, (col(c).cast("long") + lit(i * Offset)).cast(src.schema(c).dataType))
      else df
    }
    if (i == 0) shifted
    else name match {
      case "documents" =>
        // per-copy AFFINE alphabet cipher (bijective translate): EVERY
        // token and every char-n-gram differs across copies (cross-copy
        // Jaccard ≈ 0 for word-shingle AND char-gram dedup alike),
        // while within-copy token structure — the thing the operators
        // mine — is preserved exactly. A token prefix would not be
        // enough: char-5-grams interior to a token would still collide
        // across copies and re-create the K² near-dup explosion.
        // j → (a·j + b) mod 26 with gcd(a,26)=1 gives 12·26 = 312
        // distinct bijections (vs the old rotation's 26, whose copy-26
        // alias capped pair-producing probes at k<26 — round 17 needed
        // q_dedup_incr at the ×100 rung). Two distinct affine maps
        // agree on ≤2 of 26 letters, so cross-copy token collisions
        // stay ≈ chance. a=1 for i<26 keeps every existing rung corpus
        // (k=10, k=25) byte-identical to the rotation it replaces.
        val az = "abcdefghijklmnopqrstuvwxyz"
        val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
        val a = coprimes((i / 26) % coprimes.length)
        val b = i % 26
        val target = (0 until 26).map(j => az((a * j + b) % 26)).mkString
        shifted.withColumn("text", translate(col("text"), az, target))
      case "embeddings" =>
        // flip a pseudo-random half of the dimensions per copy:
        // cross-copy cosine ≈ 0, norms and within-copy geometry intact
        shifted.withColumn("embedding",
          transform(col("embedding"),
            (x, j) => (x * (lit(1) - lit(2) * pmod(xxhash64(j, lit(i)), lit(2)).cast("int")))
              .cast("float")))
      case _ => shifted
    }
  }

  /** Write a deterministic K× corpus derived from srcDir into outDir.
    * `subset` restricts which tables materialize (the second rung only
    * needs the three tables its probed queries read). K must stay < 312:
    * the per-copy affine cipher is a bijection over the 12 coprime
    * slopes × 26 shifts, so copy i and copy i+312 would carry IDENTICAL
    * text and re-create the cross-copy near-dup explosion the cipher
    * exists to prevent — fatal for PAIR-PRODUCING probes (dedup/
    * similarity). `allowAlias` is retained for signature compatibility
    * but no longer needed below 312 copies (round 17: the affine cipher
    * replaced the 26-letter rotation precisely so the ×100 rung could
    * carry q_dedup_incr soundly). */
  def generate(spark: SparkSession, srcDir: String, outDir: String, k: Int,
               subset: Seq[String] = tables, allowAlias: Boolean = false): Unit = {
    require(k < 312 || allowAlias,
      s"k=$k aliases the 312-map affine cipher (copy i ≡ copy i-312)")
    subset.foreach { t =>
      val src = Tables.table(spark, srcDir, t)
      val scaled = (0 until k).map(i => copyOf(t, src, i)).reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  /** Warm-up + min-of-3 timings with shuffle/spill telemetry, Bench's
    * protocol (noop sink = full distributed materialization). Returns
    * name -> (seconds, shuffleReadMb, spillMb, rowsOut). rowsOut is a
    * separate post-timing count() pass (the noop write reports no
    * record counts): it lets a ratio verdict separate output-inherent
    * growth (rows_out grows with the rung — e.g. the gapfill grid or
    * the dedup pair emitters) from genuine plan degradation (time grows,
    * rows_out does not) — VERDICT r12 #5. */
  def measure(spark: SparkSession, dir: String, names: Seq[String]): Map[String, (Double, Double, Double, Long)] = {
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    val spilled = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spilled.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        }
      }
    })
    def drain(): Unit = org.apache.spark.sql.graftshim.GraftShim.drainListenerBus(spark)
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // broadcast blocks are reclaimed by the ContextCleaner only after
      // the driver GC collects their references — across 20 queries × 3
      // runs × 2 scales in one JVM the lazy cleanup falls behind the
      // allocation rate and a later broadcast build OOMs (observed as a
      // GCLocker retry failure at the 10× measure); an explicit GC per
      // released query keeps the cleaner ahead
      System.gc()
    }
    names.map { n =>
      // progress + failure isolation (round 14: a 60-minute probe run
      // died without a trace — the last queries in a long-lived probe
      // JVM are the likeliest to hit transient executor faults, and one
      // must not silently void the other 30 queries' evidence). A
      // failed query records the -1 sentinel, VISIBLE in the committed
      // artifact; the marker lines make the crash point findable.
      System.err.println(s"PROBE measuring $n @ $dir")
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val res = try {
        once() // warm: codegen + JIT + shuffle files
        drain()
        val (r0, s0) = (shufRead.get, spilled.get)
        // min-of-3 (Bench's offender re-measure hygiene): at the K× scale
        // a probed query runs 10-20 s and the first post-warm-up run still
        // carries a multi-second JIT tail — a 2-sample min caught a 1.7×
        // outlier for q_sim_jaccard that three clean samples do not
        val t = Seq(once(), once(), once()).min
        drain()
        // snapshot the timed runs' telemetry BEFORE the rows-out count —
        // the count is bookkeeping, not part of the measured plan
        val (shufMb, spillMb) =
          ((shufRead.get - r0) / 3.0 / 1048576.0, (spilled.get - s0) / 1048576.0)
        val rowsOut = fn(spark, dir).count()
        n -> (t, shufMb, spillMb, rowsOut)
      } catch {
        case e: Throwable =>
          System.err.println(s"PROBE FAIL $n @ $dir: ${e.getClass.getName}: ${e.getMessage}")
          n -> (-1.0, -1.0, -1.0, -1L)
      }
      release()
      res
    }.toMap
  }

  /** Second measurement rung (VERDICT r8 #2): the three plans whose
    * first-rung ratios sit furthest from flat — the inherently-
    * densifying grid resample (9.2× at 10×, output ∝ users), the
    * triangle wedge stream (5.3×), and the iterative-CC survivor pick
    * (3.5×) — get a ×25 point so the growth claim rests on TWO
    * measured rungs, not one extrapolation. 25 is the largest K the
    * alphabet-rotation bijection admits (see generate); each query
    * reads exactly one table, so only those three tables materialize. */
  val rung2Queries: Map[String, String] = Map(
    "q_resample_gapfill" -> "events",
    "q_graph_triangles" -> "lineitem",
    "q_dedup_survivors" -> "documents",
    // round 9: with gapfill fixed, the prefix-filtered Jaccard join is
    // the steepest remaining first-rung ratio (its low-threshold
    // contract is documented in ops/TextOps.scala) — measure its
    // second rung so the candidates-∝-K claim rests on two points too
    "q_sim_jaccard" -> "documents",
    // round 12: the two incremental headliners get a second rung too —
    // their claim is per-day cost ∝ slice + state, so the step ratio
    // under a 2.5× corpus (and therefore 2.5× slices AND 2.5× state)
    // should stay ≲ 2.5 like any linear plan
    "q_dedup_incr" -> "documents",
    "q_ann_incr" -> "embeddings",
    // round 13: the third incremental headliner — same per-day-cost-∝-
    // slice-plus-state claim, so same two-rung evidence bar
    "q_tfidf_incr" -> "documents",
    // round 13 late additions: the approximate triangles' ×25 point is
    // the head-to-head against the exact wedge stream's steepest rung;
    // the domain-stats fold gets the family's standard two-rung bar
    "q_graph_triangles_approx" -> "lineitem",
    "q_domains_incr" -> "documents",
    // round 14: the additive retraction fold and the incremental
    // k-means get the family's standard two-rung bar
    "q_domains_del" -> "documents",
    "q_cluster_incr" -> "embeddings",
    // round 14 session 2: the keyed-tombstone retraction and the
    // member-level backend get the standard two-rung bar too
    "q_dedup_del" -> "documents",
    "q_curate_del" -> "documents",
    // round 15 (VERDICT r14 #3): the incremental-triangles pair — the
    // wedge stream is the engine's known worst scaler, so its newest
    // members carry the ×25 point next to the batch operator's
    "q_tri_incr" -> "lineitem",
    "q_tri_del" -> "lineitem")
  val Rung2K = 25

  /** Third rung (VERDICT r13 #5): ×100 for the incremental family's
    * FOLD path — one more order of magnitude on the two cheapest
    * members, pinning the flat per-day-cost-∝-slice shape across three
    * measured orders (1× → 10× → 25× → 100×), the strongest 100 TB
    * evidence available in this sandbox. Both are aggregate-shaped
    * (per-(domain, lang) counts; vocab-sized tf/df state), so the
    * alphabet-rotation aliasing past 26 copies is harmless: colliding
    * tokens only scale df multiplicities, they cannot produce the
    * quadratic PAIR output the k<26 guard protects the dedup probes
    * from (see `generate`). */
  val rung3Queries: Map[String, String] = Map(
    "q_domains_incr" -> "documents",
    "q_tfidf_incr" -> "documents",
    // round 16 (VERDICT r15 #5): two more incremental members at ×100.
    // Embeddings carry NO alphabet rotation — the per-copy sign-flip
    // pattern is xxhash64(dim, copy), distinct for every copy index —
    // so unlike the text dedup probes there is no k≥26 aliasing hazard
    // at all: cross-copy cosine stays ≈ 0 at any K. The ANN fold also
    // exercises the self-sizing width derivation two more doublings up
    // (and the _vec_counts marker path the r15 ADVICE flagged); the
    // k-means fold exercises the K-centroid partial write at 100×
    // vector volume.
    "q_ann_incr" -> "embeddings",
    "q_cluster_incr" -> "embeddings",
    // round 17 (VERDICT r16 #2): the last two incremental members with
    // only ×25 evidence. The band-store fold's untested term was the
    // candidate join's bucket occupancy at 100× corpus — sound to probe
    // now that the affine cipher keeps all 100 copies' text disjoint
    // (the old rotation aliased at 26 and would have manufactured a K²
    // cross-copy pair explosion). The incremental triangle fold probes
    // fresh-edge wedge volume under a 100× graph: copies are disjoint
    // subgraphs, so wedges grow linearly with K by construction and any
    // superlinear time is the plan's fault, not the corpus's.
    "q_dedup_incr" -> "documents",
    "q_tri_incr" -> "lineitem")
  val Rung3K = 100

  /** Per-rung measurement in a FRESH JVM (VERDICT r15 #2): the r15
    * artifact's ×25 q_graph_triangles row read 81.3 s purely from
    * in-probe session inflation (~55 min into a working JVM; identical
    * code measured 50.4 s fresh — bench_notes_r15.md V6), and the
    * artifact of record should not need a forensic companion paragraph
    * to be read correctly. `main` with no SPARK_GRAFT_PROBE_RUNG env is
    * a THIN ORCHESTRATOR that creates no SparkSession at all: it spawns
    * one child JVM per rung (1x / kx / r2 / r3 — the Bench.freshJvmTime
    * spawn pattern: same classpath, add-opens, and heap as this
    * process), each child generates its rung's corpus and measures its
    * queries from a COLD session, writes scale_probe_rung_<rung>.json
    * at the repo root, and exits; the parent merges the rung files into
    * the same scale_probe.json schema as before (sweep.sh's sha/heap
    * gates and Bench's probe summary read it unchanged).
    *
    * The r15 "tuned sketch" re-measure of q_graph_triangles is GONE
    * because the knob left the critical path: Graph.sieveBits now
    * derives the wedge-sieve bit budget from the exact |E| the SHJ
    * guard already counts (16 bits/edge — at the ×25 rung that lands on
    * the very 512 Mbit the manual knob used to buy), so the default-
    * conf row IS the tuned row. */
  def main(args: Array[String]): Unit =
    sys.env.get("SPARK_GRAFT_PROBE_RUNG") match {
      case Some(r) => runRung(r, args)
      case None => orchestrate(args)
    }

  private def parseArgs(args: Array[String]): (String, String, Int) = (
    if (args.length > 0) args(0) else "/root/testdata/sf0.1",
    if (args.length > 1) args(1) else "/tmp/graft_scale10x",
    if (args.length > 2) args(2).toInt else 10)

  // diagnostic subsetting (same contract as Bench/Verify):
  // SPARK_GRAFT_PROBE_ONLY=q_a,q_b probes just those queries; when
  // every selected query has a known single-table input (the rung-2
  // map), only those tables are generated — the fast loop when
  // re-measuring one plan's scaling after a change
  private def onlySet: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

  private def rungFile(rung: String): java.nio.file.Path =
    Bench.repoRoot.resolve(s"scale_probe_rung_$rung.json")

  /** One rung, one fresh JVM: generate (if the rung scales) + measure +
    * write the rung file. Invoked by the orchestrator with
    * SPARK_GRAFT_PROBE_RUNG set; runnable by hand for diagnosis. */
  private def runRung(rung: String, args: Array[String]): Unit = {
    val (srcDir, outDir, k) = parseArgs(args)
    val only = onlySet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = only.fold(probeQueries)(names => probeQueries.filter(names))
    val rung2Selected = only.fold(rung2Queries)(names => rung2Queries.filter(kv => names(kv._1)))
    val rung3Selected = only.fold(rung3Queries)(names => rung3Queries.filter(kv => names(kv._1)))
    var genSec = 0.0
    def timedGen(dst: String, kk: Int, subset: Seq[String], alias: Boolean = false): Unit = {
      val t0 = System.nanoTime()
      generate(spark, srcDir, dst, kk, subset, allowAlias = alias)
      genSec = (System.nanoTime() - t0) / 1e9
    }
    val measured: Map[String, (Double, Double, Double, Long)] = rung match {
      case "1x" => measure(spark, srcDir, selected)
      case "kx" =>
        val genSubset =
          if (only.exists(names => names.forall(rung2Queries.contains)))
            rung2Selected.values.toSeq.distinct
          else tables
        timedGen(outDir, k, genSubset)
        measure(spark, outDir, selected)
      case "r2" =>
        // the interesting number is the STEP ratio t_25x/t_10x against
        // the row-growth step 2.5 — a plan that is genuinely ~linear
        // holds step ≲ 2.5 on a rung where fixed overheads no longer
        // flatter it
        if (rung2Selected.isEmpty) Map.empty
        else {
          timedGen(outDir + "_r2", Rung2K, rung2Selected.values.toSeq.distinct)
          measure(spark, outDir + "_r2", rung2Selected.keys.toSeq)
        }
      case "r3" =>
        if (rung3Selected.isEmpty) Map.empty
        else {
          timedGen(outDir + "_r3", Rung3K, rung3Selected.values.toSeq.distinct,
            alias = true)
          measure(spark, outDir + "_r3", rung3Selected.keys.toSeq)
        }
      case other => sys.error(s"unknown probe rung '$other' (1x|kx|r2|r3)")
    }
    def r3f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val rows = measured.toSeq.sortBy(_._1).map { case (n, (t, shuf, spill, rows)) =>
      s""""$n":{"t":${r3f(t)},"shuffle_mb":${r3f(shuf)},"spill_mb":${r3f(spill)},"rows_out":$rows}"""
    }
    val memMb = Runtime.getRuntime.maxMemory / 1048576
    java.nio.file.Files.writeString(rungFile(rung),
      s"""{"rung":"$rung","gen_sec":${r3f(genSec)},"driver_mem_mb":$memMb,"queries":{${rows.mkString(",")}}}""")
    println(s"[probe] rung $rung done: ${measured.size} queries, gen ${r3f(genSec)} s")
    spark.stop()
  }

  /** Spawn one fresh child JVM per rung, then merge the rung files into
    * scale_probe.json. The parent never creates a SparkSession — every
    * timed number comes from a cold JVM. */
  private def orchestrate(args: Array[String]): Unit = {
    val (srcDir, _, k) = parseArgs(args)
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val opens = Seq("java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
      "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val heapMb = Runtime.getRuntime.maxMemory / 1048576
    for (rung <- Seq("1x", "kx", "r2", "r3")) {
      java.nio.file.Files.deleteIfExists(rungFile(rung))
      val cmd = (Seq(javaBin) ++ opens ++ Seq(
        s"-Xmx${heapMb}m", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", sys.props("java.class.path"), "graft.ScaleProbe") ++ args).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_PROBE_RUNG", rung)
      pb.inheritIO()
      val p = pb.start()
      val code = p.waitFor()
      require(code == 0, s"probe rung $rung child failed with exit $code")
      require(java.nio.file.Files.exists(rungFile(rung)),
        s"probe rung $rung child exited 0 but wrote no rung file")
    }
    merge(srcDir, k)
  }

  private def merge(srcDir: String, k: Int): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def load(rung: String): (Double, Long, Map[String, (Double, Double, Double, Long)]) = {
      val node = om.readTree(java.nio.file.Files.readString(rungFile(rung)))
      val qs = scala.collection.mutable.Map[String, (Double, Double, Double, Long)]()
      val it = node.get("queries").fields()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue
        qs(e.getKey) = (v.get("t").asDouble(), v.get("shuffle_mb").asDouble(),
          v.get("spill_mb").asDouble(), v.get("rows_out").asLong())
      }
      (node.get("gen_sec").asDouble(), node.get("driver_mem_mb").asLong(), qs.toMap)
    }
    val (g1, m1, at1) = load("1x")
    val (gk, mk, atK) = load("kx")
    val (g2, m2, atK2) = load("r2")
    val (g3, m3, atK3) = load("r3")
    require(Set(m1, mk, m2, m3).size == 1,
      s"rung heaps diverged: $m1/$mk/$m2/$m3 MB — the artifact must be one config")
    val genSec = g1 + gk + g2 + g3
    def r3f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val selected = onlySet.fold(probeQueries)(names => probeQueries.filter(names))
    val rows = selected.filter(at1.contains).map { n =>
      val (t1, _, _, rows1) = at1(n)
      val (tk, shufK, spillK, rowsK) = atK(n)
      val rung2 = atK2.get(n).map { case (tk2, shufK2, spillK2, rowsK2) =>
        s""","t_${Rung2K}x":${r3f(tk2)},"ratio_${Rung2K}x":${r3f(tk2 / math.max(t1, 0.001))},"step_${k}x_to_${Rung2K}x":${r3f(tk2 / math.max(tk, 0.001))},"shuffle_mb_${Rung2K}x":${r3f(shufK2)},"spill_mb_${Rung2K}x":${r3f(spillK2)},"rows_out_${Rung2K}x":$rowsK2"""
      }.getOrElse("")
      // step vs the ×25 rung: rows grow 4×, so a flat fold holds ≲ 4
      val rung3 = (atK3.get(n), atK2.get(n)) match {
        case (Some((tk3, shufK3, spillK3, rowsK3)), rung2Point) =>
          val step = rung2Point.map { case (tk2, _, _, _) =>
            s""","step_${Rung2K}x_to_${Rung3K}x":${r3f(tk3 / math.max(tk2, 0.001))}"""
          }.getOrElse("")
          s""","t_${Rung3K}x":${r3f(tk3)},"ratio_${Rung3K}x":${r3f(tk3 / math.max(t1, 0.001))}$step,"shuffle_mb_${Rung3K}x":${r3f(shufK3)},"spill_mb_${Rung3K}x":${r3f(spillK3)},"rows_out_${Rung3K}x":$rowsK3"""
        case _ => ""
      }
      s""""$n":{"t_1x":${r3f(t1)},"t_${k}x":${r3f(tk)},"ratio":${r3f(tk / math.max(t1, 0.001))},"shuffle_mb_${k}x":${r3f(shufK)},"spill_mb_${k}x":${r3f(spillK)},"rows_out_1x":$rows1,"rows_out_${k}x":$rowsK$rung2$rung3}"""
    }
    // the probed commit rides in the artifact: mtime-based freshness is
    // defeated by any clone/checkout (mtime = now), and round 12's
    // triangles regression shipped exactly because a probe row was
    // reasoned about without knowing WHICH code it measured — see
    // sweep.sh's sha-ancestry gate
    val gitHead = try {
      val pr = new ProcessBuilder("git", "-C", Bench.repoRoot.toString,
        "rev-parse", "HEAD").redirectErrorStream(true).start()
      val out = new String(pr.getInputStream.readAllBytes(), "UTF-8").trim
      if (pr.waitFor() == 0 && out.matches("[0-9a-f]{40}")) out else ""
    } catch { case _: Throwable => "" }
    // heap provenance (VERDICT r14 #2): the probe-of-record config is
    // SPARK_DRIVER_MEM=24g (bench_notes_r10:50); the heap rides in the
    // artifact so sweep.sh can REJECT a probe whose heap differs from
    // the record — same discipline as git_head. Children inherit the
    // parent heap and the merge refuses diverging rung heaps above.
    val line = s"""{"src":"$srcDir","k":$k,"k2":$Rung2K,"git_head":"$gitHead","driver_mem_mb":$m1,"fresh_jvm_per_rung":true,"gen_sec":${r3f(genSec)},"queries":{${rows.mkString(",")}}}"""
    // a subset run is a diagnostic, not evidence — never clobber the
    // committed full-surface probe file with a partial one; both land at
    // the REPO ROOT regardless of cwd (the Bench atRoot discipline —
    // sweep.sh and Bench's probe summary read the root copy)
    val outFile = if (onlySet.isEmpty) "scale_probe.json" else "scale_probe_partial.json"
    java.nio.file.Files.writeString(Bench.repoRoot.resolve(outFile), line)
    println(line)
  }
}
