package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** L55: Incremental triangle counting — the graph member of the
  * incremental-state family (L43-L48, L51). `q_graph_triangles`
  * re-derives the co-occurrence graph and re-enumerates the WHOLE wedge
  * stream (Σd⁺² rows — the engine's single largest wire item, 9.3 GB at
  * the ×25 probe rung) every run, yet triangle counts decompose by edge
  * arrival day: a triangle exists from the day its LAST edge arrives,
  * so the day-d increment is exactly "triangles of the current graph
  * containing ≥1 day-d edge", each counted once — work ∝ the FRESH
  * edges' wedges (the classic edge-iterator bound Σ min(deg a, deg b),
  * the same O(m^1.5) total as the batch run, but each day pays only its
  * own share and history's wedges are NEVER re-enumerated). State:
  *
  *   - `{prefix}_adj` (x, y) — the undirected adjacency, BOTH
  *     orientations of each edge (so wedge expansion and the closing
  *     membership probe are both equi-joins on the bucket column),
  *     bucketed on `x`, day-partitioned, dedup (x, y);
  *   - `{prefix}_tri` (node, tri_part, src_day) — the day's per-vertex
  *     triangle-count increments, ADDITIVE int64 partials bucketed on
  *     `node` (the L49 shape: retraction lands the same enumeration
  *     NEGATED); degree needs no partial at all — it derives from the
  *     live adjacency as one bucket-local count per vertex;
  *   - `{prefix}_del` (x, y) — edge tombstones (both orientations),
  *     the keyed form (L52): reads anti-join them, `purgeDeleted` is
  *     the delete-epoch filtered compaction.
  *
  * Exactness under any slicing: candidates for day d are distinct
  * sorted triples (a<b<c) discovered from the day's effective-fresh
  * edges against the CURRENT live adjacency — a triangle with k fresh
  * edges is found k times and dedups to once, and it cannot have been
  * counted on an earlier day because it was incomplete without today's
  * edge. Replayed edges (an edge re-landing on a later day) are
  * excluded from the effective-fresh set by an anti-join against the
  * PRIOR days' live rows, so their triangles never double-count.
  * Retraction: the lost triangles of a delete are "triangles of the
  * current graph containing ≥1 deleted edge" — the SAME enumeration,
  * landed as negative partials (a triangle whose other edge was
  * tombstoned earlier is already subtracted and, being absent from the
  * live view, is not found again). Delete wins: re-adding a tombstoned
  * edge needs a fresh prefix. Oracle: `q_graph_triangles`' SQL verbatim
  * (the fold over day slices of the edge set must land on the batch
  * profile bit-for-bit); `q_tri_del` uses the same SQL on the reduced
  * edge set.
  */
object TriIncr {

  private[ops] def adjTable(prefix: String) = s"${prefix}_adj"
  private[ops] def triTable(prefix: String) = s"${prefix}_tri"
  private[ops] def delTable(prefix: String) = s"${prefix}_del"

  private def stateTables(prefix: String): Seq[IncrState.StateTable] = Seq(
    IncrState.StateTable(adjTable(prefix), "x", Seq("x", "y")),
    IncrState.StateTable(triTable(prefix), "node", Seq("node", "src_day")))

  private def tombTable(prefix: String): IncrState.StateTable =
    IncrState.StateTable(delTable(prefix), "x", Seq("x", "y"))

  private def allTables(prefix: String): Seq[IncrState.StateTable] =
    stateTables(prefix) :+ tombTable(prefix)

  private def tombstones(s: SparkSession, prefix: String): Option[DataFrame] =
    if (!s.catalog.tableExists(delTable(prefix))) None
    else Some(s.table(delTable(prefix)).select(col("x"), col("y")).distinct())

  /** The live undirected adjacency (both orientations): replay dedup on
    * the natural key (bucket-local) minus the tombstones (a broadcast
    * anti-join on the dimension-sized takedown set, present only when a
    * delete ever ran). */
  private def liveAdj(s: SparkSession, prefix: String): DataFrame = {
    val a = s.table(adjTable(prefix)).select(col("x"), col("y"))
      .dropDuplicates("x", "y")
    tombstones(s, prefix).fold(a)(t =>
      a.join(broadcast(t), Seq("x", "y"), "left_anti"))
  }

  /** Both orientations of a canonical (u < v) edge frame — via explode,
    * so the upstream lineage (slice scan + canonical distinct) runs
    * ONCE, not once per union branch. */
  private def bothWays(e: DataFrame): DataFrame =
    e.select(explode(array(
        struct(col("u").as("x"), col("v").as("y")),
        struct(col("v").as("x"), col("u").as("y")))).as("d"))
      .select(col("d.x").as("x"), col("d.y").as("y"))

  /** Distinct sorted triples (a < b < c) of triangles in `live` that
    * contain at least one edge of `f` (canonical u < v rows). Wedges
    * expand from each edge's LOWER-DEGREE endpoint (degrees from the
    * live view — one bucket-local count), so the candidate volume is
    * Σ min(deg u, deg v) — the edge-iterator bound. The closing
    * membership probe is where that volume bites (44M candidate rows
    * per fold day at sf0.1), so it gets the batch operator's two
    * defenses (Graph.scala L37): a distributed BitSieve bloom over the
    * live edge keys drops non-closing wedges MAP-SIDE before they hit
    * the wire (false positives are fine — the exact semi-join after it
    * is the correctness backstop), and the surviving probe is a
    * SHUFFLE_HASH semi-join building the edge side — hashing the small
    * live build instead of SORTING the wedge stream (guarded by the
    * batch operator's runtime-derived per-task budget,
    * Graph.shjPerTaskBudget; above it the join falls back to
    * sort-merge, which spills instead of OOMing). `live` is expected
    * pre-pinned by the caller (it feeds four consumers). */
  private def trianglesTouching(s: SparkSession, f: DataFrame,
                                live: DataFrame, deg: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftshim.GraftShim.{column, expression}
    val oriented = f
      .join(deg.select($"x".as("u"), $"dg".as("du")), Seq("u"))
      .join(deg.select($"x".as("v"), $"dg".as("dv")), Seq("v"))
      .select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"),
          struct($"u".as("p"), $"v".as("q")))
          .otherwise(struct($"v".as("p"), $"u".as("q"))).as("e"))
      .select($"e.p".as("p"), $"e.q".as("q"))
    val liveCount = live.count()
    // the SAME runtime-derived per-task budget as the batch operator
    // (Graph.shjPerTaskBudget, ADVICE r14): a fixed 48 MB here would
    // re-open the r10 OOM cliff on small-heap/many-core executors once
    // the live adjacency grows — a shuffled-hash build cannot spill
    val shjSafe = liveCount * 100L /
      s.sessionState.conf.numShufflePartitions < Graph.shjPerTaskBudget(s)
    def shj(df: DataFrame): DataFrame = if (shjSafe) df.hint("shuffle_hash") else df
    val wedges = oriented
      .join(shj(live.select($"x".as("p"), $"y".as("c"))), Seq("p"))
      .filter($"c" =!= $"q")
    // the sieve's fixed cost (bitset build, 32-way partial merge, and
    // per-task shipping) only pays once the wedge stream is large —
    // measured ~2.5 s of pure overhead at exhibit scale against a
    // 1.7 s unsieved closing join — so it arms past an edge-count bar
    // and sizes its bits ∝ |E| via the shared self-sizing rule
    // (Graph.sieveBits, VERDICT r15 #3: 16 bits/edge, explicit-conf and
    // heap ceilings — the conf DEFAULT no longer caps the budget, which
    // used to saturate the sieve past ~4M live edges)
    val sieved =
      if (liveCount <= 2000000L) wedges
      else {
        val numBits = Graph.sieveBits(s, liveCount)
        val sketch = live.agg(column(graft.functions.BitSieveAgg(
            expression(xxhash64($"x", $"y")), numBits)
          .toAggregateExpression()).as("bf")).scalar()
        wedges.filter(column(BloomFilterMightContain(
          expression(sketch), expression(xxhash64($"q", $"c")))))
      }
    sieved
      .join(shj(live.select($"x".as("q"), $"y".as("c"))),
        Seq("q", "c"), "left_semi")
      .select(array_sort(array($"p", $"q", $"c")).as("trip"))
      .distinct()
  }

  /** Fold one day's canonical (u < v) edge slice: land the adjacency
    * rows, derive the day's NEW triangles (≥1 fresh edge, each counted
    * once), land the per-vertex increments as additive partials. Cost ∝
    * the fresh edges' wedges + slice-sized joins; history's wedge
    * stream is never re-enumerated. `day` must be a fresh day id. */
  /** Pin the live view + its degree table for one enumeration scope.
    * The live view feeds five consumers (degree, both wedge arms, the
    * closing probe, the sieve build) — an RDD-level Tungsten pin
    * (GraftShim.pinInternal) scans ~8× faster than an InMemoryRelation
    * cache on the wedge-heavy path (no column (de)compression), which
    * is the same reason the batch operator pins its oriented list. */
  private def withLive[T](s: SparkSession, prefix: String)
                         (body: (DataFrame, DataFrame) => T): T = {
    import s.implicits._
    val (live, pin) = org.apache.spark.sql.graftshim.GraftShim.pinInternal(
      liveAdj(s, prefix), org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = live.groupBy($"x").agg(count(lit(1)).as("dg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try body(live, deg)
    finally { deg.unpersist(false); pin.unpersist(false); () }
  }

  def runDay(s: SparkSession, slice: DataFrame, prefix: String,
             warehouse: String, day: Int, nBuckets: Int = 32): Unit =
    IncrState.withLease(s, warehouse, prefix) {
    import s.implicits._
    val Seq(adjT, triT) = stateTables(prefix)
    // the canonical slice feeds two consumers (the adjacency write and
    // the effective-fresh anti-join) — cache it so the slice scan +
    // canonical distinct run once
    val canon = slice.select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .filter($"u" =!= $"v").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      IncrState.writeDay(s, bothWays(canon).withColumn("day", lit(day)),
        adjT, warehouse, day, nBuckets)
      // effective fresh: drop replays of edges already present on PRIOR
      // days (their triangles were counted when they first arrived) and
      // tombstoned edges (delete wins) — both slice-shaped anti-joins
      val prior = s.table(adjTable(prefix)).filter($"day" =!= day)
        .select($"x".as("u"), $"y".as("v"))
      val fresh0 = canon.join(prior, Seq("u", "v"), "left_anti")
      val fresh = tombstones(s, prefix).fold(fresh0)(t =>
        fresh0.join(broadcast(t.select($"x".as("u"), $"y".as("v"))),
          Seq("u", "v"), "left_anti"))
      withLive(s, prefix) { (live, deg) =>
        val parts = trianglesTouching(s, fresh, live, deg)
          .select(explode($"trip").as("node"))
          .groupBy($"node").agg(count(lit(1)).as("tri_part"))
          .withColumn("src_day", lit(day)).withColumn("day", lit(day))
        IncrState.writeDay(s, parts, triT, warehouse, day, nBuckets)
      }
    } finally { canon.unpersist(false); () }
    IncrState.writeLastDay(s, warehouse, day, prefix)
  }

  /** Path-based twin for the suite's input-bytes test. */
  def runDayPath(s: SparkSession, slicePath: String, prefix: String,
                 warehouse: String, day: Int, nBuckets: Int = 32): Unit =
    runDay(s, s.read.parquet(slicePath), prefix, warehouse, day, nBuckets)

  /** Retraction: fold a set of canonical (u < v) edges OUT. The lost
    * triangles — triangles of the CURRENT graph containing ≥1 deleted
    * edge — are enumerated exactly like a fold's (each counted once)
    * and landed NEGATED; the edges then tombstone, so the live view
    * (and with it every degree and every later enumeration) excludes
    * them. Cost ∝ the deleted edges' wedges. `day` must be fresh. */
  def deleteDay(s: SparkSession, deleted: DataFrame, prefix: String,
                warehouse: String, day: Int, nBuckets: Int = 32): Unit =
    IncrState.withLease(s, warehouse, prefix) {
    import s.implicits._
    val Seq(_, triT) = stateTables(prefix)
    val canon = deleted.select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .filter($"u" =!= $"v").distinct()
    withLive(s, prefix) { (live, deg) =>
      // only edges actually present lose triangles (a never-folded or
      // already-tombstoned edge contributes nothing)
      val present = canon.join(live.select($"x".as("u"), $"y".as("v")), Seq("u", "v"), "left_semi")
      val parts = trianglesTouching(s, present, live, deg)
        .select(explode($"trip").as("node"))
        .groupBy($"node").agg((-count(lit(1))).as("tri_part"))
        .withColumn("src_day", lit(day)).withColumn("day", lit(day))
      IncrState.writeDay(s, parts, triT, warehouse, day, nBuckets)
    }
    IncrState.writeDay(s, bothWays(canon).withColumn("day", lit(day)),
      tombTable(prefix), warehouse, day, nBuckets)
    IncrState.writeLastDay(s, warehouse, day, prefix)
    // the first delete creates the tombstone table — swap the SQL report
    // view to its tombstone-aware form (no-op unless registered)
    IncrViews.refreshTriangles(s, prefix, warehouse)
  }

  /** Path-based delete twin for the suite's input-bytes test. */
  def deleteDayPath(s: SparkSession, slicePath: String, prefix: String,
                    warehouse: String, day: Int, nBuckets: Int = 32): Unit =
    deleteDay(s, s.read.parquet(slicePath), prefix, warehouse, day, nBuckets)

  /** Physical delete epoch for the adjacency (tombstones kept; the tri
    * partials need no purge — their retraction is the signed netting). */
  def purgeDeleted(s: SparkSession, prefix: String, warehouse: String,
                   nBuckets: Int = 32): Unit =
    IncrState.withLease(s, warehouse, prefix) {
      tombstones(s, prefix).foreach { tomb =>
        IncrState.compactAllWhere(s, warehouse, stateTables(prefix).take(1), nBuckets,
          _ => df => df.join(broadcast(tomb), Seq("x", "y"), "left_anti"))
      }
    }

  /** The per-vertex triangle profile off the persisted state — output
    * identical to `q_graph_triangles` (part_key, tri, degree, cc_ppm,
    * top-20). Degree is one bucket-local count over the live adjacency;
    * tri is the netted signed partial sum (bucket-local likewise); the
    * only shuffles are the profile join and the presentation top-k. */
  def report(s: SparkSession, prefix: String, warehouse: String): DataFrame = {
    import s.implicits._
    allTables(prefix).foreach(IncrState.ensureRegistered(s, _, warehouse))
    val deg = liveAdj(s, prefix).groupBy($"x".as("node")).agg(count(lit(1)).as("degree"))
    val tri = s.table(triTable(prefix))
      .select($"node", $"src_day", $"tri_part")
      .dropDuplicates("node", "src_day")
      .groupBy($"node").agg(sum($"tri_part").as("tri"))
    deg.join(tri, Seq("node"), "left")
      .select($"node".as("part_key"),
        coalesce($"tri", lit(0L)).as("tri"), $"degree",
        when($"degree" >= 2,
          expr("coalesce(tri, 0L) * 2000000 div (degree * (degree - 1))"))
          .otherwise(lit(0L)).as("cc_ppm"))
      .orderBy($"tri".desc, $"part_key")
      .limit(20)
  }

  /** Lifecycle (IncrState; the adjacency drives sizing). */
  def deltaDays(s: SparkSession, prefix: String, warehouse: String): Seq[Int] =
    IncrState.deltaDays(s, adjTable(prefix), warehouse)
  def maxFilesPerBucket(s: SparkSession, prefix: String, warehouse: String): Int =
    IncrState.maxFilesPerBucket(s, adjTable(prefix), warehouse)
  def maybeCompact(s: SparkSession, prefix: String, warehouse: String,
                   nBuckets: Int = 32, maxDeltaDays: Int = 8): Boolean =
    IncrState.withLease(s, warehouse, prefix) {
      IncrState.sizeTieredCompact(s, warehouse, allTables(prefix),
        adjTable(prefix), nBuckets, maxDeltaDays)
    }
  def compactState(s: SparkSession, prefix: String, warehouse: String,
                   nBuckets: Int = 32): Unit =
    IncrState.withLease(s, warehouse, prefix) {
      IncrState.compactAll(s, warehouse, allTables(prefix), nBuckets)
    }
  def lastDay(s: SparkSession, prefix: String, warehouse: String): Int =
    IncrState.lastDay(s, warehouse, prefix)
  def dropState(s: SparkSession, prefix: String): Unit =
    allTables(prefix).foreach(t => s.sql(s"DROP TABLE IF EXISTS ${t.name}"))

  /** The exhibit's edge set: the part co-occurrence graph of every
    * SIXTH order, canonical u < v (q_graph_triangles' derivation with
    * an order restriction). The restriction is EXHIBIT hygiene, not an
    * operator limit: the exhibit replays the wedge stream four times
    * (three daily folds + a delete), so on the full graph it costs ~6×
    * the one-shot batch purely as demonstration overhead (the fold
    * total over all days is ~1.6× one batch run in wedge volume — the
    * per-day share is the point); the machinery is size-independent and
    * the ScaleProbe ×10/×25 rungs carry the full-scale evidence (the
    * same bounded-exhibit precedent as q_join_cross). Every-third was
    * the r14 tier; VERDICT r14 #7 re-tiered it — 37 s of the 184 s
    * bench was demonstration overhead for one family. Tier sweep
    * (3-run subset discipline, bench_notes_r15 V4): every-4th 28 s,
    * every-6th 24.8 s, every-8th 24.4 s — past every-6th the cost is
    * the per-ACTION scheduling floor (~24 s for the pair's ~50 jobs),
    * not wedge volume, so every-6th is the knee: the richest graph the
    * floor price buys. */
  private def edgeSet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ls = Tables.lineitem(s, dir)
      .filter($"l_orderkey" % 6 === 0)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("sk")).distinct()
    ls.as("a").join(ls.as("b"), $"a.ok" === $"b.ok" && $"a.sk" < $"b.sk")
      .select($"a.sk".as("u"), $"b.sk".as("v")).distinct()
  }

  /** Land the exhibit's edge stream ONCE and read it back — the fold
    * consumes arriving edge slices, not the upstream co-occurrence
    * self-join; re-deriving lineitem⋈lineitem inside every fold action
    * (2 actions × days) was the dominant exhibit cost (measured 52 s →
    * the self-join runs once here, like any real edge feed landing). */
  private def landedEdges(s: SparkSession, dir: String, wh: String): DataFrame = {
    edgeSet(s, dir).write.mode("overwrite").parquet(s"$wh/edges")
    s.read.parquet(s"$wh/edges")
  }

  /** Exhibit bucket count: the wedge joins run at the adjacency's
    * bucket parallelism, and the fold's wedge stage is the whole cost —
    * match the session's shuffle parallelism instead of the siblings'
    * file-count-friendly 8 (their folds are aggregate-shaped; this one
    * is join-shaped). */
  private def exhibitBuckets(s: SparkSession): Int =
    s.conf.getOption("spark.sql.shuffle.partitions").flatMap(_.toIntOption).getOrElse(32)

  /** Daily loop over `days` edge slices ((u + v) mod days) + report —
    * the oracle is `q_graph_triangles`' SQL verbatim. */
  def incremental(s: SparkSession, dir: String, days: Int): DataFrame = {
    val prefix = "tri_incr_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = IncrState.newWarehouse()
    val e0 = landedEdges(s, dir, wh)
    val nb = exhibitBuckets(s)
    (0 until days).foreach { day =>
      runDay(s, e0.filter(pmod(col("u") + col("v"), lit(days.toLong)) === day),
        prefix, wh, day, nBuckets = nb)
    }
    report(s, prefix, wh)
      .write.mode("overwrite").parquet(s"$wh/result")
    dropState(s, prefix)
    s.read.parquet(s"$wh/result").orderBy(col("tri").desc, col("part_key"))
  }

  /** Fold all but the last slice, RETRACT the edges with
    * (u + v) % 7 == 3 (spanning folded and not-yet-folded days — a
    * block-list), purge, fold the last slice AFTER the delete — the
    * oracle is the batch profile on the REDUCED edge set, proving the
    * lost-triangle enumeration, the degree shrink through the live
    * view, and the block-list filter land exactly on
    * batch-on-reduced-graph. */
  def incrementalDel(s: SparkSession, dir: String, days: Int): DataFrame = {
    val prefix = "tri_del_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = IncrState.newWarehouse()
    val e0 = landedEdges(s, dir, wh)
    val nb = exhibitBuckets(s)
    (0 until days - 1).foreach { day =>
      runDay(s, e0.filter(pmod(col("u") + col("v"), lit(days.toLong)) === day),
        prefix, wh, day, nBuckets = nb)
    }
    deleteDay(s, e0.filter(pmod(col("u") + col("v"), lit(7L)) === 3),
      prefix, wh, days, nBuckets = nb)
    purgeDeleted(s, prefix, wh, nBuckets = nb)
    runDay(s, e0.filter(pmod(col("u") + col("v"), lit(days.toLong)) === days - 1),
      prefix, wh, days + 1, nBuckets = nb)
    report(s, prefix, wh)
      .write.mode("overwrite").parquet(s"$wh/result")
    dropState(s, prefix)
    s.read.parquet(s"$wh/result").orderBy(col("tri").desc, col("part_key"))
  }

  // Exhibit tier (VERDICT r14 #7): 2 fold days on the every-sixth-order
  // graph. The day count is demonstration, not proof — each day's
  // enumeration re-probes the live adjacency, so days are the exhibit's
  // fixed-cost multiplier (3 days × every-3rd = 37.6 s of the r14
  // bench; 2 days + the tier knee land at ~24.5 s, the per-action
  // floor — see edgeSet's tier-sweep note) — while the SLICING-
  // independence proof lives in TriIncrSuite (1/3/5-day folds all
  // equal the batch profile) and the scale proof in the ×10/×25 probe
  // rungs.
  val qs: Map[String, Q] = Map(
    "q_tri_incr" -> ((s, d) => incremental(s, d, 2)),
    "q_tri_del" -> ((s, d) => incrementalDel(s, d, 2))
  )
}
