package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the relational tables — SURVEY.md §2.L35.
  *
  * PageRank-style centrality is the classic crawl-quality signal (the
  * reference's domain is a crawler landing tweets for downstream
  * analytics; a production crawl pipeline ranks hosts/pages by link
  * centrality to prioritize fetch and to score training-data quality).
  * There is no hyperlink column in the test schema, so the exhibit
  * builds the natural bipartite interaction graph the warehouse DOES
  * have — customer↔supplier via orders⋈lineitem — and ranks suppliers.
  *
  * Determinism at scale is the interesting part: textbook PageRank
  * accumulates doubles, and distributed double summation is
  * merge-order-dependent — two runs of the same job can disagree in the
  * last ulp and flip a top-k boundary. This implementation is
  * FIXED-POINT INTEGER PageRank: ranks live in int64 micro-units
  * (1.0 ≡ 1_000_000), each neighbor contribution is exact integer
  * division `r div outdeg`, and the damping update is
  * `150000 + (Σ·85) div 100` — every intermediate an exact int64, every
  * aggregation a mergeable integer sum, so the result is bit-identical
  * across partitionings, retries, and engines (the oracle runs the same
  * integer recurrence). Three unrolled iterations; each is one
  * equi-join (edges⋈ranks) + one partial-aggregable sum — the
  * Pregel-without-Pregel shape whose per-round cost is |E| shuffle rows
  * on the destination key. At crawl scale the edge list would be
  * persisted/bucketed by source so the per-round join never re-shuffles
  * the static side (cf. connectedComponents' pinned rounds,
  * ops/Dedup.scala).
  */
object Graph {

  /** Per-task byte budget a non-spillable SHUFFLE_HASH build may claim —
    * the shared guard for every `.hint("shuffle_hash")` decision in the
    * graph family (here and TriIncr; ADVICE r14 factored it out so the
    * incremental path can't silently re-open the batch's r10 OOM cliff
    * with a stale fixed bound).
    *
    * Derivation (see triangleProfile's plan narrative for the history):
    * per-executor slots × build bytes must fit the unified-memory share,
    * budget = heap × 0.6 (spark.memory.fraction) × ¼ headroom / slots =
    * heap × 15% / slots. The HEAP SOURCE must match where the build
    * runs: local mode tasks run in this JVM (Runtime.maxMemory is the
    * truth; spark.executor.memory is ignored by local mode), cluster
    * mode builds in executors (only spark.executor.memory counts —
    * Spark's 1 GB default when unset). Cluster mode trusts the derived
    * budget ONLY when spark.executor.cores is explicit: unset means 1
    * on YARN/K8s but ALL worker cores in standalone, so assuming 1 slot
    * would over-grant the non-spillable hint by the real core count —
    * with cores unknown, fall back to the conservative fixed 48 MB the
    * derivation replaced (safe on every host it ever ran on). On an
    * 8 GB / 32-thread local config this yields ~38 MB; a 24 GB heap
    * gets ~121 MB and keeps the hash build through the ×25 probe rung. */
  def shjPerTaskBudget(ss: org.apache.spark.sql.SparkSession): Long = {
    val local = ss.sparkContext.isLocal
    val coresConf =
      if (local) Some(math.max(ss.sparkContext.defaultParallelism, 1))
      else ss.sparkContext.getConf.getOption("spark.executor.cores")
        .flatMap(_.toIntOption).map(math.max(_, 1))
    val heapBytes =
      if (local) Runtime.getRuntime.maxMemory
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        ss.sparkContext.getConf.get("spark.executor.memory", "1g"))
    coresConf
      .map(slots => heapBytes * 15L / 100L / slots)
      .getOrElse(48L << 20)
  }

  /** Self-sizing bit budget for the k=1 wedge sieve (VERDICT r15 #3) —
    * shared by the batch triangle profile and TriIncr's fold. The ANN
    * width derivation (AnnIncr.derivedBits) is the template: derive the
    * knob from a cardinality the plan already pays for, never from a
    * fixed host assumption.
    *
    * Decision rule: m = 16·n bits (k=1 FPP ≈ 1−e^(−n/m) ≈ 6.1% — the
    * measured ×25 tuned-sketch point: 512 Mbit at ~30M edges is exactly
    * this rule, 5.6 GB wedge shuffle vs 9.3 GB at the old 64 Mbit conf
    * default), floored at 8 Mbit (1 MB — below that the sketch is free
    * anyway), then capped twice:
    *   - an EXPLICITLY-set `runtime.bloomFilter.maxNumBits` is honored
    *     as a ceiling — it is the operator knob that bounds Spark's own
    *     injected runtime filters, and an operator who lowered it has
    *     asked for a memory bound; the conf's DEFAULT is not a cap
    *     (that default existing is why the tuned probe row needed a
    *     manual knob until this rule);
    *   - a heap sanity bound of heap/32 bytes (the serialized sketch
    *     rides the scalar-subquery result into every task's probe
    *     expression; local mode reads this JVM's heap, cluster mode the
    *     executor memory — same where-does-it-run logic as the SHJ
    *     budget above). 24 GB ⇒ 6 Gbit ceiling, 8 GB ⇒ 2 Gbit; the
    *     rule only binds on corpora whose edge set already dwarfs the
    *     probed shuffle this sieve exists to cut. */
  def sieveBits(ss: org.apache.spark.sql.SparkSession, nItems: Long): Long = {
    val derived = math.max(1L << 23, nItems * 16L)
    val heapBytes =
      if (ss.sparkContext.isLocal) Runtime.getRuntime.maxMemory
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        ss.sparkContext.getConf.get("spark.executor.memory", "1g"))
    val heapCapBits = heapBytes / 32L * 8L
    val knob = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val explicitCap =
      if (ss.sessionState.conf.contains(knob))
        ss.sessionState.conf.getConfString(knob).toLongOption.getOrElse(Long.MaxValue)
      else Long.MaxValue
    math.min(explicitCap, math.min(heapCapBits, derived))
  }

  /** One synchronous integer-PageRank round: r'(v) = 0.15 + 0.85·Σ_{u→v}
    * r(u)/deg(u), all in micro-unit int64 arithmetic. */
  private def step(edges: DataFrame, deg: DataFrame, r: DataFrame): DataFrame = {
    val ss = edges.sparkSession
    import ss.implicits._
    edges.join(r, Seq("u")).join(deg, Seq("u"))
      .select($"v", expr("r div outdeg").as("contrib"))
      .groupBy($"v").agg(sum($"contrib").as("c"))
      .select($"v".as("u"), (lit(150000L) + expr("(c * 85) div 100")).as("r"))
  }

  /** Degree-oriented triangle profile of an undirected graph. `e0`
    * must hold each undirected edge exactly once as (u, v) with
    * u ≠ v (either orientation). Returns one row per vertex:
    * (node, tri, degree, cc_ppm) — triangle count, degree, and
    * local clustering coefficient 2T·1e6 div d(d−1) in int64 ppm.
    * See the L37 scaladoc on q_graph_triangles for the scale argument
    * (oriented out-degree ≤ O(√|E|) ⇒ no hot-key wedge blowup). */
  def triangleProfile(e0In: DataFrame): DataFrame = {
    val ss = e0In.sparkSession
    import ss.implicits._
    // pin the CANONICAL edge set too (round 17): e0 feeds the degree
    // union (twice), the orientation join, and — through deg — the
    // final profile's left side, so without a pin the caller's edge
    // derivation (lineitem⋈lineitem self-join + distinct for L37, plus
    // a per-row md5 coloring for L37b) re-executes up to four times per
    // run (plans/r17/q_graph_triangles_approx_before.txt: four lineitem
    // scans, no exchange reuse across the union branches). Same
    // Tungsten-pin idiom as the oriented list below; ~16 B/edge, the
    // same magnitude the oriented pin already budgets.
    val (e0, _) = org.apache.spark.sql.graftshim.GraftShim.pinInternal(
      e0In
        .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
        .filter($"u" =!= $"v").distinct(),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e0.select($"u".as("x")).union(e0.select($"v".as("x")))
      .groupBy($"x").agg(count(lit(1)).as("dg"))
    // orient lower (deg, id) → higher (deg, id); ties break on id so
    // the orientation is total and acyclic. The oriented list feeds
    // THREE joins (both wedge arms + the closing semi-join); pin it
    // once in Tungsten format (cf. the pagerank/CC fixpoint pins) so
    // the upstream self-join lineage runs once, not three times.
    val (e, _) = org.apache.spark.sql.graftshim.GraftShim.pinInternal(
      e0
        .join(deg.select($"x".as("u"), $"dg".as("du")), Seq("u"))
        .join(deg.select($"x".as("v"), $"dg".as("dv")), Seq("v"))
        .select(
          when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"),
            struct($"u".as("s"), $"v".as("t")))
            .otherwise(struct($"v".as("s"), $"u".as("t"))).as("e"))
        .select($"e.s".as("s"), $"e.t".as("t")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // SHUFFLE_HASH on the edge arms: the wedge stream is Σ d⁺² rows —
    // the big side — while each edge-list partition is small; hashing
    // the edge build side skips the sort-merge sort of the wedge
    // stream (still hash-partitioned and AQE-splittable, no broadcast
    // assumption on |E|).
    //
    // CONDITIONAL (VERDICT r10 #4): a shuffled-hash build cannot spill,
    // so above a measured size the hint is a memory cliff, not an
    // optimization — the ×25 probe rung OOMed an 8 GB heap in exactly
    // this build. |E| is counted exactly here (one cheap pass over the
    // just-pinned Tungsten blocks — the pin materializes on first use
    // anyway, and Catalyst's own post-join estimates are 2,500–150,000×
    // off on this lineage, which is why the decision cannot be left to
    // the planner's stats). An UnsafeHashedRelation costs ~100 B per
    // 16-byte edge row; the hint stays only while one build partition
    // (|E|/shufflePartitions rows) is comfortably inside a per-task
    // slice of executor memory (48 MB ≪ the ~150 MB/task a 32-thread
    // 8 GB executor budgets); above it the joins fall to sort-merge,
    // which SPILLS instead of OOMing. SpillSuite separately proves
    // results are bit-identical under forced spill.
    // AQE-coalescing caveat on the |E|/numShufflePartitions estimate
    // (ADVICE r11 #5): in principle the coalescer could merge small
    // build partitions past the size the safety test assumed. The
    // remedy of pinning the build with a fixed-N repartition was
    // MEASURED AND REJECTED: REPARTITION_BY_NUM makes the coalescer
    // skip the whole stage group — including its SKEW-SPLIT of the fat
    // wedge-stream partitions, which is load-bearing at scale (×25
    // probe rung: 52 GB of sort spill and step 4.15 with the pin,
    // scale_probe r12). In practice coalescing merges by the COMBINED
    // bytes of all exchanges in the group, and the wedge stream dwarfs
    // the edge build, so build partitions never merge far; the ¼
    // safety factor below absorbs the residual merge headroom.
    //
    // The budget is derived from the RUNTIME memory config, not a
    // hardcoded host assumption (round 12): the original fixed 48 MB
    // bound encoded "8 GB executor, 32 threads" and silently forced the
    // spilling sort-merge path on ANY host once |E|/parts passed it —
    // the ×25 probe rung paid 52 GB of sort spill and step 2.9-3.1 on a
    // 24 GB heap where the hinted build demonstrably fits (the r10
    // unconditional-hint capture: 48.9 s, zero spill, step 2.31; this
    // only surfaced when the probe-freshness gate forced a regen —
    // r11's committed probe predated the conditional). Per-executor
    // slots × build bytes must fit the unified-memory share: budget =
    // executor heap × 0.6 (spark.memory.fraction) × ¼ (probe-side +
    // storage-pin headroom) / slots. On an 8 GB / 32-thread executor
    // this yields ~38 MB — stricter than the old bound, honoring the
    // r10 OOM — while a 24 GB heap gets ~121 MB and keeps the
    // non-spilling hash build through the ×25 rung.
    //
    // The heap source must match WHERE the build runs: in local mode
    // tasks run in this JVM, so Runtime.maxMemory is the truth and
    // spark.executor.memory (ignored by local mode) must not be
    // consulted; in cluster mode the build runs in executors, so only
    // spark.executor.memory counts (Spark's 1 GB default when unset) —
    // falling back to the DRIVER's heap there would over-grant the
    // non-spillable hint against small executors, the exact cliff this
    // guard exists for.
    val perTaskBudget = shjPerTaskBudget(ss)
    val eCount = e.count()
    val shjSafe =
      eCount * 100L / ss.sessionState.conf.numShufflePartitions < perTaskBudget
    def shj(df: DataFrame): DataFrame = if (shjSafe) df.hint("shuffle_hash") else df
    val wedges = e.as("e1").join(shj(e.as("e2")), $"e1.t" === $"e2.s")
      .select($"e1.s".as("a"), $"e1.t".as("b"), $"e2.t".as("c"))
    // Filter-before-shuffle: in a sparse graph almost no wedge closes
    // (sf0.1: 1.9M of 49M), yet the naive plan shuffles the ENTIRE
    // wedge stream to the closing join. A bloom filter over
    // xxhash64(s,t) of the edge list, probed map-side by the codegen'd
    // BloomFilterMightContain kernel, drops non-closing wedges before
    // they ever hit the wire — the same edge-side filter Spark's own
    // runtime row-level filtering injects for selective joins, built
    // here explicitly because the edge side has no selective predicate
    // for the optimizer to latch onto. False positives are fine: the
    // exact LEFT SEMI join after the filter is the correctness
    // backstop.
    //
    // The sketch is built DISTRIBUTED: a scalar-subquery aggregate over
    // the pinned oriented edge list — map-side partials per partition,
    // one single-partition merge of the ~MB bitsets, and the one-row
    // result ships to the probe side through Spark's subquery machinery
    // (identical to the plan its own InjectRuntimeFilter rule emits).
    // No driver-side action, no |E|-proportional driver allocation.
    // The aggregate is graft's k=1 BitSieveAgg rather than Spark's
    // bloom_filter_agg: the builtin clamps its declared item count to
    // runtime.bloomFilter.maxNumItems and derives k=11 from the clamp,
    // which SATURATES once |E| passes a few× the cap (the r9 ×25-rung
    // envelope), while a k=1 sieve at the full maxNumBits budget needs
    // no cardinality estimate at all and degrades gracefully toward
    // pass-through — see the BitSieveAgg scaladoc for the measured
    // estimate-error and FPP arithmetic. The bit budget stays on the
    // same conf knob that bounds Spark's own injected filters, and the
    // output is the standard sketch serialization, so the probe below
    // is still the codegen'd BloomFilterMightContain kernel. False
    // positives are fine either way: the exact LEFT SEMI join after
    // the filter is the correctness backstop.
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftshim.GraftShim.{column, expression}
    // SELF-SIZED bit budget (VERDICT r15 #3): m = 16·|E| from the exact
    // edge count the SHJ guard above already paid for — the ×25 probe's
    // tuned-sketch shuffle at default conf, no manual knob. See
    // sieveBits for the rule, caps, and the measured points.
    val numBits = sieveBits(ss, eCount)
    val sketch = e.agg(column(graft.functions.BitSieveAgg(
        expression(xxhash64($"s", $"t")), numBits)
      .toAggregateExpression()).as("bf")).scalar()
    val mightClose = column(BloomFilterMightContain(
      expression(sketch), expression(xxhash64($"a", $"c"))))
    val tri = wedges.filter(mightClose).join(
      shj(e.select($"s".as("a"), $"t".as("c"))),
      Seq("a", "c"), "left_semi")
    val perNode = tri
      .select(explode(array($"a", $"b", $"c")).as("x"))
      .groupBy($"x").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("x"), "left")
      .select($"x".as("node"), coalesce($"tri", lit(0L)).as("tri"),
        $"dg".as("degree"))
      .withColumn("cc_ppm",
        when($"degree" >= 2, expr("(tri * 2000000) div (degree * (degree - 1))"))
          .otherwise(lit(0L)))
  }

  val qs: Map[String, Q] = Map(
    // L35: supplier centrality in the customer↔supplier order graph.
    // Undirected edges (both directions materialized) so the bipartite
    // graph has no dangling nodes — every node with an edge both emits
    // and receives each round. Node encoding: cust → 2k, supp → 2k+1
    // keeps one int64 id space with zero collisions.
    "q_graph_pagerank" -> ((s, d) => {
      import s.implicits._
      val oc = Tables.orders(s, d)
        .select($"o_orderkey".as("ok"), ($"o_custkey" * 2).as("cu"))
      val ls = Tables.lineitem(s, d)
        .select($"l_orderkey".as("ok"), ($"l_suppkey" * 2 + 1).as("su"))
      val e0 = oc.join(ls, Seq("ok")).select($"cu".as("u"), $"su".as("v")).distinct()
      // persist the static side once — all three rounds re-join edges
      // and deg, and without it each round recomputes the
      // orders⋈lineitem distinct. Round 17: the persist moved from the
      // Tungsten RDD pin to an InMemoryRelation over a HASH(u)
      // repartition, because the RDD pin erases partitioning metadata:
      // every round re-exchanged BOTH static sides (plan before: 10
      // Exchanges, edges and deg re-shuffled 3× each). A cached plan
      // keeps its outputPartitioning, so each round's equi-join on `u`
      // reads the static sides exchange-free — one up-front shuffle of
      // the edge list replaces three (guide §2.4: operations keyed the
      // same way share one exchange). deg derives from the repartitioned
      // cache, so its aggregate is exchange-free too. Blocks are freed
      // by the caller's session-level cache release, as before.
      val edges = e0.union(e0.select($"v".as("u"), $"u".as("v")))
        .repartition(col("u"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy($"u").agg(count(lit(1)).as("outdeg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val r0 = deg.select($"u", lit(1000000L).as("r"))
      val r3 = step(edges, deg, step(edges, deg, step(edges, deg, r0)))
      r3.filter($"u" % 2 === 1)
        .select(expr("(u - 1) div 2").as("supp_key"), $"r".as("rank_m"))
        .orderBy($"rank_m".desc, $"supp_key")
        .limit(20)
    }),
    // L37: triangle counting / clustering coefficient over the part
    // co-occurrence graph (parts sharing an order — the market-basket
    // projection of the bipartite order graph; parts are chosen over
    // suppliers because the part domain grows with SF, so the
    // projection stays SPARSE: the 1000-supplier projection at sf0.1 is
    // near-complete and its ~n³/6 genuine triangles are an exhibit of
    // the graph, not the algorithm). Naive triangle
    // enumeration joins the full edge list on arbitrary endpoints and a
    // hub vertex of degree d contributes d² wedges on ONE shuffle key —
    // the same quadratic hot-key failure as shared-shingle Jaccard. The
    // standard fix (Chiba–Nishizeki; Latapy's compact-forward; Suri &
    // Vassilvitskii's MR variant) is DEGREE ORIENTATION: orient every
    // edge from its lower-(degree, id) endpoint to the higher one, which
    // makes the oriented out-degree of EVERY vertex O(√|E|), so wedge
    // generation Σ d⁺(v)² is bounded and no single join key explodes.
    // Each triangle then materializes exactly once (its two lowest-order
    // corners form the wedge apex edge pair) and is confirmed by one
    // LEFT SEMI equi-join against the oriented edge list — three
    // shuffle-partitioned hash joins, zero cartesian, AQE-splittable.
    // Per-part triangle count + local clustering coefficient in ppm
    // (2T·1e6 div d(d−1)) — all int64, bit-identical to the oracle.
    "q_graph_triangles" -> ((s, d) => {
      import s.implicits._
      val ls = Tables.lineitem(s, d)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("sk")).distinct()
      val e0 = ls.as("a").join(ls.as("b"), $"a.ok" === $"b.ok" && $"a.sk" < $"b.sk")
        .select($"a.sk".as("u"), $"b.sk".as("v")).distinct()
      triangleProfile(e0)
        .select($"node".as("part_key"), $"tri", $"degree", $"cc_ppm")
        .orderBy($"tri".desc, $"part_key")
        .limit(20)
    }),
    // L37b: APPROXIMATE global triangle count by deterministic vertex
    // coloring (COLORFUL triangle counting, Pagh & Tsourakakis 2012):
    // hash every vertex to one of m colors, keep an edge iff its
    // endpoints share a color (p = 1/m per edge), count triangles
    // EXACTLY on the monochromatic subgraph, scale by m² (a triangle
    // survives iff all THREE corners share a color: m·(1/m)³ = 1/m²).
    // This is the scale rung the exact L37 cannot offer — the wedge
    // stream is Σd⁺², the engine's single largest wire item at ×25
    // (9.3 GB), and coloring cuts it ~m² — and it beats the DOULION
    // edge-sample form below ON THIS SHAPE because the hash placement
    // is per VERTEX ROW, not per candidate pair: the color is one
    // md5 per distinct (order, part) line, the pair cut happens inside
    // the self-join condition (monochromatic pairs only ever leave the
    // join), and the m²-vs-m³ scale factor keeps 4× more sampled
    // triangles at the same edge rate (measured on the ×25 rung:
    // DOULION's per-pair md5 made its 10×→25× step 3.27; see
    // approxTriangles' scaladoc). The color is a HASH, not an RNG
    // draw: replayable across retries/partitionings/engines, which is
    // what makes an approximate operator oracle-able at all (the
    // DuckDB twin applies the identical md5-fold coloring and
    // recounts). `spark.graft.tri.samplemod` overrides m for real
    // deployments (bigger graphs afford sparser samples); the
    // committed oracle pins the default m = 4, like the ANN width's
    // floor.
    "q_graph_triangles_approx" -> ((s, d) => {
      import s.implicits._
      val m = s.conf.getOption("spark.graft.tri.samplemod")
        .flatMap(_.toLongOption).filter(_ >= 1L).getOrElse(4L)
      val ls = Tables.lineitem(s, d)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("sk")).distinct()
        // one md5 per (order, part) line — NOT per candidate pair
        .withColumn("c", graft.U.h64($"sk".cast("string")) % m)
      val es = ls.as("a").join(ls.as("b"),
          $"a.ok" === $"b.ok" && $"a.sk" < $"b.sk" && $"a.c" === $"b.c")
        .select($"a.sk".as("u"), $"b.sk".as("v")).distinct()
      colorfulTriangles(es, m)
    })
  )

  /** L37b core, colorful form: exact profile + m² scale-up over an edge
    * frame ALREADY restricted to monochromatic edges under the shared
    * vertex coloring `h64(str(v)) % m` (the caller owns the coloring so
    * it can place the hash before its pair-production join — the whole
    * point of the colorful estimator; this helper must not re-derive
    * it). m = 1 is a single color: the full graph, scale factor 1,
    * estimate ≡ exact. */
  def colorfulTriangles(es: DataFrame, m: Long): DataFrame =
    triangleSummary(es, m, m * m)

  /** L37b, DOULION edge-sample form (Tsourakakis et al. KDD'09): keep
    * an edge iff h64(u|v) ≡ 0 (mod m), scale the exact sample count by
    * m³ (each triangle survives at p³, p = 1/m). The general form for
    * an edge stream whose VERTEX construction the caller does not own
    * (a pre-built edge list, where per-vertex coloring would cost the
    * same per-row hash as edge sampling). Input must be canonically
    * oriented — each row (u, v) with u < v; duplicate rows allowed (the
    * hash is a pure function of the pair, so copies sample identically
    * and the post-filter distinct absorbs them). The sample hash runs
    * over the CANONICAL pair least|greatest (ADVICE r13): downstream
    * triangleProfile silently canonicalizes orientation, so if a caller
    * violated the u < v precondition the two orientations of one edge
    * would otherwise hash — and sample — differently, biasing the
    * estimate with no error; hashing the canonical form makes the
    * violation unable to matter. On the L37b exhibit the colorful form
    * supersedes this at scale: the ×25 rung measured the per-pair md5
    * dominating (step 3.27 vs the exact plan's 1.94) because the hash
    * runs on the full pair stream before the cut. */
  def approxTriangles(e0: DataFrame, m: Long): DataFrame = {
    val ss = e0.sparkSession
    import ss.implicits._
    val es = e0
      .filter(graft.U.h64(concat_ws("|",
        least($"u", $"v"), greatest($"u", $"v"))) % m === 0)
      .distinct()
    triangleSummary(es, m, m * m * m)
  }

  /** Shared tail of the two estimators: Σ node-tri = 3T (each triangle
    * has three corners); Σ degree = 2|E| — one aggregate over the exact
    * profile yields both, all int64; the estimate is count × scale. */
  private def triangleSummary(es: DataFrame, m: Long, scale: Long): DataFrame = {
    val ss = es.sparkSession
    import ss.implicits._
    triangleProfile(es)
      .agg(
        coalesce(expr("sum(tri) div 3"), lit(0L)).as("tri_sampled"),
        coalesce(expr("sum(degree) div 2"), lit(0L)).as("edges_sampled"))
      .select(lit(m).as("sample_mod"), $"edges_sampled", $"tri_sampled",
        ($"tri_sampled" * lit(scale)).as("est_tri"))
  }
}
