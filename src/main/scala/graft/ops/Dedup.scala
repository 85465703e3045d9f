package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** Large-scale dedup suite — the training-data-pipeline extensions
  * (SURVEY.md §0 L3; dedup need anchored at the reference's overlapping
  * 24 h windows, src/main.py:263).
  *
  * Scale design (100 TB): every variant is sketch → band/block → bucket
  * equi-join → exact verify on the (tiny) candidate set. The bucket join
  * shuffles on the band key, so work is proportional to candidate pairs,
  * not corpus²; sketch reductions (min over hashes, bit sums) are
  * partially-aggregable aggregates, so they combine map-side and the
  * shuffle carries one row per document; no driver state. All randomness
  * comes from the portable md5-based hash (U.h64), so every stage —
  * including the probabilistic LSH recall — is bit-identical to the
  * DuckDB oracle.
  */
object Dedup {

  val NumSeeds = 16  // MinHash signature length
  val NumBands = 8   // 8 bands × 2 rows
  val NumPlanes = 16 // hyperplane LSH: 4 tables × 4 bits
  val NumTables = 4

  /** Deterministic hyperplane components in [-1000, 1000], baked from the
    * shared hash into both the Spark plan and the oracle SQL. */
  lazy val planes: Array[Array[Long]] =
    Array.tabulate(NumPlanes, 64)((p, i) => U.h64Local(s"$p:$i") % 2001L - 1000L)

  /** MinHash linear-permutation constants: m_j = (a_j·h + b_j) mod p with
    * h < p, a_j ∈ [1, p), b_j ∈ [0, p) — products stay < 1e18 (no int64
    * overflow). One md5 per element, 16 arithmetic permutations — 16×
    * less hashing than seeded md5s, same MinHash guarantees. Mirrored in
    * the oracle. */
  val PermMod = 1000000007L
  lazy val permA: Array[Long] =
    Array.tabulate(NumSeeds)(j => U.h64Local(s"a$j") % (PermMod - 1) + 1)
  lazy val permB: Array[Long] =
    Array.tabulate(NumSeeds)(j => U.h64Local(s"b$j") % PermMod)

  // CASE guard: sequence(3, n) steps DOWNWARD when n < 3, so element_at
  // would hit index 0 and throw on a 2-token doc; empty array == the
  // oracle's empty list_slice for the same doc
  private[graft] def withShingles(df: DataFrame) =
    df.withColumn("toks", split(col("text"), " "))
      .withColumn("shs", expr(
        """CASE WHEN size(toks) >= 3 THEN
             array_distinct(transform(sequence(3, size(toks)),
               i -> concat(element_at(toks, i-2), ' ', element_at(toks, i-1), ' ', element_at(toks, i))))
           ELSE array() END"""))
      .select(col("doc_id"), col("shs"))

  /** (id, element) rows → (id, band) rows: 16 permuted minhashes reduced
    * with map-side partial min, banded `rows`-per-band. Banding fires at
    * ≈ jac^rows per band: rows=2 targets low thresholds (word shingles,
    * jac≥0.2); rows=4 targets near-identical sets whose universe overlaps
    * heavily anyway (char grams) — fewer random collisions, same recall
    * on ~1.0-sim pairs. */
  private[graft] def minhashBands(e: DataFrame, id: String, elem: String,
                                rows: Int = 2): DataFrame = {
    val h = (U.h64(col(elem)) % PermMod).as("h")
    val withH = e.select(col(id), h)
    val mins = withH.groupBy(col(id))
      .agg(
        min((lit(permA(0)) * col("h") + permB(0)) % PermMod).as("m0"),
        (1 until NumSeeds).map(j =>
          min((lit(permA(j)) * col("h") + permB(j)) % PermMod).as(s"m$j")): _*)
    val nb = NumSeeds / rows
    val bandCols = array((0 until nb).map(b =>
      concat_ws(":", lit(b) +: (0 until rows).map(r => col(s"m${rows * b + r}")): _*)): _*)
    mins.select(col(id), explode(bandCols).as("band"))
  }

  /** Generalized hyperplane tables (round 12): the bucket bit-width is
    * THE ANN scale knob — candidates/query ≈ tables · |masks| · N/2^bits,
    * so bits must grow ~log₂N to hold candidate volume as the corpus
    * grows (the ×25 probe rung measured the fixed 4-bit default
    * degenerating to near-all-pairs: 63 GB of rerank spill). Same
    * "$p:$i" seed scheme as `planes`, so planesFor(4, 4) IS the
    * oracle-shared default. */
  def planesFor(tables: Int, bits: Int): Array[Array[Long]] =
    Array.tabulate(tables * bits, 64)((p, i) => U.h64Local(s"$p:$i") % 2001L - 1000L)

  /** All hyperplane sign bits in ONE nested-literal-array expression
    * (a single codegen'd projection — 16 fold-chained projections were a
    * Janino compile hotspot). */
  private def bitsColFor(pl: Array[Array[Long]]): Column = {
    val planesCol = array(pl.toIndexedSeq.map(p => array(p.toIndexedSeq.map(lit): _*)): _*)
    transform(planesCol, p =>
      when(graft.functions.DotL.dot(col("v"), p) > 0, 1L).otherwise(0L))
  }

  /** Table t's bucket code from the `bits` column. */
  private def codeColFor(t: Int, bits: Int): Column =
    (0 until bits).map(k =>
      element_at(col("bits"), t * bits + k + 1) * lit(1L << k)).reduce(_ + _)

  /** vec rows (vec_id, v) → (vec_id, bkt) rows at an explicit (tables,
    * bits) config. */
  def lshBucketsN(scaled: DataFrame, tables: Int, bits: Int): DataFrame =
    scaled.withColumn("bits", bitsColFor(planesFor(tables, bits)))
      .select(col("vec_id"), explode(array(
        (0 until tables).map(t => concat_ws(":", lit(t), codeColFor(t, bits))): _*)).as("bkt"))

  /** vec rows (vec_id, v) → (vec_id, bkt) rows: 4 bucket codes of 4 bits
    * (the oracle-shared default config). */
  def lshBuckets(scaled: DataFrame): DataFrame = lshBucketsN(scaled, NumTables, 4)

  /** Multiprobe masks: Hamming radius 1 (own bucket + 4 one-bit flips)
    * and radius 2 (+ 6 two-bit flips). Probing neighbors of the QUERY's
    * code trades a constant probe fan-out for recall — the standard
    * multiprobe-LSH move (fewer tables for the same recall). */
  val ProbeMasks1: Seq[Long] = 0L +: (0 until 4).map(k => 1L << k)
  val ProbeMasks2: Seq[Long] = ProbeMasks1 ++
    (for { a <- 0 until 4; b <- a + 1 until 4 } yield (1L << a) | (1L << b))

  /** Radius-1 multiprobe masks for an explicit bit width. */
  def probeMasks1For(bits: Int): Seq[Long] = 0L +: (0 until bits).map(k => 1L << k)

  /** Query-side multiprobe at an explicit (tables, bits) config. */
  def lshProbesN(scaled: DataFrame, tables: Int, bits: Int, masks: Seq[Long]): DataFrame =
    scaled.withColumn("bits", bitsColFor(planesFor(tables, bits)))
      .select(col("vec_id"), explode(array(
        (for { t <- 0 until tables; m <- masks }
          yield concat_ws(":", lit(t), codeColFor(t, bits).bitwiseXOR(lit(m)))): _*)).as("bkt"))

  /** Query-side multiprobe: (vec_id, bkt) rows covering every bucket
    * within the mask set of the vector's own code, per table. Joined
    * against `lshBuckets` of the corpus this is a plain bucket equi-join
    * — candidates/query ≈ tables · |masks| · N/2^bits, tuned by the bit
    * width (grow bits ~ log2(N/bucket) at scale), never an all-pairs
    * nested loop. Oracle-shared default config. */
  def lshProbes(scaled: DataFrame, masks: Seq[Long]): DataFrame =
    lshProbesN(scaled, NumTables, 4, masks)

  /** Embeddings with int64-scaled vector + squared norm. */
  private def scaledVecs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)
      .withColumn("v", expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))"))
      .withColumn("norm2", graft.functions.DotL.dot(col("v"), col("v")))

  /** Exact rounded cosine between joined scaled vectors va/vb. */
  private def cosine: Column =
    round(graft.functions.DotL.dot(col("va"), col("vb")).cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)

  /** MinHash-recalled, exact-Jaccard-verified near-dup pairs (d1 < d2,
    * jac ≥ 0.2) — the edge set shared by q_dedup_minhash (reported as-is)
    * and q_dedup_cluster (grouped into duplicate clusters). */
  private def minhashPairs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    // The shingle-set DF is reused by the band build AND both sides of
    // the verify join: without persistence the corpus is re-shingled 3×.
    // DISK_ONLY is the deliberate 100 TB choice — a corpus-sized
    // materialization must not compete with shuffle/agg memory (it
    // would evict the working set); one sequential disk re-read per
    // reuse is the cheaper side of that trade. (Recompute-instead is
    // also defensible when storage is tight: drop the persist and pay
    // 2 extra shingling passes — CPU, not memory.)
    val sh = withShingles(Tables.documents(s, d))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val bands = minhashBands(sh.select($"doc_id", explode($"shs").as("sh")), "doc_id", "sh")
    val cand = bands.as("a")
      .join(bands.as("b"), $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    cand
      .join(sh.select($"doc_id".as("d1"), $"shs".as("sa")), "d1")
      .join(sh.select($"doc_id".as("d2"), $"shs".as("sb")), "d2")
      .withColumn("ni", size(array_intersect($"sa", $"sb")).cast("long"))
      .withColumn("jac", round($"ni".cast("double") / (size($"sa") + size($"sb") - $"ni"), 6))
      .filter($"jac" >= 0.2)
      .select($"d1", $"d2", $"jac")
  }

  /** Connected components over an undirected edge list (u, v) by
    * iterated hash-to-min label propagation: every vertex starts labeled
    * with itself; each round every vertex adopts the minimum label among
    * itself and its neighbors; fixpoint = each vertex carries its
    * component's minimum id.
    *
    * Scale shape (100 TB): each round is one shuffle-on-vertex-id
    * (join + min-agg — both partial-aggregable), rounds ∝ graph diameter
    * — and near-dup graphs are unions of small dense clusters, so the
    * diameter is tiny regardless of corpus size (3–4 rounds in practice;
    * pathological chain graphs would want the large-star/small-star
    * variant that pointer-doubles in O(log n) rounds). Per-round results
    * are persisted and materialized by the convergence count, and
    * localCheckpoint truncates the lineage so the plan doesn't grow
    * exponentially with rounds (a real cluster job would use a reliable
    * checkpoint dir instead of executor-local blocks). The convergence
    * aggregate is the only driver-side value — labels never leave
    * executors.
    *
    * Diameter insurance (`maxRounds`): hash-to-min's round count is the
    * graph diameter, so a pathological chain-shaped graph would run one
    * shuffle per hop. After `maxRounds` un-converged rounds the remaining
    * graph is CONTRACTED to its current labels (edge (u,v) → (lbl(u),
    * lbl(v)), self-loops dropped — converged clusters vanish here) and
    * handed to `connectedComponentsStar`, whose rounds grow with log of
    * component size; final labels compose through the contraction. Dense
    * near-dup graphs never hit the cap (1–3 rounds); the cap turns the
    * worst case from O(diameter) into O(cap + log n) shuffles. */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 8): DataFrame = {
    val ss = edges.sparkSession
    import ss.implicits._
    // canonical pre-shrink: orient hi → lo, drop self-loops and duplicate
    // pairs BEFORE symmetrizing — callers with raw pair lists (both
    // orientations, repeats) would otherwise carry the redundancy through
    // every propagation round's join
    val canon = edges.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      .filter($"u" =!= $"v").distinct()
    // HASH(u)-repartition before the persist (round 17): the cached
    // plan keeps its outputPartitioning, so every propagation round's
    // `sym ⋈ labels on u === vid` reads the static side exchange-free —
    // one up-front shuffle replaces one per round (guide §2.4), and the
    // seed groupBy(vid) below rides the same partitioning
    val sym = canon.select($"u", $"v")
      .union(canon.select($"v".as("u"), $"u".as("v")))
      .repartition(col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize-and-truncate per round: pin the round's labels as a
    // persisted row RDD and rebuild the DataFrame over it — the same
    // lineage truncation localCheckpoint gives, but with an explicit
    // handle so a round's blocks are RELEASED once the next round lands.
    // (localCheckpoint has no public unpersist; its leaked per-round
    // blocks were part of the r4 bench-interference cluster.) The pin
    // stays in Tungsten binary format (GraftShim.pinInternal) — the
    // df.rdd route decoded every row to an external Row and re-encoded
    // it, per round, which was the dominant CPU+GC churn of the
    // fixpoint and a bench-variance source (VERDICT r6 #6).
    def pin(df: DataFrame) = GraftShim.pinInternal(
      df, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed with one propagation round folded into initialization: the
    // grouped min over {self} ∪ neighbors IS round 1, for the price of a
    // single partial-aggregable group-by (no join), so the loop below
    // starts from diameter-1 state. Self-labels come from the RAW edge
    // list, not the canonicalized one: a vertex whose only edge is a
    // self-loop (u,u) has no surviving canon edge but is still a vertex
    // of the graph and must appear in the output labeled with itself.
    var (labels, pinned) = pin(
      sym.select($"u".as("vid"), $"v".as("lbl"))
        .union(edges.select($"u".as("vid"), $"u".as("lbl")))
        .union(edges.select($"v".as("vid"), $"v".as("lbl")))
        .groupBy($"vid").agg(min($"lbl").as("lbl")))
    var changed = 1L
    var rounds = 1 // the folded seed round
    while (changed > 0 && rounds < maxRounds) {
      rounds += 1
      val prop = sym.join(labels, $"u" === $"vid")
        .groupBy($"v").agg(min($"lbl").as("nbr"))
        .select($"v".as("pid"), $"nbr")
      val (next, nextPin) = pin(
        labels.join(prop, $"vid" === $"pid", "left")
          .select($"vid", least($"lbl", coalesce($"nbr", $"lbl")).as("lbl"),
            ($"lbl" > coalesce($"nbr", $"lbl")).as("moved")))
      changed = next.filter($"moved").count() // materializes nextPin
      pinned.unpersist(blocking = false)
      labels = next.select($"vid", $"lbl")
      pinned = nextPin
    }
    if (changed > 0) {
      // diameter exceeded the cap: contract edges to current labels and
      // finish on the star engine (log-round). Vertices whose component
      // already converged produce only self-loops here and drop out.
      val lu = labels.select($"vid".as("cu"), $"lbl".as("clu"))
      val lv = labels.select($"vid".as("cv"), $"lbl".as("clv"))
      val contracted = sym.join(lu, $"u" === $"cu").join(lv, $"v" === $"cv")
        .select($"clu".as("u"), $"clv".as("v"))
        .filter($"u" =!= $"v")
      val (starLabels, _) = connectedComponentsStar(contracted)
      val composed = labels
        .join(starLabels.select($"vid".as("slbl"), $"lbl".as("root")),
          $"lbl" === $"slbl", "left")
        .select($"vid", coalesce($"root", $"lbl").as("lbl"))
      sym.unpersist()
      return composed
    }
    sym.unpersist()
    // the final round's pin stays live inside the returned plan; the
    // caller's action reads it and session-level cache release (Bench
    // does this between queries) frees it
    labels
  }

  /** Connected components via alternating large-star/small-star rounds
    * (the Kiveris et al. "Connected Components in MapReduce and Beyond"
    * scheme) — the pointer-doubling variant whose round count grows with
    * log of component size, NOT graph diameter. `connectedComponents`
    * above (hash-to-min) is the default: near-dup graphs are unions of
    * small dense clusters where it converges in 1–3 rounds with one
    * shuffle each. This is the hardening path for chain-shaped graphs
    * (diameter ≈ n), where rounds-∝-diameter would be catastrophic.
    *
    * Each round: large-star hangs every strictly-larger neighbor of u
    * onto min(Γ(u) ∪ {u}); small-star re-hangs the smaller neighbors.
    * The edge set monotonically flattens into stars — (vertex,
    * component-min) pairs. Both halves are a groupBy-min plus an
    * equi-join (partial-aggregable, shuffle on vertex id); per-round
    * results are pinned to explicitly-released persisted RDDs like the
    * hash-to-min loop, and convergence is detected by a (count, hash)
    * signature — one tiny driver row per round, labels never collect.
    *
    * Returns (labels (vid, lbl), rounds). Semantics identical to
    * `connectedComponents` — PropertySuite cross-checks both against a
    * reference union-find. */
  def connectedComponentsStar(edges: DataFrame, maxRounds: Int = 64): (DataFrame, Int) = {
    val ss = edges.sparkSession
    import ss.implicits._
    def pin(df: DataFrame) = GraftShim.pinInternal(
      df, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = edges.select($"u").union(edges.select($"v"))
      .distinct().select($"u".as("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // canonical working set: undirected edges oriented (hi → lo), no
    // self-loops — both star halves preserve this orientation, so the
    // convergence signature is over a canonical set
    var (cur, pinned) = pin(
      edges.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .filter($"u" =!= $"v").distinct())
    def signature(df: DataFrame): (Long, Long) = {
      // XOR fold, not sum: order-independent, overflow-free under ANSI,
      // and safe on a DISTINCT edge set (no pair cancels itself)
      val row = df.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).collect()(0)
      (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
    }
    var sig = signature(cur)
    var rounds = 0
    var done = sig._1 == 0L // an empty edge set is already converged
    while (!done) {
      rounds += 1
      require(rounds <= maxRounds, s"star CC did not converge in $maxRounds rounds")
      // large-star over symmetric neighborhoods
      val nbr = cur.union(cur.select($"v".as("u"), $"u".as("v")))
      val minsL = nbr.groupBy($"u").agg(min($"v").as("mv"))
        .select($"u".as("cu"), least($"mv", $"u").as("m"))
      val large = nbr.join(minsL, $"u" === $"cu")
        .where($"v" > $"u")
        .select($"v".as("u"), $"m".as("v")) // m ≤ u < v keeps hi → lo
        .filter($"u" =!= $"v").distinct()
      // small-star on the (hi → lo) set: per hi endpoint, re-hang its
      // smaller neighbors (and itself) onto their min
      val minsS = large.groupBy($"u").agg(min($"v").as("m"))
        .select($"u".as("cu"), $"m")
      val small = large.join(minsS, $"u" === $"cu")
        .select($"v".as("u"), $"m".as("v")) // m = min(Γ⁻) ≤ v keeps hi → lo
        .union(minsS.select($"cu".as("u"), $"m".as("v")))
        .filter($"u" =!= $"v").distinct()
      val (next, nextPin) = pin(small)
      val nextSig = signature(next) // materializes nextPin
      pinned.unpersist(blocking = false)
      cur = next
      pinned = nextPin
      done = nextSig == sig
      sig = nextSig
    }
    // stars: every non-root vertex appears exactly once on the hi side
    val labels = verts.join(cur, $"vid" === $"u", "left")
      .select($"vid", coalesce($"v", $"vid").as("lbl"))
    (labels, rounds)
  }

  val qs: Map[String, Q] = Map(
    // MinHash + LSH banding over word-3-gram shingles; exact-Jaccard
    // verify of candidates. Output == the exact q_sim_jaccard pairs that
    // LSH recalls — deterministic because the hash (and therefore the
    // banding) is shared with the oracle.
    "q_dedup_minhash" -> ((s, d) => minhashPairs(s, d).orderBy("d1", "d2")),
    // L15b: FUZZY benchmark decontamination — the near-dup form of L15
    // (q_decontaminate's exact shared-5-gram counting misses light
    // paraphrases; production pipelines additionally MinHash the corpus
    // against the benchmark set). Same machinery as the dedup family:
    // shared-randomness MinHash bands on BOTH sides, a band-equality
    // bucket join restricted to train×eval (never train×train — the
    // decontamination question is only "does a training doc look like
    // an eval doc"), then the exact-Jaccard verify on the recalled
    // candidates. Deterministic recall (banding is a pure function of
    // the shared h64), so the DuckDB oracle reproduces the candidate
    // set bit-for-bit. Scale shape: the eval side of a real deployment
    // is benchmark-sized (thousands of docs) — its band table is a
    // broadcast — while the train side streams map-side into the
    // bucket join; flagged docs per train doc, never all-pairs.
    "q_decontaminate_fuzzy" -> ((s, d) => {
      import s.implicits._
      val sh = withShingles(Tables.documents(s, d))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val bands = minhashBands(sh.select($"doc_id", explode($"shs").as("sh")), "doc_id", "sh")
      val evalB = bands.filter($"doc_id" % 10 === 7)
        .select($"band", $"doc_id".as("eval_id")).distinct()
      val cand = bands.filter($"doc_id" % 10 =!= 7)
        .join(broadcast(evalB), "band")
        .select($"doc_id", $"eval_id").distinct()
      cand
        .join(sh.select($"doc_id", $"shs".as("sa")), "doc_id")
        .join(sh.select($"doc_id".as("eval_id"), $"shs".as("sb")), "eval_id")
        .withColumn("ni", size(array_intersect($"sa", $"sb")).cast("long"))
        .withColumn("jac", round($"ni".cast("double") / (size($"sa") + size($"sb") - $"ni"), 6))
        .filter($"jac" >= 0.2)
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_eval_matches"), max($"jac").as("max_jac"))
        .orderBy("doc_id")
    }),
    // Duplicate-cluster assignment — the step after pair discovery in
    // every production dedup pipeline: near-dup PAIRS become duplicate
    // GROUPS (transitively: A~B, B~C ⇒ {A,B,C}) so one canonical doc per
    // group survives. Connected components over the minhash pair graph
    // via hash-to-min propagation (see connectedComponents); cluster_id
    // is the component-minimum doc_id (= the canonical survivor), and
    // n_members sizes each group. Oracle: DuckDB recursive CTE computing
    // min-reachable-vertex over the same edges.
    "q_dedup_cluster" -> ((s, d) => {
      import s.implicits._
      val edges = minhashPairs(s, d).select($"d1".as("u"), $"d2".as("v"))
      val comp = connectedComponents(edges)
        .select($"vid".as("doc_id"), $"lbl".as("cluster_id"))
      val sizes = comp.groupBy($"cluster_id").agg(count(lit(1)).as("n_members"))
      comp.join(sizes, "cluster_id")
        .select($"doc_id", $"cluster_id", $"n_members")
        .orderBy("doc_id")
    }),
    // The dedup END PRODUCT: the curated corpus after near-dup removal —
    // every singleton doc plus exactly one canonical survivor (the
    // component-min doc_id) per duplicate cluster. Left-anti join of the
    // corpus against the non-canonical cluster members. No broadcast
    // hint: real web crawls run 30–50 % near-dup losers, where a forced
    // broadcast OOMs the driver/executors — AQE sees the loser list's
    // true size at runtime (it is materialized by the CC fixpoint) and
    // picks broadcast-anti when it fits, shuffle-anti when it doesn't.
    "q_dedup_survivors" -> ((s, d) => {
      import s.implicits._
      val edges = minhashPairs(s, d).select($"d1".as("u"), $"d2".as("v"))
      val losers = connectedComponents(edges)
        .filter($"vid" =!= $"lbl") // non-canonical members drop out
        .select($"vid".as("loser_id"))
      Tables.documents(s, d)
        .join(losers, $"doc_id" === $"loser_id", "left_anti")
        .select($"doc_id", $"lang", $"source")
        .orderBy("doc_id")
    }),
    // L32: exact duplicated-SPAN profiling — the fixed-width relational
    // form of suffix-array substring dedup (Lee et al. 2022,
    // "Deduplicating Training Data Makes Language Models Better"): every
    // rolling 8-token window is a span, and an occurrence is duplicated
    // when the identical token sequence appears in ≥1 OTHER document.
    // One generator pass (corpus tokens × 1 span each), then a
    // partial-aggregable distinct-doc count keyed on the 64-bit span
    // hash — the shuffle carries hashed longs that combine map-side, so
    // a boilerplate span in d docs costs d rows on one key, never d²
    // (profiling, not pairing). The per-doc duplicated-span fraction is
    // the threshold a curation pipeline cuts on; same h64 in the oracle
    // so even hash collisions agree.
    "q_dedup_spans" -> ((s, d) => {
      import s.implicits._
      val spans = Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        .select($"doc_id", explode(expr(
          """CASE WHEN size(toks) >= 8 THEN transform(sequence(8, size(toks)),
               i -> concat_ws(' ', slice(toks, i-7, 8)))
             ELSE array() END""")).as("span"))
        .select($"doc_id", graft.U.h64($"span").as("h"))
      val dup = spans.groupBy($"h")
        .agg(countDistinct($"doc_id").as("nd"))
        .filter($"nd" >= 2)
        .select($"h", lit(1L).as("isdup"))
      spans.join(dup, Seq("h"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_spans"),
             sum(coalesce($"isdup", lit(0L))).as("n_dup_spans"))
        .filter($"n_dup_spans" > 0)
        .select($"doc_id", $"n_spans", $"n_dup_spans",
          round($"n_dup_spans".cast("double") / $"n_spans".cast("double"), 6).as("dup_frac"))
        .orderBy("doc_id")
    }),
    // Line-level exact dedup (the C4 preprocessing rule): the corpus is
    // chopped into fixed 3-token "lines"; each distinct line survives
    // only at its globally-first occurrence (min doc_id, then position),
    // and every doc is rebuilt from its surviving lines — boilerplate
    // that recurs across pages vanishes everywhere but once. The
    // first-occurrence keeper is a PARTIAL-AGGREGABLE min(struct) per
    // line joined back — NOT a row_number window: a boilerplate line in
    // 40% of a crawl would make the window's per-line partition one
    // monster sort that no optimizer can split, while the min-aggregate
    // combines map-side and the equi-join's hot key is AQE-skew-
    // splittable. Rebuild order is restored by sorting the collected
    // (idx, line) structs, never by collect_list arrival order.
    "q_dedup_lines" -> ((s, d) => {
      import s.implicits._
      val lines = Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        .select($"doc_id", posexplode(expr(
          "transform(sequence(1, size(toks), 3), i -> concat_ws(' ', slice(toks, i, 3)))"))
          .as(Seq("idx", "line")))
      val keeper = lines.groupBy($"line")
        .agg(min(struct($"doc_id", $"idx")).as("k"))
      lines.join(keeper, "line")
        .withColumn("first", $"doc_id" === $"k.doc_id" && $"idx" === $"k.idx")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when($"first", 1L).otherwise(0L)).as("n_kept"),
          array_join(expr(
            "transform(array_sort(collect_list(CASE WHEN first THEN struct(idx, line) END)), x -> x.line)"),
            " ").as("kept_text"))
        .orderBy("doc_id")
    }),
    // SimHash: 32-bit signature from token-frequency-weighted hash bits;
    // 4-byte blocking gives EXACT recall for hamming distance ≤ 3
    // (pigeonhole: ≤3 differing bits leave ≥1 of 4 bytes identical).
    "q_dedup_simhash" -> ((s, d) => {
      import s.implicits._
      // frequency weighting without a tf table: Σ_occurrences ±1 ==
      // Σ_distinct-terms ±f (the sign is a function of the term), so the
      // bit sums aggregate the raw token stream directly — ONE
      // partial-aggregable shuffle instead of a (doc, term) group-by
      // followed by a doc group-by
      val toks = Tables.documents(s, d)
        .select($"doc_id", explode(split($"text", " ")).as("t"))
        .withColumn("h", U.h64($"t"))
      val bitSums = (0 until 32).map(k =>
        sum(when(shiftright($"h", k).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$k"))
      val sums = toks.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      val code = (0 until 32).map(k =>
        when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
      val codes = sums.select($"doc_id", code.as("simhash"))
      val blkCols = array((0 until 4).map(b =>
        concat_ws(":", lit(b), shiftright($"simhash", b * 8).bitwiseAND(255))): _*)
      val blocks = codes.select($"doc_id", $"simhash", explode(blkCols).as("blk"))
      blocks.as("a")
        .join(blocks.as("b"), $"a.blk" === $"b.blk" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"a.simhash".as("h1"),
                $"b.doc_id".as("d2"), $"b.simhash".as("h2"))
        .distinct()
        .withColumn("ham", expr("bit_count(h1 ^ h2)").cast("long"))
        .filter($"ham" <= 3)
        .select($"d1", $"d2", $"ham")
        .orderBy("d1", "d2")
    }),
    // Character-5-gram Jaccard near-dup, incremental shape: new-batch
    // docs (doc_id % 25 = 0) against the corpus. Candidates via MinHash
    // banding on the gram sets (char-grams in this corpus are individually
    // common, so df-based blocking degenerates; banded signatures keep
    // buckets small regardless of gram frequency), exact Jaccard ≥ 0.3 on
    // the full gram sets.
    "q_dedup_ngram" -> ((s, d) => {
      import s.implicits._
      val grams = Tables.documents(s, d)
        // guard: length < 5 would make sequence(1, length-4) descend
        // through 0 and emit spurious grams (oracle's range() is empty)
        .withColumn("gs", expr(
          """CASE WHEN length(text) >= 5 THEN
               array_distinct(transform(sequence(1, length(text)-4), i -> substring(text, i, 5)))
             ELSE array() END"""))
        .select($"doc_id", $"gs")
        // reused by band build + verify join; DISK_ONLY for the same
        // corpus-sized-materialization reasoning as q_dedup_minhash above
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val bands = minhashBands(grams.select($"doc_id", explode($"gs").as("g")),
        "doc_id", "g", rows = 4)
      val cand = bands.as("a")
        .join(bands.as("b"), $"a.band" === $"b.band" && $"a.doc_id" =!= $"b.doc_id")
        .filter($"a.doc_id" % 25 === 0)
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
      cand
        .join(grams.select($"doc_id".as("d1"), $"gs".as("ga")), "d1")
        .join(grams.select($"doc_id".as("d2"), $"gs".as("gb")), "d2")
        .withColumn("ni", size(array_intersect($"ga", $"gb")).cast("long"))
        .withColumn("jac", round($"ni".cast("double") / (size($"ga") + size($"gb") - $"ni"), 6))
        .filter($"jac" >= 0.3)
        .select($"d1", $"d2", $"jac")
        .orderBy("d1", "d2")
    }),
    // Embedding near-dup: 4-table × 4-bit random-hyperplane LSH blocking,
    // exact int64-scaled cosine ≥ 0.4 verify on bucket collisions.
    "q_dedup_embed" -> ((s, d) => {
      import s.implicits._
      val scaled = scaledVecs(s, d)
      val buckets = lshBuckets(scaled)
      val cand = buckets.as("a")
        .join(buckets.as("b"), $"a.bkt" === $"b.bkt" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("d1"), $"b.vec_id".as("d2"))
        .distinct()
      cand
        .join(scaled.select($"vec_id".as("d1"), $"v".as("va"), $"norm2".as("na")), "d1")
        .join(scaled.select($"vec_id".as("d2"), $"v".as("vb"), $"norm2".as("nb")), "d2")
        .withColumn("sim", cosine)
        .filter($"sim" >= 0.4)
        .select($"d1", $"d2", $"sim")
        .orderBy("d1", "d2")
    })
  )
}
