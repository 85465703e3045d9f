package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search + vector aggregation over the
  * embeddings table — SURVEY.md §2.J7/K2.
  *
  * Scale path: `q_sim_cosine` (ops.TextOps) is the brute-force top-k
  * baseline (query-set × corpus, O(Q·N)); `q_ann_lsh` here is the
  * sub-linear variant — random-hyperplane buckets shrink each query's
  * candidate set to its bucket collisions before the exact rerank, the
  * standard recipe when N is 10^9+ (bucket join shuffles on the code,
  * no pairwise blowup). Hyperplanes come from the shared deterministic
  * hash (ops.Dedup.planes), so bucketing — and therefore recall —
  * matches the DuckDB oracle exactly.
  */
object Similarity {

  /** K2 UDAF: typed Aggregator summing int64-scaled embedding vectors —
    * a mergeable vector accumulator (the 100 TB-safe centroid: partial
    * buffers merge associatively across partitions).
    *
    * Exactness envelope: components are 1e7-scaled (|c| ≲ 1e7), so the
    * int64 component sums are exact below ~9·10^11 vectors PER GROUP —
    * two orders past a 100 TB corpus under any realistic label
    * cardinality (the same wrap bound that forced q_agg_stats' moments
    * to Decimal(38,0) bites there at ~1e9 rows/group because its terms
    * are 1e10). Past the envelope, widen the buffer to BigDecimal like
    * the moment sums. Downstream floor(sum/n) quantizers stay
    * cross-engine-identical at ANY magnitude: both engines round the
    * sum to the same IEEE double before the floor (DuckDB's HUGEINT and
    * the JVM's long cast to double identically below 2^63). */
  object CentroidAgg extends Aggregator[Array[Long], (Long, Array[Long]), (Long, Array[Long])] {
    def zero: (Long, Array[Long]) = (0L, Array.fill(64)(0L))
    def reduce(b: (Long, Array[Long]), v: Array[Long]): (Long, Array[Long]) = {
      var i = 0; while (i < v.length) { b._2(i) += v(i); i += 1 }
      (b._1 + 1, b._2)
    }
    def merge(a: (Long, Array[Long]), b: (Long, Array[Long])): (Long, Array[Long]) = {
      var i = 0; while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
      (a._1 + b._1, a._2)
    }
    def finish(r: (Long, Array[Long])): (Long, Array[Long]) = r
    // ExpressionEncoder (not java/kryo serialization) keeps the buffer in
    // Tungsten format — partial aggregation stays columnar and mergeable.
    def bufferEncoder: Encoder[(Long, Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Long])]()
    def outputEncoder: Encoder[(Long, Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Long])]()
  }

  /** Embedding components int64-scaled (floor(x·1e7)) + cached norm². */
  private[graft] def scaledVectors(emb: org.apache.spark.sql.DataFrame) = {
    import emb.sparkSession.implicits._
    emb.select($"vec_id",
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))").as("v"))
      .withColumn("n2", graft.functions.DotL.dot($"v", $"v"))
  }

  /** Seeded nearest-centroid assignment: broadcast the k seed rows (the k
    * lowest vec_ids — deterministic, oracle-shareable) onto the corpus,
    * argmax cosine with a total tie-break. One map-side broadcast NLJ of
    * N×k rows; callers pick k ∝ corpus size so downstream within-cluster
    * work stays bounded (SemDeDup's operating regime: cluster size
    * ~constant as N grows). Returns (vec_id, cl, v, n2). */
  private[graft] def seedAssign(m: org.apache.spark.sql.DataFrame, k: Int) = {
    import m.sparkSession.implicits._
    val seeds = m.filter($"vec_id" < k)
      .select($"vec_id".as("sid"), $"v".as("sv"), $"n2".as("sn2"))
    val w1 = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"sid")
    m.join(broadcast(seeds))
      .withColumn("sim", graft.functions.DotL.dot($"v", $"sv").cast("double") /
        (sqrt($"n2".cast("double")) * sqrt($"sn2".cast("double"))))
      .withColumn("rk", row_number().over(w1)).filter($"rk" === 1)
      .select($"vec_id", $"sid".as("cl"), $"v", $"n2")
  }

  /** Within-cluster exact-cosine pair sweep (SemDeDup core): each
    * cluster's pair block is an independent equi-join partition on the
    * cluster key — Σ|cluster|² work, AQE-skew-splittable. */
  private[graft] def semDedupPairs(asg: org.apache.spark.sql.DataFrame, tau: Double) = {
    import asg.sparkSession.implicits._
    val a = asg.select($"cl", $"vec_id".as("ia"), $"v".as("va"), $"n2".as("na"))
    val b = asg.select($"cl", $"vec_id".as("ib"), $"v".as("vb"), $"n2".as("nb"))
    a.join(b, Seq("cl")).filter($"ia" < $"ib")
      .withColumn("ps", graft.functions.DotL.dot($"va", $"vb").cast("double") /
        (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))))
      .filter($"ps" >= tau)
      .select($"cl", $"ia", $"ib")
  }

  /** Per-cluster SemDeDup profile: members, keep-lowest-id drops, kept. */
  private[graft] def semDedupProfile(asg: org.apache.spark.sql.DataFrame, tau: Double) = {
    import asg.sparkSession.implicits._
    val dropped = semDedupPairs(asg, tau)
      .select($"cl", $"ib").distinct()
      .groupBy($"cl").agg(count(lit(1)).as("n_dropped"))
    asg.groupBy($"cl").agg(count(lit(1)).as("n_members"))
      .join(dropped, Seq("cl"), "left")
      .select($"cl".as("cluster"), $"n_members",
        coalesce($"n_dropped", lit(0L)).as("n_dropped"),
        ($"n_members" - coalesce($"n_dropped", lit(0L))).as("n_kept"))
      .orderBy("cluster")
  }

  val qs: Map[String, Q] = Map(
    // ANN via hyperplane-LSH buckets + exact rerank: top-3 over the
    // radius-1 multiprobe candidate set per query vector (probe the
    // query's bucket + its 4 one-bit neighbors in each of the 4 tables —
    // recall@3 ≥ 0.85 on this corpus, asserted vs brute force in
    // OperatorSuite). Query filter applied BEFORE the bucket join so the
    // probe side carries only queries. Same queries as the brute-force
    // baseline (vec_id % 50 = 0) so recall is directly comparable.
    "q_ann_lsh" -> ((s, d) => {
      import s.implicits._
      val scaled = Tables.embeddings(s, d)
        .withColumn("v", expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))"))
        .withColumn("norm2", graft.functions.DotL.dot($"v", $"v"))
      val cand = Dedup.lshProbes(scaled.filter($"vec_id" % 50 === 0), Dedup.ProbeMasks1)
        .withColumnRenamed("vec_id", "q_id")
        .join(Dedup.lshBuckets(scaled).withColumnRenamed("vec_id", "c_id"), "bkt")
        .filter($"q_id" =!= $"c_id")
        .select($"q_id", $"c_id")
        .distinct()
      val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id")
      cand
        .join(scaled.select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn")), "q_id")
        .join(scaled.select($"vec_id".as("c_id"), $"v".as("cv"), $"norm2".as("cn")), "c_id")
        .withColumn("dot", graft.functions.DotL.dot($"qv", $"cv"))
        .withColumn("sim", round($"dot".cast("double") /
          (sqrt($"qn".cast("double")) * sqrt($"cn".cast("double"))), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 3)
        .select($"q_id", $"rk", $"c_id", $"sim")
        .orderBy("q_id", "rk")
    }),
    // IVF ANN: coarse cells = labels, quantizer = per-cell centroid
    // (int64-floored means, so cell assignment is exact cross-engine),
    // nprobe=2 nearest cells per query, exact rerank inside the probed
    // cells. The 10-cell centroid table is broadcast; members shuffle on
    // the cell id — at 10^9 vectors this is the classic IVF cost shape:
    // Q·cells coarse dots + Q·(N/cells·nprobe) exact dots.
    "q_ann_ivf" -> ((s, d) => {
      import s.implicits._
      val scaled = Tables.embeddings(s, d)
        .select($"vec_id", $"label".cast("long").as("label"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))").as("v"))
        .withColumn("norm2", graft.functions.DotL.dot($"v", $"v"))
      val cells = scaled.select($"label", $"v").as[(Long, Array[Long])]
        .groupByKey(_._1).mapValues(_._2)
        .agg(CentroidAgg.toColumn)
        .map { case (label, (n, sums)) =>
          (label, sums.map(s => math.floor(s.toDouble / n).toLong)) }
        .toDF("c_label", "cvec")
        .withColumn("cn2", graft.functions.DotL.dot($"cvec", $"cvec"))
      val q = scaled.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      val wCell = Window.partitionBy($"q_id").orderBy($"simc".desc, $"c_label")
      val probed = q.join(broadcast(cells))
        .withColumn("cdot", graft.functions.DotL.dot($"qv", $"cvec"))
        .withColumn("simc", $"cdot".cast("double") /
          (sqrt($"qn".cast("double")) * sqrt($"cn2".cast("double"))))
        .withColumn("crk", row_number().over(wCell))
        .filter($"crk" <= 2)
        .select($"q_id", $"qv", $"qn", $"c_label".as("label"))
      val members = scaled.select($"vec_id".as("c_id"), $"label", $"v".as("cv"), $"norm2".as("cn"))
      val wTop = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id")
      probed.join(members, Seq("label"))
        .filter($"c_id" =!= $"q_id")
        .withColumn("dot", graft.functions.DotL.dot($"qv", $"cv"))
        .withColumn("sim", round($"dot".cast("double") /
          (sqrt($"qn".cast("double")) * sqrt($"cn".cast("double"))), 6))
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .filter($"rk" <= 3)
        .select($"q_id", $"rk", $"c_id", $"sim")
        .orderBy("q_id", "rk")
    }),
    // L33: k-means partitioning of the embedding corpus — seeded
    // assignment + one Lloyd refinement. Seeds are the k lowest vec_ids
    // (deterministic, oracle-shared); every vector joins the BROADCAST
    // 8-row centroid table (nearest-by-cosine argmax with a total
    // tie-break), new centroids are the floor-averaged int64 component
    // sums via the mergeable CentroidAgg, and the corpus reassigns
    // against the refined broadcast centroids. Per-iteration cost is one
    // broadcast NLJ (N×K rows, map-side) + one partial-aggregable vector
    // sum — the canonical scale recipe (K grows with corpus so clusters
    // stay bounded; SemDeDup/cluster-balanced sampling build on this
    // partition). sim checksum is int64-scaled BEFORE summation so the
    // per-cluster quality metric is order-free and bit-exact.
    "q_cluster_kmeans" -> ((s, d) => {
      import s.implicits._
      val m = scaledVectors(Tables.embeddings(s, d))
      val as1 = seedAssign(m, 8).select($"vec_id", $"cl", $"v")
      val cents = as1.select($"cl", $"v").as[(Long, Array[Long])]
        .groupByKey(_._1).mapValues(_._2).agg(CentroidAgg.toColumn)
        .map { case (cl, (n, sums)) =>
          (cl, sums.map(x => math.floor(x.toDouble / n).toLong)) }
        .toDF("cl2", "cvec")
        .withColumn("cn2", graft.functions.DotL.dot($"cvec", $"cvec"))
      val w2 = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cl2")
      m.join(broadcast(cents))
        .withColumn("sim", graft.functions.DotL.dot($"v", $"cvec").cast("double") /
          (sqrt($"n2".cast("double")) * sqrt($"cn2".cast("double"))))
        .withColumn("rk", row_number().over(w2)).filter($"rk" === 1)
        .select($"cl2".as("cluster"), floor($"sim" * 1000000).cast("long").as("sim_i"))
        .groupBy($"cluster")
        .agg(count(lit(1)).as("n"), sum($"sim_i").as("sim_sum"))
        .select($"cluster", $"n", $"sim_sum",
          round($"sim_sum".cast("double") / (lit(1000000.0) * $"n".cast("double")), 6)
            .as("mean_sim"))
        .orderBy("cluster")
    }),
    // L41: cluster keyword labeling — the "what IS this cluster" step
    // after k-means partitions the corpus (the BERTopic/c-TF-IDF shape:
    // describe each embedding cluster by its most over-represented
    // tokens). Assignment reuses the seeded nearest-centroid partition
    // (same CTE as SemDeDup, oracle-shared); each assigned doc's tokens
    // aggregate to (cluster, token) counts, and a token's salience is
    // its integer-ppm LIFT — in-cluster rate minus corpus rate
    // (tf_c·1e6 div tot_c − tf_g·1e6 div tot_g) — which stays
    // meaningful when the vocabulary is shared across clusters (pure
    // c-TF-IDF's ln(K/df) term collapses to 0 when every token is in
    // every cluster). All exact int64; top-3 per cluster with a total
    // tie-break. Scale shape: one corpus token explode → two
    // partial-aggregable group-bys (cluster×vocab and vocab rows, both
    // Heaps-bounded), totals ride broadcasts — flat O(corpus), and the
    // doc↔vector join is an equi-join on the id (only the embedded
    // sample of the corpus carries vectors, the realistic regime).
    "q_cluster_terms" -> ((s, d) => {
      import s.implicits._
      val asg = seedAssign(scaledVectors(Tables.embeddings(s, d)), 8)
        .select($"vec_id", $"cl")
      val toks = Tables.documents(s, d)
        .join(asg, $"doc_id" === $"vec_id")
        .select($"cl", explode(split($"text", " ")).as("tok"))
      // pin the (cluster × vocab)-sized counts: three consumers read them
      // (cluster totals, corpus totals, and the scoring join) and without
      // the pin each re-runs the doc⋈assignment explode underneath — the
      // corpus must be touched exactly once at 100 TB
      val cTok = toks.groupBy($"cl", $"tok").agg(count(lit(1)).as("tf_c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cTot = cTok.groupBy($"cl").agg(sum($"tf_c").as("tot_c"))
      val gTok = cTok.groupBy($"tok").agg(sum($"tf_c").as("tf_g"))
      val gTot = gTok.agg(sum($"tf_g").as("tot_g"))
      val w = Window.partitionBy($"cl").orderBy($"lift_ppm".desc, $"tok")
      cTok.join(cTot, "cl").join(gTok, "tok").crossJoin(broadcast(gTot))
        .withColumn("lift_ppm",
          expr("tf_c * 1000000 div tot_c - tf_g * 1000000 div tot_g"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 3)
        .select($"cl".as("cluster"), $"rk", $"tok", $"lift_ppm", $"tf_c")
        .orderBy("cluster", "rk")
    }),
    // L34: SemDeDup (Abbas et al. 2023) — semantic dedup scoped BY the
    // k-means partition: exact pairwise cosine runs only WITHIN a
    // cluster, so the quadratic term is Σ|cluster|², never N² — at corpus
    // scale K is chosen ∝ N to keep clusters near-constant-size, making
    // the within-cluster sweep linear overall (and each cluster's pair
    // block is an independent, AQE-splittable equi-join partition on the
    // cluster key). Keep-lowest-id survivor rule; per-cluster dedup
    // profile out.
    "q_dedup_semantic" -> ((s, d) =>
      semDedupProfile(seedAssign(scaledVectors(Tables.embeddings(s, d)), 8), 0.4)),
    // K2: per-label centroid via the typed Aggregator; first 8 components
    // as (label, comp, mean) rows.
    "q_embed_centroid" -> ((s, d) => {
      import s.implicits._
      val scaled = Tables.embeddings(s, d)
        .select($"label".cast("long").as("label"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))").as("v"))
      val cents = scaled.as[(Long, Array[Long])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(CentroidAgg.toColumn)
        .map { case (label, (n, sums)) => (label, n, sums.take(8)) }
        .toDF("label", "n", "sums8")
      cents
        .select($"label", $"n", posexplode($"sums8").as(Seq("pos", "sum_c")))
        .select($"label", ($"pos" + 1).cast("long").as("comp"), $"n",
          round($"sum_c".cast("double") / $"n", 6).as("mean_c"))
        .orderBy("label", "comp")
    }),
    // Scalar int8 quantization of the embedding store — the 4×
    // compression step a 100 TB vector corpus applies before ANN serving.
    // Per-vector affine codebook (mn, range/255); the whole round-trip is
    // int64 arithmetic on the 1e7-scaled components, so quantized codes
    // AND reconstruction error are bit-exact cross-engine (no float
    // division anywhere). Pure map-side per-row lambdas — one
    // WholeStageCodegen projection, flat O(corpus).
    "q_embed_quantize" -> ((s, d) => {
      import s.implicits._
      Tables.embeddings(s, d)
        .withColumn("v", expr(
          "transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))"))
        .withColumn("mn", array_min($"v"))
        .withColumn("mx", array_max($"v"))
        .withColumn("rng", greatest($"mx" - $"mn", lit(1L)))
        .withColumn("q", expr("transform(v, x -> ((x - mn) * 255) div rng)"))
        .withColumn("dq", expr("transform(q, c -> mn + (c * rng) div 255)"))
        .withColumn("errs", expr("zip_with(v, dq, (a, b) -> abs(a - b))"))
        .select($"vec_id", $"mn", $"mx",
          expr("array_max(errs)").as("max_err"),
          expr("aggregate(errs, 0L, (acc, x) -> acc + x)").as("sum_err"))
        .orderBy("vec_id")
    }),
    // Random-projection dimensionality reduction (Achlioptas sign
    // matrix): 64-dim embeddings down to 8 components, out_j = Σᵢ ±vᵢ
    // with the sign drawn from the portable hash — the JL-style shrink a
    // 100 TB vector corpus applies before sketching/ANN when the full
    // width doesn't pay its storage. All int64 adds on the 1e7-scaled
    // components (bit-exact cross-engine), one map-side projection per
    // row through the same native DotL expression the LSH path uses —
    // WholeStageCodegen keeps it in the scan's span, flat O(corpus).
    "q_embed_project" -> ((s, d) => {
      import s.implicits._
      val signs = projectionSigns
      val cols = signs.indices.map { j =>
        graft.functions.DotL.dot($"v",
          array(signs(j).toIndexedSeq.map(lit): _*)).as(s"p$j")
      }
      Tables.embeddings(s, d)
        .withColumn("v", expr(
          "transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))"))
        .select(($"vec_id" +: cols): _*)
        .orderBy("vec_id")
    })
  )

  /** The 8×64 ±1 projection matrix, derived from the shared portable
    * hash so the DuckDB oracle bakes the identical signs. */
  lazy val projectionSigns: Array[Array[Long]] =
    Array.tabulate(8, 64)((j, i) =>
      if (graft.U.h64Local(s"rp:$j:$i") % 2 == 0) 1L else -1L)
}
