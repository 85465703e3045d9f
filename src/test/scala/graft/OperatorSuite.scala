package graft

import org.apache.spark.sql.functions._

/** Per-operator semantic checks that the DuckDB oracle can't express
  * (SURVEY.md §5.2): sketch accuracy bounds, ANN recall, the multimodal
  * batch pipeline, and the typed Aggregator. */
class OperatorSuite extends SparkSpec {

  test("D8 HLL: approx distinct within 5*rsd of exact per group") {
    import spark.implicits._
    // raw accuracy check straight off the table (the query itself now
    // folds this bound into its bound_ok certification column)
    val rows = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.02).as("a"),
        countDistinct($"user_id").as("e"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact) <= math.max(1, (5 * 0.02 * exact).toLong),
        s"group ${r.getString(0)}: approx=$approx exact=$exact")
    }
    val q = ops.Aggregates.qs("q_agg_hll")(spark, sfDir).collect()
    assert(q.nonEmpty && q.forall(r => r.getBoolean(r.fieldIndex("bound_ok"))),
      "q_agg_hll certification column must be all-true")
  }

  test("approx_percentile within 2% of exact median per group") {
    import spark.implicits._
    val rows = Tables.orders(spark, sfDir)
      .withColumn("total_c", U.cents($"o_totalprice"))
      .groupBy($"o_orderpriority")
      .agg(expr("approx_percentile(total_c, 0.5, 1000)").as("a"),
        expr("percentile(total_c, 0.5)").as("e"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getDouble(2))
      assert(math.abs(approx - exact) <= 0.02 * exact + 1,
        s"group ${r.getString(0)}: approx=$approx exact=$exact")
    }
    val q = ops.Aggregates.qs("q_agg_approx_pct")(spark, sfDir).collect()
    assert(q.nonEmpty && q.forall(r => r.getBoolean(r.fieldIndex("bound_ok"))),
      "q_agg_approx_pct certification column must be all-true")
  }

  test("L12 native roll_fp == declarative rolling-hash chain; NULL under 8 tokens") {
    import spark.implicits._
    graft.functions.H64.register(spark)
    val docs = Tables.documents(spark, sfDir).withColumn("toks", split($"text", " "))
    val chain = docs
      .withColumn("hs", expr("transform(toks, t -> h64(t))"))
      .withColumn("rolls", expr(
        """transform(sequence(8, size(hs)),
             i -> aggregate(slice(hs, i-7, 8), 0L, (a, h) -> (a * 257 + h) % 1000000007))"""))
      .select($"doc_id", array_min($"rolls").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = ops.TextAnalysis.qs("q_text_fingerprint")(spark, sfDir)
      .select($"doc_id", $"fingerprint")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.nonEmpty && native == chain)
    // no complete window -> NULL fingerprint (≙ the oracle's empty range)
    val short = Seq("a b c").toDF("text")
      .select(functions.RollFp.fp(split($"text", " ")).as("fp"))
    assert(short.collect().head.isNullAt(0))
  }

  test("MinHash-LSH candidates ⊇ exact Jaccard pairs at jac>=0.5 (planted near-dups)") {
    val exact = ops.TextOps.qs("q_sim_jaccard")(spark, sfDir)
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = ops.Dedup.qs("q_dedup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(exact.subsetOf(lsh),
      s"LSH missed high-sim pairs: ${exact -- lsh}")
  }

  test("SimHash blocking has exact recall for hamming<=3 (pigeonhole over 4 byte-blocks)") {
    // recompute all-pairs hamming from the simhash codes and compare
    import spark.implicits._
    val df = ops.Dedup.qs("q_dedup_simhash")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // blocked result must equal the brute-force definition: recompute via
    // cross join of codes (sf0.001: 500 docs, fine)
    val tf = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("f"))
      .withColumn("h", U.h64($"t"))
    val bitSums = (0 until 32).map(k =>
      sum(when(shiftright($"h", k).bitwiseAND(1) === 1, $"f").otherwise(-$"f")).as(s"b$k"))
    val sums = tf.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val codeCol = (0 until 32).map(k =>
      when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
    val codes = sums.select($"doc_id", codeCol.as("c")).as[(Long, Long)].collect()
    val brute = (for {
      (d1, c1) <- codes; (d2, c2) <- codes if d1 < d2
      ham = java.lang.Long.bitCount(c1 ^ c2) if ham <= 3
    } yield (d1, d2, ham.toLong)).toSet
    assert(df == brute)
  }

  /** The all-pairs top-3 definition — the semantic ground truth both
    * q_sim_cosine (exact, LSH-prefiltered plan) and q_ann_lsh
    * (approximate) are measured against. Test-only: O(Q·N) join. */
  private def bruteTop3 = bruteTop3In(sfDir)
  private def bruteTop3In(dir: String) = {
    import spark.implicits._
    val scaled = Tables.embeddings(spark, dir)
      .withColumn("v", org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))"))
      .withColumn("norm2", functions.DotL.dot($"v", $"v"))
    val q = scaled.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
    val c = scaled.select($"vec_id".as("c_id"), $"v".as("cv"), $"norm2".as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"sim".desc, $"c_id")
    q.join(c, $"q_id" =!= $"c_id")
      .withColumn("dot", functions.DotL.dot($"qv", $"cv"))
      .withColumn("sim", round($"dot".cast("double") /
        (sqrt($"qn".cast("double")) * sqrt($"cn".cast("double"))), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"q_id", $"rk", $"c_id", $"sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
  }

  test("q_sim_cosine (multiprobe-LSH prefilter) == exact all-pairs top-3") {
    val got = ops.TextOps.qs("q_sim_cosine")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val brute = bruteTop3
    assert(brute.nonEmpty)
    assert(got == brute,
      s"LSH prefilter lost true neighbors: missing=${brute -- got} extra=${got -- brute}")
  }

  test("ANN-LSH recall@3 >= 0.7 vs brute force, sims exact on shared pairs") {
    val brute = bruteTop3.map(t => (t._1, t._3) -> t._4).toMap
    val ann = ops.Similarity.qs("q_ann_lsh")(spark, sfDir).collect()
    assert(ann.nonEmpty)
    // every ANN hit that brute-force also ranked must carry the same sim
    val annPairs = ann.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    annPairs.collect { case (k, sim) if brute.contains(k) =>
      assert(brute(k) == sim, s"sim mismatch for $k")
    }
    val recall = annPairs.count(p => brute.contains(p._1)).toDouble / math.max(1, brute.size)
    info(f"ANN-LSH recall@3 vs brute force: $recall%.2f")
    assert(recall >= 0.7, f"ANN recall@3 $recall%.2f below 0.7 floor")
  }

  /** A second, independently-seeded corpus with the driver table's exact
    * schema (vec_id int64, embedding list<float>[64], label int32) —
    * clustered like a real embedding table (10 gaussian centers + noise)
    * but a completely different draw. Guards the multiprobe fan-out
    * tuning against silently rotting into "approximate with no recall
    * floor" when the data distribution changes (VERDICT r3 wrong-#2). */
  private lazy val secondSeedDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val centers = Array.fill(10, 64)(rnd.nextGaussian())
    val rows = (0 until 500).map { i =>
      val lab = i % 10
      val emb = Array.tabulate(64)(j => (centers(lab)(j) + 0.35 * rnd.nextGaussian()).toFloat)
      (i.toLong, emb, lab)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_seed2").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("second seed: q_sim_cosine stays exact and ANN-LSH recall holds on a fresh draw") {
    val brute = bruteTop3In(secondSeedDir)
    assert(brute.nonEmpty)
    val got = ops.TextOps.qs("q_sim_cosine")(spark, secondSeedDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == brute,
      s"q_sim_cosine's exactness is corpus-tuned no more: on a second seed it lost " +
        s"missing=${brute -- got} extra=${got -- brute}")
    val bruteMap = brute.map(t => (t._1, t._3) -> t._4).toMap
    val annPairs = ops.Similarity.qs("q_ann_lsh")(spark, secondSeedDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    val recall = annPairs.count(p => bruteMap.contains(p._1)).toDouble / math.max(1, bruteMap.size)
    info(f"second-seed ANN-LSH recall@3: $recall%.2f")
    assert(recall >= 0.7, f"second-seed ANN recall@3 $recall%.2f below 0.7 floor")
  }

  test("K2 centroid Aggregator matches SQL per-component mean") {
    import spark.implicits._
    val agg = ops.Similarity.qs("q_embed_centroid")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val sql = Tables.embeddings(spark, sfDir)
      .select($"label".cast("long").as("label"),
        posexplode(expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000000) as bigint))"))
          .as(Seq("pos", "c")))
      .filter($"pos" < 8)
      .groupBy($"label", ($"pos" + 1).cast("long").as("comp"))
      .agg(count(lit(1)).as("n"), round(sum($"c").cast("double") / count(lit(1)), 6).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(agg == sql)
  }

  test("multimodal Media pipeline: batched features are deterministic, partition-preserving") {
    val ds = multimodal.Media.load(spark, sfDir).repartition(7)
    val feats = multimodal.Media.extractFeatures(ds, batchSize = 16)
    assert(feats.rdd.getNumPartitions == 7) // no shuffle introduced
    val rows = feats.collect().sortBy(_.doc_id)
    assert(rows.length == 500)
    rows.foreach { f =>
      // real decode: histogram covers exactly the decoded raster
      assert(f.byte_hist.sum == f.width.toLong * f.height * 3)
      assert(f.n_bytes > f.width * f.height * 3) // payload = header + raster
      assert(f.mean_r >= 0 && f.mean_r <= 255)
      assert(f.frames.length == 4)             // keyframe count
      assert(f.frames.forall(_.length <= 8))   // frame width bound
    }
    // deterministic across runs
    val again = multimodal.Media.extractFeatures(ds, batchSize = 3)
      .collect().sortBy(_.doc_id)
    assert(rows.map(_.byte_hist.toSeq).toSeq == again.map(_.byte_hist.toSeq).toSeq)
  }

  test("ingest transform batch == streaming plans produce same schema") {
    val batch = streaming.Ingest.transform(
      spark.read.schema(model.TweetSchema.schema).json(
        spark.emptyDataset[String](org.apache.spark.sql.Encoders.STRING)),
      "Twitter", "NBA")
    assert(batch.columns.contains("year") && batch.columns.contains("hashtags"))
  }

  test("connectedComponents: transitive closure on chains, stars, isolated pairs") {
    import spark.implicits._
    // path 1-2-3-4-5-6 (diameter 5 → needs several propagation rounds),
    // star 10-{11,12,13}, isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L)).toDF("u", "v")
    val got = ops.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == want)
  }

  test("connectedComponents: round-cap breach auto-falls back to star contraction (VERDICT r8 #7)") {
    import spark.implicits._
    // Deterministic behavior AT the cap: a 40-vertex path (diameter 39)
    // cannot converge in maxRounds=3 hash-to-min rounds, so the loop
    // must exit via the contraction branch — current labels contract
    // the edge set, the log-round star engine finishes it, and the
    // composed labels are EXACT, not partial. A second disjoint chain
    // checks the composition doesn't cross-contaminate components, and
    // the already-converged star 500-{501,502} contracts to self-loops
    // that drop out without losing their (correct) labels.
    val chainA = (0L until 40L).sliding(2).map(s => (s.head, s.last)).toSeq
    val chainB = (100L until 130L).sliding(2).map(s => (s.head, s.last)).toSeq
    val star = Seq((500L, 501L), (500L, 502L))
    val edges = (chainA ++ chainB ++ star).toDF("u", "v")
    val got = ops.Dedup.connectedComponents(edges, maxRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 40L).map(_ -> 0L).toMap ++
      (100L until 130L).map(_ -> 100L).toMap ++
      Map(500L -> 500L, 501L -> 500L, 502L -> 500L)
    assert(got == want)
    // and the capped path agrees with the uncapped one label-for-label
    val uncapped = ops.Dedup.connectedComponents(edges, maxRounds = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == uncapped)
  }

  test("connectedComponents: self-loop-only and duplicate/reversed edges keep every vertex") {
    import spark.implicits._
    // vertex 30's only edge is the self-loop (30,30): canonicalization
    // drops the edge, but 30 is still a graph vertex and must come back
    // labeled with itself. (40,41) arrives in both orientations plus a
    // repeat — one component, no duplicate labels.
    val edges = Seq((30L, 30L), (40L, 41L), (41L, 40L), (40L, 41L)).toDF("u", "v")
    val rows = ops.Dedup.connectedComponents(edges).collect()
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == got.size, "duplicate vertex labels in CC output")
    assert(got == Map(30L -> 30L, 40L -> 40L, 41L -> 40L))
  }

  test("q_dedup_cluster: canonical id is the component min; clusters have >=2 members") {
    val rows = ops.Dedup.qs("q_dedup_cluster")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0), s"cluster_id must be component min: $r")
      assert(r.getLong(2) >= 2L, s"singleton cluster leaked into output: $r")
    }
    // each cluster_id labels itself (the canonical doc is a member)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.exists(_.getLong(0) == cid), s"canonical doc $cid missing")
      assert(members.forall(_.getLong(2) == members.length), s"n_members wrong for $cid")
    }
  }

  test("fuzzyPairs: names below the q-gram recall bound route through the exact path") {
    // 2-char names at distance 2 can share ZERO bigrams — the gram
    // filter would silently drop them (ADVICE r5); the short side must
    // take the exact pairwise arm and match a brute-force oracle
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val dict = Seq("ab", "yz", "axb", "spark", "sparks", "queryplan",
      "queryplen", "windowing", "windowed")
    val want = (for {
      a <- dict; b <- dict if a < b
      if math.abs(a.length - b.length) <= 2
      dd = lev(a, b) if dd <= 2
    } yield (a, b, dd.toLong)).toSet
    assert(want.contains(("ab", "yz", 2L)), "planted zero-shared-bigram pair missing from oracle")
    val got = ops.TextOps.fuzzyPairs(dict.toDF("nm"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, s"fuzzyPairs diverged from brute force:\ngot  $got\nwant $want")
  }

  test("q_embed_quantize: int8 round-trip error bounded by quantization step + 1") {
    val rows = ops.Similarity.qs("q_embed_quantize")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx, maxErr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val rng = math.max(mx - mn, 1L)
      assert(maxErr <= rng / 255 + 1, s"vec ${r.getLong(0)}: err $maxErr > step bound")
    }
  }

  test("q_sample_mixture: per-language counts hit the exact mixture quotas") {
    import spark.implicits._
    val wPpm = Map("de" -> 150000L, "en" -> 400000L, "es" -> 80000L,
      "fr" -> 120000L, "zh" -> 250000L)
    val nObs = Tables.documents(spark, sfDir)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tMax = wPpm.map { case (l, w) => nObs(l) * 1000000L / w }.min
    val kept = ops.TextAnalysis.qs("q_sample_mixture")(spark, sfDir)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    wPpm.foreach { case (l, w) =>
      val kTarget = tMax * w / 1000000L
      assert(kept.getOrElse(l, 0L) == kTarget,
        s"$l: kept ${kept.getOrElse(l, 0L)} != quota $kTarget (obs ${nObs(l)})")
    }
  }

  test("L42 weighted sampling: A-ES invariants — dense per-group ranks, weight monotonicity, layout-independence") {
    import spark.implicits._
    val got = ops.TextAnalysis.qs("q_sample_weighted")(spark, sfDir).collect()
    // exactly K=5 per language with dense ranks 1..5, keys ≤ 0 (ln u ≤ 0)
    val byLang = got.groupBy(_.getString(0))
    byLang.foreach { case (l, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L), s"$l ranks not dense")
      assert(rows.forall(_.getLong(4) <= 0L), s"$l has a positive ln(u)/w key")
      // within a group the emitted order IS the key order (desc, doc_id tiebreak)
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(r => (-r.getLong(4), r.getLong(2))).toSeq ==
        sorted.map(r => (-r.getLong(4), r.getLong(2))).sortBy(identity).toSeq)
    }
    // A-ES weight monotonicity: for a FIXED u, a heavier doc's key is
    // ≥ the lighter one's (ln u ≤ 0 ⇒ ln(u)/2w ≥ ln(u)/w) — doubling
    // every weight must not decrease any doc's key
    val keys = Tables.documents(spark, sfDir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("w"))
      .withColumn("u",
        (U.h64(concat(lit("wsamp:"), $"doc_id")).cast("double") + 1.0d) /
          lit(1152921504606846976.0d))
      .select($"doc_id",
        floor(log($"u") / $"w" * 1000000 + 0.000001).cast("long").as("k1"),
        floor(log($"u") / ($"w" * 2) * 1000000 + 0.000001).cast("long").as("k2"))
      .collect()
    keys.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"doc ${r.getLong(0)}: doubling weight lowered the key"))
    // run-to-run stability: no RNG state anywhere — re-executing the
    // query yields byte-identical rows (alternate-partitioning
    // determinism is covered for every query by tools/sweep.sh's
    // 7-core rung)
    val alt = ops.TextAnalysis.qs("q_sample_weighted")(spark, sfDir).collect()
    assert(got.map(_.toString).toSeq == alt.map(_.toString).toSeq)
  }

  test("observe(): single-pass pipeline metrics ride the curation query, no second scan") {
    // the observability hook for production pipelines: data-quality
    // counters (rows kept, chars shipped, null count) attach to the
    // SAME job as the query via df.observe — no second aggregation pass
    // over 100 TB. Values must equal the direct recompute.
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation("curation_metrics")
    val df = Tables.documents(spark, sfDir)
      .filter($"lang" === "en")
      .observe(obs,
        count(lit(1)).as("rows_kept"),
        sum($"n_chars").as("chars_shipped"),
        sum(when($"text".isNull, 1L).otherwise(0L)).as("null_texts"))
      .select($"doc_id", $"n_chars")
    val landed = df.collect().length
    val m = obs.get
    assert(m("rows_kept") == landed.toLong)
    val direct = Tables.documents(spark, sfDir).filter($"lang" === "en")
      .agg(sum($"n_chars")).collect()(0).getLong(0)
    assert(m("chars_shipped") == direct)
    assert(m("null_texts") == 0L)
  }

  test("HLL sketch merge is lossless: per-day sketches unioned == direct whole-corpus sketch") {
    // the never-rescan-history distinct: store a Datasketches HLL per
    // day, hll_union_agg them for any range — register-wise max is a
    // true lattice join, so the merged estimate must equal the one-pass
    // estimate BIT-FOR-BIT, and stay within rsd of exact
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"user_id")
    val perDay = ev.groupBy($"day").agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = perDay.agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect()(0).getLong(0)
    val direct = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect()(0).getLong(0)
    assert(merged == direct,
      s"union of per-day sketches ($merged) must equal the one-pass sketch ($direct)")
    val exact = ev.select($"user_id").distinct().count()
    assert(math.abs(merged - exact) <= math.max(2, (exact * 0.05).toLong),
      s"estimate $merged too far from exact $exact")
  }

  test("q_dedup_lines: every distinct line survives exactly once; counts conserve") {
    import spark.implicits._
    val lines = Tables.documents(spark, sfDir)
      .withColumn("toks", split($"text", " "))
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks), 3), i -> concat_ws(' ', slice(toks, i, 3)))"))
        .as("line"))
    val totalLines = lines.count()
    val distinctLines = lines.select($"line").distinct().count()
    val res = ops.Dedup.qs("q_dedup_lines")(spark, sfDir)
      .agg(sum($"n_lines"), sum($"n_kept")).collect()(0)
    assert(res.getLong(0) == totalLines,
      s"n_lines sum ${res.getLong(0)} != corpus chunk count $totalLines")
    assert(res.getLong(1) == distinctLines,
      s"n_kept sum ${res.getLong(1)} != distinct line count $distinctLines")
  }

  test("q_text_pii: every doc's spliced PII is found and fully masked") {
    val rows = ops.TextAnalysis.qs("q_text_pii")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getString(1)
      assert(r.getLong(2) >= 1 && r.getLong(3) >= 1 && r.getLong(4) >= 1,
        s"doc ${r.getLong(0)}: missed a spliced PII form")
      assert(!red.contains("@mail-") && !red.contains("555-"),
        s"doc ${r.getLong(0)}: PII leaked through redaction: $red")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    }
  }

  test("q_split_train: split is exhaustive, disjoint, and rerun-stable") {
    import spark.implicits._
    val res = ops.TextAnalysis.qs("q_split_train")(spark, sfDir).collect()
    val bySplit = res.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = Tables.documents(spark, sfDir).count()
    assert(bySplit.values.sum == total, "splits must partition the corpus")
    assert(bySplit.keySet == Set("train", "valid", "test"))
    // 80/10/10 within a loose tolerance at sf0.001 (hash-multinomial)
    assert(bySplit("train") > total * 6 / 10, s"train too small: $bySplit")
    val again = ops.TextAnalysis.qs("q_split_train")(spark, sfDir).collect()
    assert(res.map(_.toString).toSeq == again.map(_.toString).toSeq, "split must be deterministic")
  }

  test("scd2Apply: three merge rounds close/insert versions; re-applying a batch is a no-op") {
    import spark.implicits._
    def snap(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
      rows.toSeq.toDF("k", "v")
    val empty = Seq.empty[(Long, String, Long, Option[Long])]
      .toDF("k", "v", "valid_from", "valid_to")
    // day 1: two keys appear
    val h1 = ops.Scd.scd2Apply(empty, snap(1L -> "a", 2L -> "x"), "k", "v", lit(1L))
    // day 2: key 1 changes, key 2 unchanged, key 3 appears
    val h2 = ops.Scd.scd2Apply(h1, snap(1L -> "b", 2L -> "x", 3L -> "m"), "k", "v", lit(2L))
    // day 3: key 2 changes; keys 1/3 absent from the batch (stay open)
    val h3 = ops.Scd.scd2Apply(h2, snap(2L -> "y"), "k", "v", lit(3L))
    val got = h3.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sorted
    val want = Seq(
      (1L, "a", 1L, 2L), (1L, "b", 2L, -1L),
      (2L, "x", 1L, 3L), (2L, "y", 3L, -1L),
      (3L, "m", 2L, -1L)).sorted
    assert(got.toSeq == want, s"history mismatch:\n got=${got.toSeq}\nwant=$want")
    // idempotence: re-applying day 3's snapshot at a later ts changes nothing
    val h4 = ops.Scd.scd2Apply(h3, snap(2L -> "y"), "k", "v", lit(4L))
    val got4 = h4.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sorted
    assert(got4.toSeq == want, "re-applied batch mutated the history")
    // exactly one open row per key
    val openPerKey = h3.filter($"valid_to".isNull).groupBy($"k").count()
      .collect().map(_.getLong(1))
    assert(openPerKey.forall(_ == 1L), "a key has multiple open versions")
  }

  test("D16 Misra-Gries: guarantee holds under saturation + partition merges") {
    import spark.implicits._
    // same planted-skew stream as q_heavy_hitters: ~4k distinct cold keys
    // >> K=64 counters, so per-partition buffers saturate and the
    // decrement/merge paths genuinely run
    val keyed = Tables.events(spark, sfDir).select(
      when($"event_id" % 5 === 0, concat(lit("hot_"), ($"event_id" % 3).cast("string")))
        .otherwise(concat(lit("cold_"), ($"event_id" % 7919).cast("string"))).as("k"))
      .repartition(8) // force multiple partial buffers → merge path
    val n = keyed.count()
    val exact = keyed.groupBy($"k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size > 64, "domain must exceed sketch capacity")
    val cands = keyed.as[String]
      .select(ops.Aggregates.MisraGriesAgg.toColumn.name("ks"))
      .collect().head.toSet
    assert(cands.size <= 64, s"sketch emitted ${cands.size} > K candidates")
    // every key with true freq > N/(K+1) must be nominated
    val mustHave = exact.filter { case (_, c) => c * 65 > n }.keySet
    assert(mustHave.nonEmpty && mustHave.subsetOf(cands),
      s"missed guaranteed-frequent keys: ${mustHave -- cands}")
    // end-to-end: the query's exact-verified output == brute-force answer
    val got = ops.Aggregates.qs("q_heavy_hitters")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val want = exact.filter { case (_, c) => c * 25 > n }.toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("L32 span dedup: planted shared 8-token span is flagged, unique doc is not") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_spans_").toString
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    Seq(
      (1L, s"$shared one two three", "en", "t", 0L),
      (2L, s"zero $shared nine ten", "en", "t", 0L),
      (3L, "iota kappa lambda mu nu xi omicron pi rho sigma", "en", "t", 0L),
      (4L, "too short", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = ops.Dedup.qs("q_dedup_spans")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // doc1/doc2: 11 tokens → 4 spans each, 1 duplicated; doc3/4 absent
    assert(got == List((1L, 4L, 1L), (2L, 4L, 1L)), s"got $got")
  }

  test("L33 k-means: every vector assigned exactly once; checksum consistent") {
    import spark.implicits._
    val total = Tables.embeddings(spark, sfDir).count()
    val rows = ops.Similarity.qs("q_cluster_kmeans")(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == total, "cluster sizes must partition the corpus")
    rows.foreach { r =>
      // mean_sim is derived from the int64 checksum, and cosine ≤ 1
      assert(r.getLong(2) <= r.getLong(1) * 1000000L, s"sim_sum out of range: $r")
    }
  }

  test("D15b OLS regression agrees with Spark's builtin regr_slope/intercept/r2") {
    import spark.implicits._
    val got = ops.Aggregates.qs("q_agg_regression")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ref = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast("long").as("x"),
        floor($"l_extendedprice").cast("long").as("y"))
      .groupBy($"l_returnflag")
      .agg(expr("regr_slope(y, x)").as("sl"), expr("regr_intercept(y, x)").as("ic"),
        expr("regr_r2(y, x)").as("r2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    ref.foreach { case (flag, (sl, ic, r2)) =>
      val (gsl, gic, gr2) = got(flag)
      assert(math.abs(gsl - sl) <= 1e-4 * math.abs(sl) + 1e-4, s"$flag slope $gsl vs $sl")
      assert(math.abs(gic - ic) <= 1e-4 * math.abs(ic) + 1e-2, s"$flag intercept $gic vs $ic")
      assert(gr2 >= 0.0 && gr2 <= 1.0 && math.abs(gr2 - r2) <= 1e-4, s"$flag r2 $gr2 vs $r2")
    }
  }

  test("D17 entropy: bounded by ln(n_types); uniform mix is exactly at the bound") {
    import spark.implicits._
    val rows = ops.Aggregates.qs("q_agg_entropy")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, hMicro) = (r.getLong(2), r.getLong(3))
      assert(hMicro >= 0L, s"negative entropy: $r")
      assert(hMicro <= math.ceil(math.log(types.toDouble) * 1e6).toLong + types,
        s"entropy above ln(n_types): $r")
    }
    // planted uniform 4-type day: H must hit ln(4) to micro-nat rounding
    val tmp = java.nio.file.Files.createTempDirectory("graft_ent_").toString
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    (0 until 40).map(i => (i.toLong, new java.sql.Timestamp(base.getTime + i * 60000L),
        i.toLong % 5, Seq("a", "b", "c", "d")(i % 4), 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val h = ops.Aggregates.qs("q_agg_entropy")(spark, tmp).collect()
    assert(h.length == 1 && math.abs(h(0).getLong(3) - 1386294L) <= 4,
      s"uniform 4-mix entropy != ln(4): ${h.toList}")
  }

  test("I14 resample: per-user grid is gapless hourly; fills carry last observation") {
    import spark.implicits._
    val out = ops.Streaming.qs("q_resample_gapfill")(spark, sfDir)
      .withColumn("h", to_timestamp($"hour"))
    // gapless: row count per user == span hours + 1; distinct hours == rows
    val spans = out.groupBy($"user_id")
      .agg(count(lit(1)).as("rows"), countDistinct($"h").as("dh"),
        ((unix_timestamp(max($"h")) - unix_timestamp(min($"h"))) / 3600 + 1).cast("long").as("span"))
      .collect()
    spans.foreach { r =>
      assert(r.getLong(1) == r.getLong(3) && r.getLong(2) == r.getLong(3),
        s"user ${r.get(0)}: grid not gapless: $r")
    }
    // a gap row (n=0) must repeat its predecessor's filled value
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"h")
    val bad = out.withColumn("prev", lag($"vm_filled", 1).over(w))
      .filter($"n" === 0L && $"prev".isNotNull && $"vm_filled" =!= $"prev")
    assert(bad.isEmpty, s"gap rows that invent values: ${bad.take(3).toList}")
  }

  test("I15 transitions: shares sum to ~1e6 per source; counts conserve the lag stream") {
    import spark.implicits._
    val rows = ops.Streaming.qs("q_transitions")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val shareSum = rs.map(_.getLong(3)).sum
      // integer div floors each share: total in (1e6 - |fanout|, 1e6]
      assert(shareSum <= 1000000L && shareSum > 1000000L - rs.length,
        s"$from: share_ppm sums to $shareSum over ${rs.length} targets")
    }
    val total = rows.map(_.getLong(2)).sum
    val expected = Tables.events(spark, sfDir).count() -
      Tables.events(spark, sfDir).select($"user_id").distinct().count()
    assert(total == expected, s"transition count $total != events - users $expected")
  }

  test("I16 interval concurrency: sweep-line closes at zero and never goes negative") {
    val rows = ops.Streaming.qs("q_interval_concurrency")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 0L, s"negative concurrency: $r"))
    assert(rows.last.getLong(2) == 0L,
      s"sweep must close at zero: ${rows.last}")
    assert(rows.map(_.getLong(1)).sum == 0L, "deltas must conserve")
  }

  test("D15 exact-moment stats agree with Spark's builtin fp aggregates") {
    import spark.implicits._
    val got = ops.Aggregates.qs("q_agg_stats")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5), r.getDouble(7))).toMap
    val ref = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast("long").as("x"),
        floor($"l_extendedprice").cast("long").as("y"))
      .groupBy($"l_returnflag")
      .agg(var_pop($"x").as("vp"), stddev_samp($"x").as("sd"), corr($"x", $"y").as("cr"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    ref.foreach { case (flag, (vp, sd, cr)) =>
      val (gvp, gsd, gcr) = got(flag)
      assert(math.abs(gvp - vp) <= 1e-6 * math.abs(vp) + 1e-6, s"$flag var_pop $gvp vs $vp")
      assert(math.abs(gsd - sd) <= 1e-6 * math.abs(sd) + 1e-6, s"$flag stddev $gsd vs $sd")
      assert(math.abs(gcr - cr) <= 1e-4, s"$flag corr $gcr vs $cr")
    }
  }

  test("L36 BPE training: consecutive pairs merge greedily-leftmost across rounds") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    // 'aaaa'×2 ⇒ round 1 learns (a,a) cnt 6 (3 adjacent pairs × freq 2)
    // and must merge BOTH occurrences per word (the overlap case string
    // replace gets wrong without the fixpoint), so round 2 sees (aa,aa)
    Seq((1L, "aaaa bc", "en", "t", 0L), (2L, "aaaa", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = ops.TextAnalysis.qs("q_text_bpe_train")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toList
    assert(got == List((1L, "a", "a", 6L), (2L, "aa", "aa", 2L), (3L, "b", "c", 1L)),
      s"got $got")
  }

  test("L35 integer PageRank: bit-identical under different partitionings") {
    // the reason the ranks are int64 micro-units: double-summing PageRank
    // differs in the last ulp between partition layouts and can flip a
    // top-k boundary; the integer recurrence may not
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    def run() = ops.Graph.qs("q_graph_pagerank")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val a = run()
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = run()
      assert(a.nonEmpty && a == b, s"rank drift across partitionings:\n$a\nvs\n$b")
      assert(a.map(_._2).forall(_ >= 150000L), "rank below the damping floor")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("q_scd2: versions tile each user's timeline; one current row per user") {
    import spark.implicits._
    val rows = ops.Scd.qs("q_scd2")(spark, sfDir)
    val n = rows.count()
    assert(n > 0)
    // exactly one current (open) version per user
    val cur = rows.filter($"is_current").groupBy($"user_id").count()
      .collect().map(_.getLong(1))
    assert(cur.forall(_ == 1L), "user with != 1 current version")
    // intervals chain: valid_to of version i == valid_from of version i+1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"valid_from", $"valid_to".asc_nulls_last)
    val broken = rows
      .withColumn("nxt", lead($"valid_from", 1).over(w))
      .filter($"nxt".isNotNull && !($"valid_to" <=> $"nxt")).count()
    assert(broken == 0, s"$broken non-chaining validity intervals")
    // comparer edge (round-7 hash mismatch): every emitted timestamp must
    // sit INSIDE int64-nanosecond range — the driver reads the INT96
    // parquet dump via an ns-resolution path that silently wraps
    // anything >= 2262-04-11 (the classic 9999-12-31 open-row sentinel),
    // while the DuckDB oracle dump is µs and doesn't wrap.
    val nsMax = lit("2262-04-10 00:00:00").cast("timestamp")
    val oob = rows.filter($"valid_from" >= nsMax || $"valid_to" >= nsMax).count()
    assert(oob == 0, s"$oob rows with timestamps outside int64-ns range")
  }

  test("L37 triangleProfile: exact counts on K4 ∪ triangle ∪ path, robust to dup/reversed edges") {
    import spark.implicits._
    // K4 on {1..4}: 4 triangles, every vertex in 3, degree 3, cc = 1.0;
    // isolated triangle {10,11,12}: each in 1, degree 2, cc = 1.0;
    // path 20-21-22: no triangles, cc = 0. Edges arrive messy — some
    // reversed, one duplicated — canonicalization must absorb that.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (3L, 2L), (2L, 4L), (3L, 4L),
      (3L, 4L), (10L, 11L), (12L, 11L), (10L, 12L),
      (20L, 21L), (22L, 21L)).toDF("u", "v")
    val got = ops.Graph.triangleProfile(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = Map(
      1L -> ((3L, 3L, 1000000L)), 2L -> ((3L, 3L, 1000000L)),
      3L -> ((3L, 3L, 1000000L)), 4L -> ((3L, 3L, 1000000L)),
      10L -> ((1L, 2L, 1000000L)), 11L -> ((1L, 2L, 1000000L)),
      12L -> ((1L, 2L, 1000000L)),
      20L -> ((0L, 1L, 0L)), 21L -> ((0L, 2L, 0L)), 22L -> ((0L, 1L, 0L)))
    assert(got == want, s"triangle profile mismatch: $got")
  }

  test("L37b approx triangles: m=1 is exact; estimator is exactly m³ × the sampled recount") {
    import spark.implicits._
    // same K4 ∪ triangle ∪ path fixture as L37 (canonical u < v rows):
    // 5 triangles, 12 edges — at m=1 the sample is the whole graph and
    // the "estimate" must be the exact count with scale factor 1
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (21L, 22L)).toDF("u", "v")
    val ex = ops.Graph.approxTriangles(e, 1L).collect()(0)
    assert(ex.getLong(0) == 1L && ex.getLong(1) == 11L &&
      ex.getLong(2) == 5L && ex.getLong(3) == 5L,
      s"m=1 must degenerate to the exact count: $ex")
    // m=3: recount the h64-sampled subgraph through the independently
    // pinned exact profile — the estimator must be exactly 27× that,
    // over exactly the edges the shared hash admits
    val m = 3L
    val es = e.filter(U.h64(concat_ws("|", $"u", $"v")) % m === 0).distinct()
    val nEdges = es.count()
    val triS = ops.Graph.triangleProfile(es)
      .agg(coalesce(expr("sum(tri) div 3"), lit(0L))).collect()(0).getLong(0)
    val got = ops.Graph.approxTriangles(e, m).collect()(0)
    assert(got.getLong(0) == m && got.getLong(1) == nEdges &&
      got.getLong(2) == triS && got.getLong(3) == triS * m * m * m,
      s"estimator arithmetic broke: $got (want mod=$m, edges=$nEdges, tri=$triS)")
    // an m so large the sample is EMPTY must degrade to a zero estimate,
    // not an error (the profile, sieve build, and sums all see 0 rows)
    val empty = ops.Graph.approxTriangles(e, 1000003L).collect()(0)
    assert(empty.getLong(1) == 0L && empty.getLong(2) == 0L && empty.getLong(3) == 0L,
      s"empty sample must yield zeros: $empty")
    // colorful form, same fixture: m=1 is a single color (full graph,
    // scale 1 — exact); at m=2 build the monochromatic subgraph in the
    // test with the same shared coloring, recount through the pinned
    // exact profile, and the estimator must be exactly 4× that
    val cEx = ops.Graph.colorfulTriangles(e, 1L).collect()(0)
    assert(cEx.getLong(2) == 5L && cEx.getLong(3) == 5L,
      s"colorful m=1 must degenerate to the exact count: $cEx")
    val mc = 2L
    def color(c: org.apache.spark.sql.Column) = U.h64(c.cast("string")) % mc
    val mono = e.filter(color($"u") === color($"v")).distinct()
    val triMono = ops.Graph.triangleProfile(mono)
      .agg(coalesce(expr("sum(tri) div 3"), lit(0L))).collect()(0).getLong(0)
    val cGot = ops.Graph.colorfulTriangles(mono, mc).collect()(0)
    assert(cGot.getLong(0) == mc && cGot.getLong(1) == mono.count() &&
      cGot.getLong(2) == triMono && cGot.getLong(3) == triMono * mc * mc,
      s"colorful estimator arithmetic broke: $cGot (want tri=$triMono)")
  }

  test("L37b at sf: samplemod=1 override reproduces the exact global count; default is in-band") {
    import spark.implicits._
    // the exact global total, from the same edge construction + the
    // separately pinned profile (q_graph_triangles emits top-20 rows,
    // not the total, so recompute it here)
    val ls = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("sk")).distinct()
    val e0 = ls.as("a").join(ls.as("b"), $"a.ok" === $"b.ok" && $"a.sk" < $"b.sk")
      .select($"a.sk".as("u"), $"b.sk".as("v"))
    val exact = ops.Graph.approxTriangles(e0, 1L).collect()(0).getLong(3)
    assert(exact > 0, "test graph has no triangles — suite is vacuous")
    spark.conf.set("spark.graft.tri.samplemod", "1")
    try {
      val viaConf = SparkEntry.queries("q_graph_triangles_approx")(spark, sfDir)
        .collect()(0)
      assert(viaConf.getLong(0) == 1L && viaConf.getLong(3) == exact,
        s"samplemod=1 must be exact: got $viaConf, want $exact")
    } finally spark.conf.unset("spark.graft.tri.samplemod")
    // default m=4: the estimate is DETERMINISTIC on the fixed corpus —
    // this band is a fact about the committed data + hash, not a
    // statistical hope (DOULION relative error ~1/√T_sampled)
    val est = SparkEntry.queries("q_graph_triangles_approx")(spark, sfDir)
      .collect()(0).getLong(3)
    assert(est > exact / 2 && est < exact * 2,
      s"default-sample estimate $est outside (${exact / 2}, ${exact * 2})")
  }

  test("L37 sieve self-sizes from |E| (VERDICT r15 #3): rule, caps, and result invariance") {
    import spark.implicits._
    val knob = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    // decision rule at DEFAULT conf: m = 16·n, floored at 8 Mbit, heap-
    // capped (heap/32 bytes → ·8 bits/byte = heap/4 bits)
    val heapCap = Runtime.getRuntime.maxMemory / 32L * 8L
    assert(ops.Graph.sieveBits(spark, 100L) == (1L << 23),
      "tiny edge set must take the 8 Mbit floor")
    assert(ops.Graph.sieveBits(spark, 30000000L) ==
      math.min(heapCap, 480000000L),
      "30M edges must derive 16·n (the tuned ×25 point) unless heap-capped")
    // an EXPLICITLY set conf is a ceiling; its default no longer caps
    spark.conf.set(knob, (1L << 20).toString)
    try assert(ops.Graph.sieveBits(spark, 30000000L) == (1L << 20),
      "explicit maxNumBits must cap the sieve")
    finally spark.conf.unset(knob)
    assert(ops.Graph.sieveBits(spark, 30000000L) > (1L << 26),
      "the conf DEFAULT must not cap the derived budget (the r15 manual-knob wart)")
    // result invariance: an absurdly small sieve (near pass-through)
    // and the self-sized one produce the IDENTICAL profile — the exact
    // left-semi closing join is the correctness backstop, the sieve
    // only cuts wire volume
    def canonTri() = SparkEntry.queries("q_graph_triangles")(spark, sfDir)
      .collect().map(_.toSeq.mkString("|")).toSeq.sorted
    val selfSized = canonTri()
    assert(selfSized.nonEmpty, "triangle profile empty — test is vacuous")
    spark.conf.set(knob, "64") // 64 bits: the sieve passes ~everything
    try assert(canonTri() == selfSized,
      "triangle profile depends on sieve size — the semi-join backstop broke")
    finally spark.conf.unset(knob)
  }

  test("L40 classifier: beats the majority class on the fixed corpus, predicts both classes") {
    import spark.implicits._
    // deterministic model on deterministic data — these are exact facts
    // about the corpus, not statistical hopes: if a refactor degrades
    // the model to the majority-class baseline (e.g. weights all zero
    // after a join regression), this fails
    val out = ops.TextAnalysis.qs("q_quality_classify")(spark, sfDir)
      .select($"pred", $"label", $"correct").collect()
    val n = out.length.toLong
    val correct = out.map(_.getLong(2)).sum
    val majority = out.groupBy(_.getString(1)).values.map(_.length.toLong).max
    assert(out.map(_.getString(0)).toSet == Set("pos", "neg"),
      "classifier collapsed to a single predicted class")
    assert(correct > majority,
      s"classifier ($correct/$n) no better than majority class ($majority/$n)")
  }

  test("L39 BPE encode: pieces bounded by words below and char-split above, merges save pieces") {
    import spark.implicits._
    val enc = ops.TextAnalysis.qs("q_text_bpe_encode")(spark, sfDir)
      .select($"doc_id", $"n_words", $"n_pieces").collect()
    // every word is ≥1 piece; no word exceeds its own character count
    assert(enc.forall(r => r.getLong(2) >= r.getLong(1)), "a word encoded to <1 piece")
    val charPieces = Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("w")).filter(length($"w") > 0)
      .agg(sum(length($"w"))).head().getLong(0)
    val totPieces = enc.map(_.getLong(2)).sum
    // 3 learned merges must strictly compress vs the character baseline
    assert(totPieces < charPieces,
      s"merges saved nothing: $totPieces pieces vs $charPieces chars")
  }

  test("L38 splitDrift: proportional splits drift 0; disjoint vocabularies hit TV = 1e6") {
    import spark.implicits._
    // train {a×8, b×4} vs holdout {a×2, b×1}: identical unigram
    // distributions → every per-token drift and the TV row are 0
    val prop = (Seq.fill(8)("a") ++ Seq.fill(4)("b")).map((true, _)) ++
      (Seq.fill(2)("a") ++ Seq.fill(1)("b")).map((false, _))
    val d0 = ops.TextAnalysis.splitDrift(prop.toDF("is_tr", "tok"))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(d0.values.forall(_ == 0L), s"proportional split drifted: $d0")
    assert(d0.contains("__tv_total__"))
    // fully disjoint vocabularies: each token drifts 1e6, TV = (1e6+1e6)/2
    val disj = Seq((true, "only_train"), (false, "only_holdout"))
    val d1 = ops.TextAnalysis.splitDrift(disj.toDF("is_tr", "tok"))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(d1 == Map("only_train" -> 1000000L, "only_holdout" -> 1000000L,
      "__tv_total__" -> 1000000L), s"disjoint drift wrong: $d1")
  }
}
