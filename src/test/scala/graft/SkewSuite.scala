package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: at 100 TB a hot key turns one shuffle
  * partition into a straggler that runs for hours; Spark's adaptive
  * skew-join split detects the oversized partition at runtime and fans
  * it out across tasks. This suite pins that the feature actually
  * engages on a skewed join under thresholds scaled to the test data —
  * the complement of BucketingSuite's manual salting path. */
class SkewSuite extends SparkSpec {

  test("AQE splits the skewed partition of a hot-key shuffle join") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // keep it a shuffle join
      // scale the skew thresholds down to test-data sizes: a partition
      // is "skewed" past 64KB and 2x the median, split to ~16KB targets
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 200k-row fact where 95% of rows share ONE join key (the whale),
      // joined to a 1k-row build side with matching keys
      val fact = spark.range(200000)
        .select((when($"id" % 20 =!= 0, lit(0L)).otherwise($"id" % 1000)).as("k"),
          concat(lit("payload-padding-padding-padding-"), $"id").as("pad"))
      val dim = spark.range(1000).select($"id".as("k"), ($"id" * 7).as("w"))
      // keep the wide payload column flowing through the shuffle so the
      // hot key's partition is genuinely oversized, not pruned to longs
      val joined = fact.join(dim, "k")
        .groupBy(($"k" % 10).as("g"))
        .agg(count(lit(1)).as("n"), sum(length($"pad")).as("chars"), sum($"w").as("ws"))
      joined.collect() // finalize the adaptive plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"AQE did not mark/split the skewed join partition in:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // planted whale: 120k rows, ~92% on ONE window key, secs spanning a day
  // (24 hour-chunks), values with heavy ties so rank semantics are exercised
  private def whaleEvents = {
    import spark.implicits._
    spark.range(120000).select(
      $"id",
      when($"id" % 12 === 0, concat(lit("t"), $"id" % 4)).otherwise(lit("whale"))
        .as("event_type"),
      ($"id" * 31 % 86400).cast("long").as("sec"),
      ($"id" % 97).cast("long").as("value"))
  }

  test("salted two-pass RANGE window == naive window on a whale key, sort fans out") {
    import spark.implicits._
    val df = whaleEvents
    val naiveW = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"sec").rangeBetween(-3599, 0)
    val naive = df.select($"id",
      sum($"value").over(naiveW).as("trailing_c"),
      count(lit(1)).over(naiveW).as("trailing_n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val saltedDf = ops.Windows.saltedTrailingRange(df, "event_type", "sec", $"value", 3600L)
    val salted = saltedDf.select($"id", $"trailing_c", $"trailing_n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted.length == naive.length)
    assert(salted.sameElements(naive), "salted RANGE window diverged from the naive window")
    // the sort partitioning must carry the chunk: whale alone fans out
    // 24-way (one per hour) instead of one giant partition
    val plan = saltedDf.queryExecution.executedPlan.toString
    assert(plan.contains("_chunk"), s"salted plan does not partition by chunk:\n$plan")
    val fanout = df.withColumn("_chunk", floor($"sec" / 3600))
      .select($"event_type", $"_chunk").distinct().count()
    assert(fanout > 5, s"expected >5-way window parallelism, got $fanout")
  }

  test("salted two-pass rank keeps NULL keys and values (null-safe join-back)") {
    import spark.implicits._
    // rows with NULL value and NULL key are legal window inputs: the
    // naive rank() keeps them (nulls sort last under desc; a NULL key is
    // its own partition) — the salted join-back must not drop them
    val df = spark.range(100).select(
      $"id",
      when($"id" % 10 === 0, lit(null)).otherwise(concat(lit("k"), $"id" % 3)).as("k"),
      when($"id" % 7 === 0, lit(null)).otherwise($"id" % 13).as("v"))
    val tie = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"v".desc)
    val naive = df.select($"id",
      rank().over(tie).cast("long").as("rnk"),
      dense_rank().over(tie).cast("long").as("drnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val salted = ops.Windows.saltedRank(df, "k", "v")
      .select($"id", $"rnk", $"drnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted.length == naive.length,
      s"null rows dropped: salted ${salted.length} vs naive ${naive.length}")
    assert(salted.sameElements(naive), "salted rank diverged from naive on a null-bearing input")
  }

  test("salted two-pass rank == naive rank/dense_rank on a whale key") {
    import spark.implicits._
    val df = whaleEvents
    val tie = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"value".desc)
    val naive = df.select($"id",
      rank().over(tie).cast("long").as("rnk"),
      dense_rank().over(tie).cast("long").as("drnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val salted = ops.Windows.saltedRank(df, "event_type", "value")
      .select($"id", $"rnk", $"drnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted.length == naive.length)
    assert(salted.sameElements(naive), "salted rank diverged from rank()/dense_rank()")
  }

  // J6 hot-shingle hardening: a boilerplate shingle planted in 30%+ of
  // the corpus must NOT mint d²/2 candidate pairs. Prefix filtering
  // ranks shingles by rarity; the boilerplate sorts last and falls out
  // of every doc's prefix, so candidates stay ∝ docs — while the final
  // pair set remains EXACTLY the brute all-shared-shingle answer.
  test("jaccard prefix filter: planted boilerplate yields ~linear candidates, exact pairs") {
    import spark.implicits._
    def corpus(n: Int) = {
      // each doc: 17 unique shingles + the same 3 boilerplate shingles
      // (every 1 in 3 docs), plus 30 near-dup clones of doc 0 so the
      // exact-pair answer is non-trivial
      val base = spark.range(n).select(
        $"id".as("doc_id"),
        expr("""concat(
          transform(sequence(1, 17), i -> concat('u', id, '_', i)),
          CASE WHEN id % 3 = 0 THEN array('bp1', 'bp2', 'bp3') ELSE array() END,
          CASE WHEN id < 31 THEN transform(sequence(1, 15), i -> concat('dup_', i)) ELSE array() END
        )""").as("ss"))
      base.select($"doc_id", explode($"ss").as("s"))
        .select($"doc_id", U.h64($"s").as("sh"))
    }
    val sh = corpus(900).cache()
    try {
      // candidate volume: brute blocking pairs every 2 of the 300
      // boilerplate docs (300·299/2 ≈ 45k); the prefix filter must stay
      // ∝ docs (the 31 planted dups pair among themselves: ~465 + slack)
      val cands = ops.TextOps.jaccardCandidates(sh, 0.2).count()
      assert(cands < 3 * 900,
        s"prefix filter leaked hot-shingle candidates: $cands pairs for 900 docs")
      // exactness: prefix-filtered pairs == brute shared-shingle pairs
      val got = ops.TextOps.jaccardPairs(sh, 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      val brute = sh.as("a").join(sh.as("b"), $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .agg(count(lit(1)).as("n_inter"))
        .join(sizes.select($"doc_id".as("d1"), $"n_sh".as("n1")), "d1")
        .join(sizes.select($"doc_id".as("d2"), $"n_sh".as("n2")), "d2")
        .withColumn("jac", round($"n_inter".cast("double") / ($"n1" + $"n2" - $"n_inter"), 6))
        .filter($"jac" >= 0.2)
        .select($"d1", $"d2", $"jac")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(brute.nonEmpty, "test corpus produced no near-dup pairs — check the fixture")
      assert(got.sameElements(brute),
        s"prefix-filtered pairs diverged from brute: got ${got.length}, brute ${brute.length}")
    } finally sh.unpersist()
  }

  test("C13 saltedJoin: row-identical to the plain join, whale key fans out across partitions") {
    import spark.implicits._
    // 100k-row fact with 50% of rows on ONE key, dim keyed 0..999 — the
    // both-sides-large regime where broadcast is off the table and a
    // plain shuffle join serializes the whale into one task
    val fact = spark.range(100000).select(
      $"id",
      when($"id" % 2 === 0, lit(0L)).otherwise($"id" % 1000).as("k"),
      ($"id" % 1013).as("v"))
    val dim = spark.range(1000).select($"id".as("k"), ($"id" * 7 + 3).as("w"))
    val nSalt = 16
    // AQE would coalesce these tiny post-shuffle partitions into one,
    // hiding the fan-out the assertion below measures; at real scale the
    // partitions are nowhere near coalescible
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val savedCoalesce = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
    val salted = ops.Relational.saltedJoin(fact, dim, "k", $"id", nSalt)
    // same merge hint as the helper so the comparison is shuffle-join vs
    // shuffle-join (an auto-broadcast plain join would never shuffle at
    // this size, which isn't the regime the helper targets)
    val plain = fact.join(dim.hint("merge"), "k")
    // row-identical output: order-free checksum over every column
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.select(U.h64(concat_ws("|", $"id", $"k", $"v", $"w")).as("hh"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(hh)").as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(sig(salted) == sig(plain),
      "salted join output differs from the plain join")
    // physical effect: the whale key's joined rows must span many output
    // partitions (the plain shuffle join pins them all to one task)
    val spread = salted.filter($"k" === 0L)
      .select(spark_partition_id().as("p")).distinct().count()
    // the fan-out ceiling is min(nSalt, shuffle partitions) — the test
    // session runs with few shuffle partitions, a cluster has hundreds
    val ceiling = math.min(nSalt,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    assert(spread > ceiling / 2,
      s"whale key landed in only $spread of $ceiling reachable partitions (nSalt=$nSalt)")
    val plainSpread = plain.filter($"k" === 0L)
      .select(spark_partition_id().as("p")).distinct().count()
    assert(plainSpread <= 2,
      s"test no longer exercises the regime: plain join already spreads the whale ($plainSpread partitions)")
    } finally savedCoalesce match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
  }

  test("L34 SemDeDup: scaling K with the corpus keeps pair work ~linear") {
    import spark.implicits._
    // The within-cluster sweep is Σ|c|² — quadratic if K is held fixed
    // while N grows. The operating rule on the §2.L34 row is K ∝ N; this
    // pins it with data: a 4× corpus (deterministically perturbed copies,
    // so new points spread rather than stack) at 4× the seeds must cost
    // at most ~linearly more pair work, while the same corpus at the
    // ORIGINAL K must cost markedly more.
    val base = ops.Similarity.scaledVectors(Tables.embeddings(spark, sfDir))
    val n = base.count()
    val big = (0 until 4).map { c =>
      base.select(($"vec_id" + lit(c * n)).as("vec_id"),
        expr(s"transform(v, (x, i) -> x + cast((vec_id * 7 + i * 13 + $c * 101) % 2000001 - 1000000 as bigint))").as("v"))
    }.reduce(_ union _)
      .withColumn("n2", graft.functions.DotL.dot($"v", $"v"))
    def pairWork(m: org.apache.spark.sql.DataFrame, k: Int): Long =
      ops.Similarity.seedAssign(m, k).groupBy($"cl").count()
        .collect().map { r => val c = r.getLong(1); c * (c - 1) / 2 }.sum
    val w1 = pairWork(base, 8)
    val wScaled = pairWork(big, 32)
    val wFixed = pairWork(big, 8)
    assert(wScaled <= 8 * w1, // 4× data, ≤ 2× per-row slack
      s"K∝N pair work not ~linear: base=$w1 scaled=$wScaled")
    assert(wFixed > 2 * wScaled,
      s"fixed-K should be markedly worse (fixed=$wFixed scaled=$wScaled) — test data no longer exercises the regime")
  }
}
