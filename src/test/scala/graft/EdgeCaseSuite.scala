package graft

import org.apache.spark.sql.functions._

/** Degenerate-input robustness (the r3-ADVICE bug class): Spark's
  * sequence(a, b) steps DOWNWARD when b < a, so unguarded n-gram
  * expressions either throw (element_at/slice index 0) or emit spurious
  * grams on docs shorter than the gram width — while the DuckDB oracle's
  * range()/list_slice() are empty for the same doc. Every documents-table
  * query must survive a corpus of 0–6-token docs and treat short docs as
  * gram-less, exactly like the oracle. */
class EdgeCaseSuite extends SparkSpec {

  /** Tiny corpus: empty text, 1/2/4/6-token docs, plus two long near-dup
    * docs so pair-producing ops still exercise their join path. */
  private lazy val shortDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_short_docs_").toString
    val long1 = (1 to 30).map(i => s"tok$i").mkString(" ")
    val long2 = (1 to 30).map(i => if (i == 30) "tokX" else s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, "", "en", "web"),
      (2L, "one", "en", "web"),
      (3L, "two words", "fr", "web"),
      (4L, "four tiny words here", "de", "news"),
      (5L, "six little words sit right here", "es", "news"),
      (6L, long1, "en", "web"),
      (7L, long2, "zh", "web"),
      (17L, long1, "en", "web")) // doc_id%10=7 → lands in the decontaminate eval slice
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val documentQueries = Seq(
    "q_sim_jaccard", "q_text_bigrams", "q_text_tokens", "q_text_quality",
    "q_text_langid", "q_text_scrub", "q_text_fingerprint", "q_text_repetition",
    "q_text_tfidf", "q_text_bpe", "q_decontaminate", "q_dedup_exact",
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram", "q_dedup_cluster",
    "q_sample_hash", "q_sample_mixture", "q_pipeline_curate", "q_text_sentiment",
    "q_split_train", "q_text_pii", "q_url_domains", "q_text_perplexity",
    "q_dedup_lines", "q_pipeline_curate2", "q_pipeline_curate_incr",
    "q_decontaminate_fuzzy")

  test("every documents-table query survives a corpus of 0–6-token docs") {
    documentQueries.foreach { key =>
      val rows =
        try SparkEntry.queries(key)(spark, shortDir).collect()
        catch { case e: Throwable =>
          fail(s"$key threw on short docs: ${e.getMessage.take(300)}")
        }
      assert(rows != null, key)
    }
  }

  test("short docs are gram-less: no near-dup pair or fingerprint involves them") {
    // 3-gram pair ops can only ever pair the two long docs (+ the exact
    // duplicate), never a doc with < 3 tokens
    val jac = SparkEntry.queries("q_sim_jaccard")(spark, shortDir).collect()
    jac.foreach { r =>
      assert(Set(6L, 7L, 17L).contains(r.getLong(0)) && Set(6L, 7L, 17L).contains(r.getLong(1)),
        s"short doc leaked into a shingle pair: $r")
    }
    // the 30-token near-dups MUST still be found (guards didn't over-drop)
    assert(jac.nonEmpty, "long near-dup pair lost by the short-doc guards")
    // fingerprint: docs under 8 tokens yield NULL, long docs a real value
    val fp = SparkEntry.queries("q_text_fingerprint")(spark, shortDir).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fp(2L).isEmpty && fp(3L).isEmpty && fp(4L).isEmpty)
    assert(fp(6L).nonEmpty && fp(7L).nonEmpty)
  }

  test("bpe training: corpus with fewer learnable merges than rounds degrades cleanly") {
    import spark.implicits._
    // one word 'ab' ⇒ round 1 learns (a,b), rounds 2-3 find no adjacent
    // pair anywhere: the query must emit the merges that EXIST (1 row),
    // not fail or fabricate — and the dict must stay intact through the
    // no-op rounds (an empty best crossJoined in must not wipe it)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_edge_").toString
    Seq((1L, "ab ab", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_text_bpe_train")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toList
    assert(got == List((1L, "a", "b", 2L)), s"got $got")
  }

  test("sessionize: exactly-1800s gaps stay in-session; strict gaps split; singletons session 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ts(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000L)
    // user 1: 0s, +1800s (boundary — SAME session), +3601s (strict gap — new)
    // user 2: single event
    Seq(
      (1L, ts(0L), 1L, "click", 1.0, "{}"),
      (2L, ts(1800L), 1L, "view", 1.0, "{}"),
      (3L, ts(1800L + 1801L), 1L, "purchase", 1.0, "{}"),
      (4L, ts(0L), 2L, "signup", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_sessionize")(spark, dir)
      .select($"user_id", $"session_id", $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)), s"got $got")
  }

  test("resample: a user with one event yields exactly one grid hour, n=1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_grid1_").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 10:42:17"), 9L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_resample_gapfill")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List((9L, "2024-03-01 10:00:00", 1L, 1500000L)), s"got $got")
  }

  test("resample: densification guard fails loudly past the 3-year span envelope") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gridwide_").toString
    // user 7: two events 4 years apart — 35k hourly buckets from 2 rows
    // is an upstream data bug (stale clock / epoch-zero ts), and the
    // operator's users×span-hours cost envelope is void; it must refuse,
    // not silently densify. user 8 in-envelope as the control.
    Seq(
      (1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "view", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 8L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("q_resample_gapfill")(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("resample span exceeds")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
  }

  test("k-means / semdedup: corpus smaller than the seed count still partitions fully") {
    import spark.implicits._
    // 3 vectors, 8 requested seeds: every vector is its own seed/cluster
    val m = Seq(
      (0L, Array(10000000L, 0L, 0L)),
      (1L, Array(0L, 10000000L, 0L)),
      (2L, Array(0L, 0L, 10000000L)))
      .toDF("vec_id", "v")
      .withColumn("n2", graft.functions.DotL.dot(col("v"), col("v")))
    val asg = ops.Similarity.seedAssign(m, 8)
      .select(col("vec_id"), col("cl")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg == Map(0L -> 0L, 1L -> 1L, 2L -> 2L), s"got $asg")
  }

  test("momentSums envelope guard: wrap-risk partition fails loudly, not silently") {
    import spark.implicits._
    // 2 rows × |y| = 2^31−1000 in ONE partition: the partials still fit
    // int64 (Σy² ≈ 2^62.9996, no ANSI overflow yet — with ANSI disabled
    // one more row would wrap SILENTLY), but the envelope check
    // log2(2) + 2·log2(y) ≈ 63.0 ≥ 62.9 must fail the job loudly first
    val big = Seq.fill(2)(("A", 1L, (1L << 31) - 1000L)).toDF("l_returnflag", "x", "y").coalesce(1)
    val e = intercept[Throwable] { ops.Aggregates.momentSums(big).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("momentSums exactness envelope")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
    // and a same-shape input inside the envelope still yields exact moments
    val ok = Seq.fill(4)(("A", 2L, 3L)).toDF("l_returnflag", "x", "y").coalesce(1)
    val r = ops.Aggregates.momentSums(ok).collect().head
    assert(r.getAs[java.math.BigDecimal]("syy").longValueExact() == 36L)
  }
}
