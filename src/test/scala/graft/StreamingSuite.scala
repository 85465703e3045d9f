package graft

import graft.streaming.{Ev, Stateful, WDoc, WeightedSample}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** §2.I true-streaming semantics (SURVEY.md §5.4): MemoryStream-driven
  * micro-batches, asserting streaming results equal the batch-equivalent
  * q_stream_* queries on the same input. */
class StreamingSuite extends SparkSpec {

  private def microsOf(minute: Int): Long = {
    // 2024-01-01 00:<minute>:00 UTC in epoch micros
    (1704067200L + minute * 60L) * 1000000L
  }

  private def runStream[T](setup: MemoryStream[Ev] => org.apache.spark.sql.DataFrame,
                           batches: Seq[Seq[Ev]], mode: OutputMode): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sink = s"mem_${System.nanoTime()}"
    val q = setup(mem).writeStream.format("memory").queryName(sink)
      .outputMode(mode).start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(sink).collect().toSeq
  }

  /** Final per-user state from an Update-mode memory sink. Memory-sink
    * row order across batches is NOT a contract (and
    * monotonically_increasing_id encodes partition index, not append
    * order — ADVICE r5), so "latest" is selected by the state's own
    * monotonicity: a user re-emitted in a later batch has strictly more
    * n_events, so the max-n_events row IS the final state. */
  private def latestStatePerUser(table: String): Set[(Long, Long, Long, String)] = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"n_events".desc)
    spark.table(table)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select("user_id", "n_events", "value_c", "last_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
  }

  test("I6 stateful per-user counters: streaming final state == batch query") {
    import spark.implicits._
    val evs = Stateful.eventsDs(spark, sfDir).collect().toSeq
    val (b1, b2) = evs.splitAt(evs.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stateful.userCounters(mem.toDS())
      .map { case (u, st) => (u, st.n_events, st.value_c, st.last_type) }
      .toDF("user_id", "n_events", "value_c", "last_type")
      .writeStream.format("memory").queryName("stateful_sink")
      .outputMode(OutputMode.Update()).start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()
    val got = latestStatePerUser("stateful_sink")
    val want = ops.Streaming.qs("q_stream_stateful")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == want)
  }

  test("I6d stateful counters on the RocksDB state store == batch (off-heap state at scale)") {
    // the 100 TB posture for streaming state: keyed state lives in
    // per-partition RocksDB instances (disk-backed, off-heap) instead of
    // the executor heap — same query code, one session conf; results
    // must be bit-identical to the HDFS-backed default + batch oracle
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Stateful.eventsDs(spark, sfDir).collect().toSeq
      val (b1, b2) = evs.splitAt(evs.length / 2)
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Ev]
      val q = Stateful.userCounters(mem.toDS())
        .map { case (u, st) => (u, st.n_events, st.value_c, st.last_type) }
        .toDF("user_id", "n_events", "value_c", "last_type")
        .writeStream.format("memory").queryName("rocksdb_sink")
        .outputMode(OutputMode.Update()).start()
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      // the provider must actually be RocksDB, not a silent fallback
      val metrics = q.lastProgress.stateOperators.head.customMetrics.keySet()
      import scala.jdk.CollectionConverters._
      assert(metrics.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"state store metrics carry no rocksdb counters: $metrics")
      q.stop()
      val got = latestStatePerUser("rocksdb_sink")
      val want = ops.Streaming.qs("q_stream_stateful")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(got == want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("I6e transformWithState counters == batch (Spark 4 arbitrary-state API)") {
    // same per-user fold on the replacement for mapGroupsWithState:
    // named ValueState variables with per-variable TTL, timers, and
    // RocksDB-backed state (the operator requires that provider) — the
    // forward-looking form of §2.I6. Results must equal the batch oracle
    // for ANY micro-batch split, like every other stateful variant.
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Stateful.eventsDs(spark, sfDir).collect().toSeq
      val (b1, b2) = evs.splitAt(evs.length / 3)
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Ev]
      val q = Stateful.userCountersTws(mem.toDS())
        .map { case (u, st) => (u, st.n_events, st.value_c, st.last_type) }
        .toDF("user_id", "n_events", "value_c", "last_type")
        .writeStream.format("memory").queryName("tws_sink")
        .outputMode(OutputMode.Update()).start()
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      q.stop()
      val got = latestStatePerUser("tws_sink")
      val want = ops.Streaming.qs("q_stream_stateful")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(got == want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("I6f state survives a checkpoint restart: second query resumes counters, == batch") {
    // the recovery half of stateful processing: run 1 drains half the
    // events (AvailableNow) and stops; run 2 is a NEW query on the same
    // checkpoint that sees only the new files — its emitted counters
    // must CONTINUE from the recovered state, so the final per-user
    // fold equals the batch oracle over all events. foreachBatch is the
    // sink because memory sinks don't support checkpoint recovery.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_restart").toString
    val (src, ckpt) = (s"$base/src", s"$base/ckpt")
    val evs = Stateful.eventsDs(spark, sfDir).collect().toSeq
    val (b1, b2) = evs.zipWithIndex.partition(_._2 % 2 == 0) match {
      case (a, b) => (a.map(_._1), b.map(_._1))
    }
    val sink = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String)]
    def drain(batch: Seq[Ev]): Unit = {
      batch.toDS().write.mode("append").parquet(src)
      val q = Stateful.userCounters(
          spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
            .parquet(src).as[Ev])
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[(Long, graft.streaming.UserState)], _: Long) =>
          val rows = ds.collect().map { case (u, st) => (u, st.n_events, st.value_c, st.last_type) }
          sink.synchronized { sink ++= rows }
          ()
        }
        .start()
      q.awaitTermination()
    }
    drain(b1) // run 1: half the stream
    val afterRun1 = sink.size
    drain(b2) // run 2: fresh query, same checkpoint, only the new files
    assert(afterRun1 > 0 && sink.size > afterRun1, "both runs must emit")
    val got = sink.groupBy(_._1).map { case (u, rows) => rows.last }.toSet
    val want = ops.Streaming.qs("q_stream_stateful")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == want, "restarted query did not resume from checkpointed state")
  }

  test("I5 streaming dedup drops re-delivered event_ids across batches") {
    import spark.implicits._
    val e1 = Ev(1L, microsOf(0), 10L, "click", 100L)
    val e2 = Ev(2L, microsOf(1), 10L, "view", 200L)
    val e3 = Ev(3L, microsOf(2), 11L, "click", 300L)
    val rows = runStream(
      m => Stateful.dedupStream(m.toDS()).toDF(),
      Seq(Seq(e1, e2), Seq(e2, e3, e3)), // e2 re-delivered, e3 duplicated in-batch
      OutputMode.Append())
    assert(rows.map(_.getLong(0)).sorted == Seq(1L, 2L, 3L))
  }

  test("I5b dropDuplicatesWithinWatermark: retries with drifted timestamps dedupe") {
    // the real re-delivery shape: the retry arrives seconds later with a
    // DIFFERENT event time — plain dropDuplicates on (event_id) also
    // catches it, but only by keeping every key forever; the
    // WithinWatermark form bounds state to the watermark window
    import spark.implicits._
    val e1 = Ev(1L, microsOf(0), 10L, "click", 100L)
    val e2 = Ev(2L, microsOf(1), 10L, "view", 200L)
    val e2Retry = e2.copy(tsMicros = microsOf(1) + 5000000L) // +5s drift
    val e3 = Ev(3L, microsOf(2), 11L, "click", 300L)
    val rows = runStream(
      m => Stateful.dedupWithinWatermark(m.toDS()).toDF(),
      Seq(Seq(e1, e2), Seq(e2Retry, e3, e3)),
      OutputMode.Append())
    assert(rows.map(_.getLong(0)).sorted == Seq(1L, 2L, 3L),
      s"drifted retry not deduped or rows lost: ${rows.toSeq}")
  }

  test("I1 streaming tumbling window == batch q_stream_tumbling (AvailableNow-style drain)") {
    import spark.implicits._
    val evs = Stateful.eventsDs(spark, sfDir).collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stateful.tumblingCounts(mem.toDS())
      .writeStream.format("memory").queryName("tumbling_sink")
      .outputMode(OutputMode.Complete()).start()
    mem.addData(evs); q.processAllAvailable()
    q.stop()
    val got = spark.table("tumbling_sink")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = ops.Streaming.qs("q_stream_tumbling")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("I3 streaming session windows: closed sessions equal the batch q_stream_session rows") {
    import spark.implicits._
    val evs = Stateful.eventsDs(spark, sfDir).collect().toSeq
      .sortBy(e => (e.tsMicros, e.event_id))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDS()
      .withColumn("ts", timestamp_micros($"tsMicros"))
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"user_id", date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("session_start"), $"n")
    val q = agg.writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(evs); q.processAllAvailable()
    // flush: an event far past everything closes all sessions via watermark
    val flush = Ev(999999L, evs.map(_.tsMicros).max + 365L * 86400L * 1000000L, 999999L, "x", 0L)
    mem.addData(Seq(flush)); q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_sink")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = ops.Streaming.qs("q_stream_session")(spark, sfDir)
      .select($"user_id", $"session_start", $"n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("I6b flatMapGroupsWithState milestones: streaming emissions == batch, any batching") {
    import spark.implicits._
    val evs = Stateful.eventsDs(spark, sfDir).collect().toSeq
      .sortBy(e => (e.tsMicros, e.event_id))
    // batch truth: thresholds crossed depend only on each user's running
    // sum (order-free emission semantics), so the expected set is every
    // step multiple up to the user's total
    val want = evs.groupBy(_.user_id).iterator.flatMap { case (u, es) =>
      val total = es.map(_.valueMicros).sum
      (1L to total / Stateful.MilestoneStep).map(k => (u, k * Stateful.MilestoneStep))
    }.toSet
    // stream in 3 uneven batches — emissions must be identical (and
    // exactly-once) regardless of batching
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Stateful.milestones(mem.toDS())
      .writeStream.format("memory").queryName("milestone_sink")
      .outputMode(OutputMode.Append()).start()
    Seq(evs.take(100), evs.slice(100, 101), evs.drop(101)).foreach { b =>
      mem.addData(b); q.processAllAvailable()
    }
    q.stop()
    val emitted = spark.table("milestone_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(emitted.length == emitted.distinct.length, "duplicate milestone emissions")
    assert(emitted.toSet == want)
  }

  test("I6c state TTL: idle keys are evicted and restart from zero on return") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // NOTE: ProcessingTimeTimeout makes the engine schedule batches
    // continuously (shouldRunAnotherBatch == true), which can race
    // processAllAvailable's no-new-data latch — so this test polls the
    // sink with a bounded wait instead.
    def rows42(): Seq[(Long, Long)] = spark.table("ttl_sink")
      .filter($"user_id" === 42L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    def waitFor(n: Int): Unit = {
      val end = System.currentTimeMillis + 30000
      while (rows42().size < n && System.currentTimeMillis < end) Thread.sleep(100)
      assert(rows42().size >= n, s"sink stuck at ${rows42()} waiting for $n rows")
    }
    val mem = MemoryStream[Ev]
    val q = Stateful.userCountersWithTtl(mem.toDS(), java.time.Duration.ofMillis(200))
      .map { case (u, st) => (u, st.n_events, st.value_c) }
      .toDF("user_id", "n_events", "value_c")
      .writeStream.format("memory").queryName("ttl_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Seq(Ev(1L, microsOf(0), 42L, "a", 5L)))
      waitFor(1)
      // the TTL lapses; the continuously-scheduled batches fire the
      // timeout: one final flush emission, then eviction
      waitFor(2)
      // 42 returns after eviction: state must restart from zero
      mem.addData(Seq(Ev(3L, microsOf(2), 42L, "a", 7L)))
      waitFor(3)
    } finally q.stop()
    // first batch, timeout flush, fresh-start batch
    assert(rows42().take(3) == Seq((1L, 5L), (1L, 5L), (1L, 7L)),
      s"expected evict + restart-from-zero, got ${rows42()}")
  }

  test("I11 chained stateful operators: dedup then windowed agg in ONE streaming query") {
    // two stateful operators back-to-back (long unsupported in
    // Structured Streaming, now first-class): re-delivered events are
    // deduped by id, then tumbling-window counted — one query, one
    // checkpoint, results equal the batch form on the deduped input
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val deduped = mem.toDS().toDF()
      .withColumn("ts", expr("timestamp_micros(tsMicros)"))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val counted = deduped
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"event_type", $"n")
    val sink = s"chain_${System.nanoTime()}"
    val q = counted.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    def ev(id: Long, min: Int, typ: String) = Ev(id, microsOf(min), 1L, typ, 1L)
    // batch 1 with an internal duplicate; batch 2 re-delivers id 1 again
    mem.addData(ev(1, 0, "click"), ev(1, 0, "click"), ev(2, 5, "click"), ev(3, 12, "view"))
    q.processAllAvailable()
    mem.addData(ev(1, 0, "click"), ev(4, 14, "view"))
    q.processAllAvailable()
    // far-future event closes every earlier window through BOTH operators
    mem.addData(ev(99, 600, "click"))
    q.processAllAvailable(); q.processAllAvailable()
    q.stop()
    val got = spark.table(sink).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    val w0 = microsOf(0) / 1000; val w10 = microsOf(10) / 1000
    assert(got.contains((w0, "click", 2L)), s"dup not removed before the agg: $got")
    assert(got.contains((w10, "view", 2L)), s"second window wrong: $got")
    assert(!got.exists { case (w, t, n) => w == w0 && t == "click" && n != 2L },
      s"re-delivered id leaked through the chained dedup: $got")
  }

  test("I9b stream-stream LEFT OUTER interval join: null rows emit once the watermark passes") {
    // the hard half of stream-stream joins: an unmatched left row can
    // only emit (null-padded) when the watermark proves no future match
    // can arrive — before that it sits in state; a final far-future
    // event advances the watermark and flushes it
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchSrc = MemoryStream[Ev]
    val clickSrc = MemoryStream[Ev]
    def t(min: Int) = microsOf(min)
    val purchases = purchSrc.toDS().toDF()
      .withColumn("purchase_ts", expr("timestamp_micros(tsMicros)"))
      .select($"user_id", $"event_id".as("purchase_id"), $"purchase_ts")
      .withWatermark("purchase_ts", "10 minutes")
    val clicks = clickSrc.toDS().toDF()
      .withColumn("click_ts", expr("timestamp_micros(tsMicros)"))
      .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"click_ts")
      .withWatermark("click_ts", "10 minutes")
    val joined = purchases.join(clicks,
      $"user_id" === $"c_user" &&
        $"click_ts" <= $"purchase_ts" &&
        $"click_ts" >= $"purchase_ts" - expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select($"purchase_id", $"click_id")
    val sink = s"ssoj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    // purchase 100 (user 1) has a click 10 min before; purchase 200
    // (user 2) has NO click in window
    purchSrc.addData(Ev(100L, t(40), 1L, "purchase", 5L), Ev(200L, t(40), 2L, "purchase", 5L))
    clickSrc.addData(Ev(300L, t(30), 1L, "click", 1L))
    q.processAllAvailable()
    val early = spark.table(sink).collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(early == Set((100L, Some(300L))),
      s"only the matched pair may emit before the watermark: $early")
    // far-future traffic on BOTH streams pushes the watermark past
    // purchase 200's match window → its null row must flush
    purchSrc.addData(Ev(900L, t(600), 9L, "purchase", 1L))
    clickSrc.addData(Ev(901L, t(600), 9L, "click", 1L))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    val all = spark.table(sink).collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(all.contains((200L, None)),
      s"unmatched purchase never flushed with nulls after watermark: $all")
    assert(all.contains((100L, Some(300L))))
  }

  test("I9c stream-stream FULL OUTER interval join: both sides' unmatched rows flush") {
    // the symmetric completion of I9b: unmatched rows on EITHER side
    // emit null-padded once the watermark proves no future match — a
    // purchase with no click AND a click with no purchase both flush
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchSrc = MemoryStream[Ev]
    val clickSrc = MemoryStream[Ev]
    def t(min: Int) = microsOf(min)
    val purchases = purchSrc.toDS().toDF()
      .withColumn("purchase_ts", expr("timestamp_micros(tsMicros)"))
      .select($"user_id", $"event_id".as("purchase_id"), $"purchase_ts")
      .withWatermark("purchase_ts", "10 minutes")
    val clicks = clickSrc.toDS().toDF()
      .withColumn("click_ts", expr("timestamp_micros(tsMicros)"))
      .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"click_ts")
      .withWatermark("click_ts", "10 minutes")
    val joined = purchases.join(clicks,
      $"user_id" === $"c_user" &&
        $"click_ts" <= $"purchase_ts" &&
        $"click_ts" >= $"purchase_ts" - expr("INTERVAL 30 MINUTES"),
      "full_outer")
      .select($"purchase_id", $"click_id")
    val sink = s"ssfoj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    // user 1: matched pair; user 2: purchase with no click;
    // user 3: click with no purchase
    purchSrc.addData(Ev(100L, t(40), 1L, "purchase", 5L), Ev(200L, t(40), 2L, "purchase", 5L))
    clickSrc.addData(Ev(300L, t(30), 1L, "click", 1L), Ev(400L, t(30), 3L, "click", 1L))
    q.processAllAvailable()
    // far-future traffic on both streams pushes the watermark past every
    // pending match window → both unmatched rows must flush null-padded
    purchSrc.addData(Ev(900L, t(600), 9L, "purchase", 1L))
    clickSrc.addData(Ev(901L, t(600), 9L, "click", 1L))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    val all = spark.table(sink).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(all.contains((Some(100L), Some(300L))), s"matched pair missing: $all")
    assert(all.contains((Some(200L), None)), s"unmatched purchase never flushed: $all")
    assert(all.contains((None, Some(400L))), s"unmatched click never flushed: $all")
  }

  test("I9 stream-stream interval join: two watermarked streams == batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two INDEPENDENT streams (clicks, purchases) — the real two-source
    // shape, not a split of one stream inside the plan
    val clicksSrc = MemoryStream[Ev]
    val purchSrc = MemoryStream[Ev]
    val clicks = clicksSrc.toDS().toDF()
      .withColumn("click_ts", expr("timestamp_micros(tsMicros)"))
      .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"click_ts")
      .withWatermark("click_ts", "2 hours")
    val purchases = purchSrc.toDS().toDF()
      .withColumn("purchase_ts", expr("timestamp_micros(tsMicros)"))
      .select($"user_id", $"event_id".as("purchase_id"), $"purchase_ts")
      .withWatermark("purchase_ts", "2 hours")
    // interval condition bounds the join state: a click older than
    // (watermark - 1 hour) can never match a future purchase → evicted
    val joined = purchases.join(clicks,
      $"user_id" === $"c_user" &&
        $"click_ts" <= $"purchase_ts" &&
        $"click_ts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"))
      .select($"user_id", $"purchase_id", $"click_id")
    val sink = s"ssj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    // feed both streams in event-time order across batches (watermark 2h
    // > join window 1h, so no true match is ever state-evicted early)
    val evs = Stateful.eventsDs(spark, sfDir).collect().toSeq.sortBy(_.tsMicros)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    Seq(b1, b2).foreach { b =>
      clicksSrc.addData(b.filter(_.event_type == "click"))
      purchSrc.addData(b.filter(_.event_type == "purchase"))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = Tables.events(spark, sfDir)
    val want = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("pts"))
      .join(e.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"event_id".as("click_id"), $"ts".as("cts")),
        $"user_id" === $"cu" && $"cts" <= $"pts" &&
          $"cts" >= $"pts" - expr("INTERVAL 1 HOUR"))
      .select($"user_id", $"purchase_id", $"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"stream-stream join diverged from batch: missing=${want -- got} extra=${got -- want}")
  }

  test("I10 stream-static join: broadcast dim enriches the stream, plan stays BHJ") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static category dim (the streaming analogue of q_topic_alias's
    // config-dim enrichment — at scale the dim is re-broadcast per
    // micro-batch, never shuffled against the unbounded side)
    val dim = Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "conversion"), ("signup", "conversion"),
      ("error", "ops")).toDF("event_type", "category")
    val evs = Stateful.eventsDs(spark, sfDir).collect().toSeq
    val mem = MemoryStream[Ev]
    val joined = mem.toDS().toDF()
      .join(broadcast(dim), Seq("event_type"), "left")
      .groupBy($"category").agg(count(lit(1)).as("n"), sum($"valueMicros").as("v"))
    val q = joined.writeStream.format("memory").queryName("ss_join_sink")
      .outputMode(OutputMode.Complete()).start()
    mem.addData(evs); q.processAllAvailable()
    // BHJ pin on the micro-batch plan: the static side must broadcast
    val lastPlan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    q.stop()
    assert(lastPlan.contains("BroadcastHashJoin"),
      s"static dim not broadcast in micro-batch plan:\n$lastPlan")
    val got = spark.table("ss_join_sink")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    val want = Stateful.eventsDs(spark, sfDir).toDF()
      .join(broadcast(dim), Seq("event_type"), "left")
      .groupBy($"category").agg(count(lit(1)).as("n"), sum($"valueMicros").as("v"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("I7 manifest sink: batch replay is idempotent, uncommitted batches invisible") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = mem.toDS().toDF()
      .writeStream
      .foreachBatch(streaming.ManifestSink.write(root) _)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    mem.addData(Seq(Ev(1, microsOf(0), 1, "a", 10), Ev(2, microsOf(1), 1, "b", 20)))
    q.processAllAvailable()
    mem.addData(Seq(Ev(3, microsOf(2), 2, "c", 30)))
    q.processAllAvailable()
    q.stop()
    assert(streaming.ManifestSink.read(spark, root).count() == 3)
    // replay batch 0 (≙ restart between sink write and checkpoint commit)
    val replay = Seq(Ev(1, microsOf(0), 1, "a", 10), Ev(2, microsOf(1), 1, "b", 20))
      .toDF()
    streaming.ManifestSink.write(root)(replay, 0L)
    assert(streaming.ManifestSink.read(spark, root).count() == 3) // unchanged
    // an uncommitted directory (no manifest) is invisible to readers
    replay.write.mode("overwrite").parquet(s"$root/batch=99")
    assert(streaming.ManifestSink.read(spark, root).count() == 3)
    // compacted manifest: ONE append-log regardless of batch count, not
    // one file per batch (metadata bottleneck at ~1e5 batches)
    val mfiles = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/_manifests"))
    try assert(mfiles.toArray.toList.map(_.toString.split('/').last) == List("commits.log"))
    finally mfiles.close()
    assert(streaming.ManifestSink.committed(root).keySet == Set(0L, 1L))
    // torn tail shape 1: "99\t" (no dir, no newline) — ignored
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/_manifests/commits.log"),
      "99\t".getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
    assert(streaming.ManifestSink.committed(root).keySet == Set(0L, 1L))
    assert(streaming.ManifestSink.read(spark, root).count() == 3)
    // torn tail shape 2 (the dangerous one): "12\t$root/batch=1" — a
    // mid-append crash truncating "batch=12" to "batch=1" still parses
    // as (id, dir) but would alias batch 12 onto batch 1's existing
    // directory and DOUBLE-READ it. Rejected: dir must be the writer's
    // canonical "$root/batch=$id". (Written newline-terminated so it
    // survives the unterminated-tail drop and exercises the dir check.)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/_manifests/commits.log"),
      s"\n12\t$root/batch=1\n".getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
    assert(streaming.ManifestSink.committed(root).keySet == Set(0L, 1L),
      "truncated-dir tear must not alias another batch's directory")
    assert(streaming.ManifestSink.read(spark, root).count() == 3)
    // torn tail shape 3: a complete-LOOKING line with no trailing newline
    // ("7\t$root/batch=7" could still be a torn "7\t$root/batch=70\n"):
    // an unterminated final line is never a completed append — dropped
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/_manifests/commits.log"),
      s"7\t$root/batch=7".getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
    assert(streaming.ManifestSink.committed(root).keySet == Set(0L, 1L),
      "unterminated tail line must be dropped even if it parses")
  }

  test("I8 rate source: built-in streaming source drives a windowed count") {
    import spark.implicits._
    val q = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
      .groupBy(window($"timestamp", "1 second"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("rate_sink")
      .outputMode(OutputMode.Complete()).start()
    try {
      var tries = 0
      while (spark.table("rate_sink").isEmpty && tries < 50) {
        q.processAllAvailable(); Thread.sleep(100); tries += 1
      }
      assert(spark.table("rate_sink").count() > 0)
    } finally q.stop()
  }

  test("I4 watermark: events later than 30min behind max ts are dropped from append agg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDS()
      .withColumn("ts", timestamp_micros($"tsMicros"))
      .withWatermark("ts", "30 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(date_format($"w.start", "HH:mm").as("w_start"), $"n")
    val q = agg.writeStream.format("memory").queryName("wm_sink")
      .outputMode(OutputMode.Append()).start()
    // batch 1: events at minute 0 and 5 (window 00:00); advance max ts to minute 60
    mem.addData(Seq(Ev(1, microsOf(0), 1, "a", 0), Ev(2, microsOf(5), 1, "a", 0),
      Ev(3, microsOf(60), 1, "a", 0)))
    q.processAllAvailable()
    // batch 2: a late event at minute 2 — watermark is 60-30=30min > window end 10min ⇒ dropped
    mem.addData(Seq(Ev(4, microsOf(2), 1, "a", 0)))
    q.processAllAvailable()
    // batch 3: push watermark past minute 70 to flush remaining windows
    mem.addData(Seq(Ev(5, microsOf(120), 1, "a", 0)))
    q.processAllAvailable()
    q.stop()
    val byWindow = spark.table("wm_sink").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byWindow("00:00") == 2L) // late event 4 NOT counted
  }

  test("L42 streaming A-ES sampler: stream-accumulated top-K == batch, any split") {
    // VERDICT r9 #7: per-batch weighted sampling with carried state —
    // the A-ES keys are pure functions of (doc_id, w), so union of
    // per-batch top-Ks then top-K must equal the one-shot batch draw;
    // a re-delivered doc (at-least-once source) must change nothing.
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = WeightedSample.prep(Tables.documents(spark, sfDir)).collect().toSeq
      val thirds = all.grouped(math.max(1, all.size / 3 + 1)).toSeq
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[WDoc]
      val q = WeightedSample.topKStream(mem.toDS())
        .writeStream.format("memory").queryName("wsamp_sink")
        .outputMode(OutputMode.Update()).start()
      thirds.foreach { b => mem.addData(b); q.processAllAvailable() }
      // duplicate re-delivery of the first batch: the SAMPLE is unchanged
      // (emit_seq advances — it counts deliveries, not distinct docs)
      mem.addData(thirds.head); q.processAllAvailable()
      q.stop()
      // latest snapshot per lang = rows carrying that lang's max emit_seq
      val got = spark.table("wsamp_sink")
        .withColumn("mx", max($"emit_seq").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"lang")))
        .filter($"emit_seq" === $"mx")
        .select($"lang", $"rk", $"doc_id", $"w", $"key_micros")
        .collect().map(_.toString).sorted.toSeq
      val want = ops.TextAnalysis.qs("q_sample_weighted")(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      assert(want.nonEmpty && got == want,
        s"stream sample diverged: ${got.diff(want)} vs ${want.diff(got)}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
