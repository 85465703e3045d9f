package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental daily curation (q_pipeline_curate_incr): the merge must be
  * lossless (any slicing == full recompute; the oracle checks 3-day vs
  * DuckDB, here we check alternate slicings against each other) and the
  * day-N run must read ONLY the day-N slice + the previous partials —
  * asserted via task input-bytes metrics, the 100 TB contract. */
class CurateIncrSuite extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  test("incremental 3-day == one-shot (single day) == 5-day") {
    val one = ops.CurateIncr.incremental(spark, sfDir, 1)
    val three = ops.CurateIncr.incremental(spark, sfDir, 3)
    val five = ops.CurateIncr.incremental(spark, sfDir, 5)
    val c1 = canon(one)
    assert(c1.nonEmpty)
    assert(c1 == canon(three) && c1 == canon(five))
  }

  test("report invariant to slice arrival order") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val slices = Seq(0L, 1L, 2L).map(k => docs.filter(pmod($"doc_id", lit(3L)) === k))
    val state = ops.CurateIncr.newStateDir()
    // feed slices in the order 2, 0, 1 — merge commutativity means the
    // final report must equal the in-order (and full-recompute) result
    Seq(2, 0, 1).zipWithIndex.foreach { case (k, day) =>
      ops.CurateIncr.runDay(spark, slices(k), state, day)
    }
    val shuffled = ops.CurateIncr.report(spark, state, 2)
    assert(canon(shuffled) == canon(ops.CurateIncr.incremental(spark, sfDir, 1)))
  }

  test("day-2 run reads only the day-2 slice + partials (input-bytes bound)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("curate_incr_bytes_").toString
    // land the three day slices as separate parquet dirs, like a daily feed
    (0 to 2).foreach { k =>
      docs.filter(pmod($"doc_id", lit(3L)) === k)
        .write.mode("overwrite").parquet(s"$root/slice$k")
    }
    val state = s"$root/state"
    ops.CurateIncr.runDayPath(spark, s"$root/slice0", state, 0)
    ops.CurateIncr.runDayPath(spark, s"$root/slice1", state, 1)

    def dirBytes(p: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    val inputBudget = dirBytes(s"$root/slice2") + dirBytes(s"$state/v1")
    val historyBytes = dirBytes(s"$root/slice0") + dirBytes(s"$root/slice1")

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      ops.CurateIncr.runDayPath(spark, s"$root/slice2", state, 2)
      org.apache.spark.sql.graftshim.GraftShim.drainListenerBus(spark)
    } finally spark.sparkContext.removeSparkListener(listener)

    val read = bytesRead.get()
    assert(read > 0, "listener saw no input")
    // history is never rescanned: the run's total input is bounded by its
    // declared inputs (slice-2 + v1 partials), nowhere near inputs+history
    assert(read <= (inputBudget * 1.5).toLong + (64 << 10),
      s"day-2 read $read bytes; declared inputs $inputBudget (history $historyBytes)")
    // and the report from v2 matches the full recompute
    assert(canon(ops.CurateIncr.report(spark, state, 2)) ==
      canon(ops.CurateIncr.incremental(spark, sfDir, 1)))
  }

  test("streaming inbox drives the daily fold; restart processes only new slices") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("curate_incr_stream_").toString
    val inbox = s"$root/inbox"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    val docs = Tables.documents(spark, sfDir)
    def landSlice(k: Long, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      docs.filter(pmod($"doc_id", lit(4L)) === k).coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inbox/$name.parquet"))
    }
    Seq(0L, 1L, 2L).foreach(k => landSlice(k, s"day$k"))
    val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    val v1 = streaming.CurateIncrStream.drainInbox(spark, inbox, state, ckpt)
    assert(v1 == 2, s"expected 3 one-file micro-batches -> v2, got v$v1")
    // report over the 3 landed slices == a one-shot fold of the same subset
    val refState = ops.CurateIncr.newStateDir()
    ops.CurateIncr.runDay(spark, docs.filter(pmod($"doc_id", lit(4L)) < 3), refState, 0)
    assert(canon(ops.CurateIncr.report(spark, state, v1)) ==
      canon(ops.CurateIncr.report(spark, refState, 0)))
    // day 3 lands; a RESTARTED drain with the same checkpoint must fold
    // only the new slice (batch ids continue) and reach the full corpus
    landSlice(3L, "day3")
    val v2 = streaming.CurateIncrStream.drainInbox(spark, inbox, state, ckpt)
    assert(v2 == 3, s"restart should process exactly the new slice -> v3, got v$v2")
    assert(canon(ops.CurateIncr.report(spark, state, v2)) ==
      canon(ops.CurateIncr.incremental(spark, sfDir, 1)))
    // a drain with NOTHING new is a no-op that still reports the current version
    assert(streaming.CurateIncrStream.drainInbox(spark, inbox, state, ckpt) == 3)
  }

  test("bucketed state backend: same report, state side never re-shuffled") {
    import spark.implicits._
    val prefix = "curate_b_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = java.nio.file.Files.createTempDirectory("curate_b_wh_").toString
    val docs = Tables.documents(spark, sfDir)
    try {
      (0 until 3).foreach { day =>
        ops.CurateIncr.runDayBucketed(spark,
          docs.filter(pmod($"doc_id", lit(3L)) === day), prefix, wh, day)
      }
      // result parity with the parquet backend / full recompute
      assert(canon(ops.CurateIncr.reportBucketed(spark, prefix, 2)) ==
        canon(ops.CurateIncr.incremental(spark, sfDir, 1)))
      // plan pin — THE point of the backend: in the day-3 merge the
      // bucketed state scan already satisfies the join partitioning, so
      // the ONLY hash exchange on the merge key belongs to the day
      // slice's partials; a second one means state bytes crossed the
      // wire (the daily full-state shuffle this backend exists to kill)
      val dayP = ops.CurateIncr.dayPartials(
        docs.filter(pmod($"doc_id", lit(3L)) === 0))
      val (md5M, lineM, _) = ops.CurateIncr.mergedBucketed(spark, prefix, 3, dayP)
      Seq("k_md5" -> md5M, "line" -> lineM).foreach { case (key, df) =>
        val plan = df.queryExecution.executedPlan.toString
        // the state table is the join's FIRST child: everything between
        // the join node and its bucketed FileScan must be exchange-free
        // (the day-partial side may shuffle — that's its own aggregation)
        val lines = plan.linesIterator.toSeq
        val joinIdx = lines.indexWhere(l =>
          l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        val scanIdx = lines.indexWhere(_.contains("Bucketed: true"))
        assert(joinIdx >= 0 && scanIdx > joinIdx,
          s"merge on $key lost its bucketed state scan:\n$plan")
        assert(!lines.slice(joinIdx + 1, scanIdx).exists(_.contains("Exchange")),
          s"state side re-shuffled on $key:\n$plan")
      }
    } finally ops.CurateIncr.dropBucketedState(spark, prefix, 3)
  }
}
