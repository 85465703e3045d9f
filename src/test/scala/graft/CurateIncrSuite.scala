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
    val sliceBytes = dirBytes(s"$root/slice2")
    val inputBudget = sliceBytes + dirBytes(s"$state/v1")

    // THE contract proof, functional and scale-independent: delete the
    // raw day-0/1 slices before the day-2 fold — if any part of the fold
    // lazily re-read raw history it would throw FileNotFound.
    Seq("slice0", "slice1").foreach { d =>
      val p = java.nio.file.Paths.get(s"$root/$d")
      val w = java.nio.file.Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally w.close()
    }

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
    // I/O-amplification sanity bound: the slice parquet is scanned ONCE
    // (the gated frame is persisted DISK_ONLY and its three consumers
    // read the cache), but cache-block reads COUNT as input bytes at the
    // serialized row size — ≤3 passes at ≤5×-of-parquet expansion for
    // text-heavy rows — so the byte budget is declared inputs (1.5×)
    // plus 15× the slice for the cache traffic. Still an order below any
    // history-rescan regime at scale (history ≫ one day's slice).
    assert(read <= (inputBudget * 1.5).toLong + 15L * sliceBytes + (64 << 10),
      s"day-2 read $read bytes; inputs $inputBudget slice $sliceBytes")
    // and the report from v2 matches the full recompute
    assert(canon(ops.CurateIncr.report(spark, state, 2)) ==
      canon(ops.CurateIncr.incremental(spark, sfDir, 1)))
  }

  test("retention GC keeps at most 2 versions; replay still works; report unchanged") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val slices = (0L to 4L).map(k => docs.filter(pmod($"doc_id", lit(5L)) === k))
    val state = ops.CurateIncr.newStateDir()
    def versions(): Seq[Int] = {
      val d = new java.io.File(state)
      Option(d.list()).getOrElse(Array.empty[String])
        .filter(_.startsWith("v")).flatMap(_.drop(1).toIntOption).toSeq.sorted
    }
    (0 until 5).foreach { day =>
      ops.CurateIncr.runDay(spark, slices(day), state, day)
      // after every committed day: the current version plus exactly one
      // rollback version (none on day 0)
      assert(versions() == (math.max(0, day - 1) to day).toSeq,
        s"day $day left versions ${versions()}")
    }
    // a replayed micro-batch N re-reads v(N-1) — which GC kept — and
    // deterministically rewrites v(N): the report must be unchanged
    val before = canon(ops.CurateIncr.report(spark, state, 4))
    ops.CurateIncr.runDay(spark, slices(4), state, 4)
    assert(versions() == Seq(3, 4))
    assert(canon(ops.CurateIncr.report(spark, state, 4)) == before)
    assert(before == canon(ops.CurateIncr.incremental(spark, sfDir, 1)))
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

  test("streaming decontamination: inbox fold drops eval matches; contaminated replay idempotent") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // the L15b convention: eval (benchmark) = doc_id % 10 == 7, train = rest
    val evalDocs = docs.filter($"doc_id" % 10 === 7)
    val train = docs.filter($"doc_id" % 10 =!= 7)
    val ref = streaming.CurateIncrStream.decontamRef(evalDocs)
    val root = java.nio.file.Files.createTempDirectory("curate_decontam_").toString
    val inbox = s"$root/inbox"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    (0L to 2L).foreach { k =>
      val tmp = s"$root/tmp_$k"
      train.filter(pmod($"doc_id", lit(3L)) === k).coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inbox/day$k.parquet"))
    }
    val state = s"$root/state"
    val v = streaming.CurateIncrStream.drainInbox(spark, inbox, state,
      s"$root/ckpt", Some(ref))
    assert(v == 2)
    // the filter is really firing: survivors = train − the L15b flagged set
    val clean = streaming.CurateIncrStream.decontaminate(train, ref)
    val flagged = SparkEntry.queries("q_decontaminate_fuzzy")(spark, sfDir).count()
    assert(flagged > 0, "corpus has no fuzzy eval matches — test is vacuous")
    assert(clean.count() == train.count() - flagged)
    // stream-folded state == one-shot batch fold of the decontaminated corpus
    val refState = ops.CurateIncr.newStateDir()
    ops.CurateIncr.runDay(spark, clean, refState, 0)
    val want = canon(ops.CurateIncr.report(spark, refState, 0))
    assert(canon(ops.CurateIncr.report(spark, state, v)) == want)
    // a replayed CONTAMINATED micro-batch (same batch id, slice includes
    // eval-matching docs) deterministically re-flags the same docs and
    // rewrites v(N) unchanged — driven through foldBatch directly so the
    // replayed slice is exactly the one batch 2 folded (the file-stream
    // batch→file order is an implementation detail we must not assume)
    val state2 = ops.CurateIncr.newStateDir()
    (0 to 2).foreach(k => streaming.CurateIncrStream.foldBatch(
      train.filter(pmod($"doc_id", lit(3L)) === k.toLong), state2, k, Some(ref)))
    assert(canon(ops.CurateIncr.report(spark, state2, 2)) == want)
    streaming.CurateIncrStream.foldBatch(
      train.filter(pmod($"doc_id", lit(3L)) === 2L), state2, 2, Some(ref))
    assert(canon(ops.CurateIncr.report(spark, state2, 2)) == want)
    ref.release()
  }

  test("retractable backend: fold == other backends; delete == reduced-corpus fold; keeper promotes") {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir)
    // replicate the gate so the planted duplicate is a doc that is
    // actually IN the state
    val gGate = base.withColumn("tk", split($"text", " "))
      .filter($"lang" === "en" && size($"tk") >= 10 &&
        expr("size(array_distinct(tk)) * 1000000 div size(tk)") >= 300000)
    val keeperId = gGate.agg(min($"doc_id")).collect()(0).getLong(0)
    // PLANT a duplicate of that doc under a higher id, then take down
    // the original (the group's keeper): the member-level state must
    // promote the surviving clone — the exact case min-compressed state
    // cannot answer
    val off = (1000000000L to 1000000010L)
      .find(o => (keeperId + o) % 11 != 5).get
    val clone = base.filter($"doc_id" === keeperId)
      .withColumn("doc_id", $"doc_id" + off)
    val docs = base.unionByName(clone)
    val del = docs.filter(pmod($"doc_id", lit(11L)) === 5 || $"doc_id" === keeperId)
    val kept = docs.join(del.select($"doc_id"), Seq("doc_id"), "left_anti")
    assert(kept.filter($"doc_id" === keeperId + off).count() == 1,
      "the planted survivor fell in the takedown set — pick a different offset")
    val pA = "curate_del_a_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val whA = ops.IncrState.newWarehouse()
    try {
      // the retractable FOLD is a third backend: equal to the parquet
      // backend's report on the same corpus
      (0 until 3).foreach { day =>
        ops.CurateIncr.runDayRetractable(spark,
          docs.filter(pmod($"doc_id", lit(3L)) === day), pA, whA, day, nBuckets = 4)
      }
      def rep() = canon(ops.CurateIncr.reportRetractable(spark, pA, whA))
      val stateF = ops.CurateIncr.newStateDir()
      (0 until 3).foreach { day =>
        ops.CurateIncr.runDay(spark,
          docs.filter(pmod($"doc_id", lit(3L)) === day), stateF, day)
      }
      val full = canon(ops.CurateIncr.report(spark, stateF, 2))
      assert(rep() == full, "retractable fold != parquet backend on the same corpus")
      // expected post-delete: the parquet backend folded over the
      // REDUCED corpus (oracle-proven lossless)
      val stateE = ops.CurateIncr.newStateDir()
      (0 until 3).foreach { day =>
        ops.CurateIncr.runDay(spark,
          kept.filter(pmod($"doc_id", lit(3L)) === day), stateE, day)
      }
      val expected = canon(ops.CurateIncr.report(spark, stateE, 2))
      ops.CurateIncr.deleteDayRetractable(spark, del, pA, whA, 3, nBuckets = 4)
      assert(rep() == expected,
        "retraction != batch on reduced corpus (keeper promotion or tf netting broke)")
      assert(full != expected, "delete changed nothing — test is vacuous")
      // physical purge: tombstoned member rows gone, survivors intact
      ops.CurateIncr.purgeDeletedRetractable(spark, pA, whA, nBuckets = 4)
      val delSet = del.select($"doc_id").collect().map(_.getLong(0)).toSet
      Seq(s"${pA}_md5m", s"${pA}_linem").foreach { t =>
        assert(spark.table(t).filter($"doc_id".isin(delSet.toSeq.map(Long.box): _*))
          .count() == 0, s"$t still holds tombstoned rows after purge")
        assert(spark.table(t).count() > 0, s"$t was emptied by the purge")
      }
      assert(rep() == expected, "purge changed the report")
      // replay of the delete day; compaction over all four tables
      ops.CurateIncr.deleteDayRetractable(spark, del, pA, whA, 3, nBuckets = 4)
      assert(rep() == expected, "delete replay not idempotent")
      ops.CurateIncr.compactRetractable(spark, pA, whA, nBuckets = 4)
      assert(rep() == expected, "compaction corrupted retraction state")
    } finally ops.CurateIncr.dropRetractableState(spark, pA)
  }

  test("retractable delete reads only the delete slice (never fold history)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("curate_del_bytes_").toString
    (0 to 1).foreach { k =>
      docs.filter(pmod($"doc_id", lit(2L)) === k)
        .write.mode("overwrite").parquet(s"$root/slice$k")
    }
    docs.filter(pmod($"doc_id", lit(11L)) === 5)
      .write.mode("overwrite").parquet(s"$root/del")
    val prefix = "curate_del_b_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = s"$root/wh"
    try {
      ops.CurateIncr.runDayRetractablePath(spark, s"$root/slice0", prefix, wh, 0)
      ops.CurateIncr.runDayRetractablePath(spark, s"$root/slice1", prefix, wh, 1)
      def dirBytes(p: String): Long = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
      val delBytes = dirBytes(s"$root/del")
      // the functional never-rescan proof: fold slices deleted BEFORE
      // the retraction — any lazy re-read would throw FileNotFound
      Seq("slice0", "slice1").foreach { d =>
        val p = java.nio.file.Paths.get(s"$root/$d")
        val w = java.nio.file.Files.walk(p)
        try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally w.close()
      }
      val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        ops.CurateIncr.deleteDayRetractablePath(spark, s"$root/del", prefix, wh, 2)
        org.apache.spark.sql.graftshim.GraftShim.drainListenerBus(spark)
      } finally spark.sparkContext.removeSparkListener(listener)
      val read = bytesRead.get()
      assert(read > 0, "listener saw no input")
      // slice-shaped bound, generous for the DISK_ONLY persist re-reads
      // (same calibration as the fold's input-bytes test above) — the
      // hard claim is the functional proof: history is GONE
      assert(read <= 15L * delBytes + (64 << 10),
        s"retraction read $read bytes for a $delBytes-byte slice — it touched state it must not")
    } finally ops.CurateIncr.dropRetractableState(spark, prefix)
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
      // restart: the in-memory catalog dies with the JVM, the warehouse
      // survives — both the next day's fold (mergedBucketed reads
      // v(N−1)) and the report must re-register from the _graft_buckets
      // markers and keep going
      val want = canon(ops.CurateIncr.reportBucketed(spark, prefix, 2))
      Seq("md5", "line", "tf").foreach(k =>
        spark.sql(s"DROP TABLE ${prefix}_${k}_v2"))
      assert(canon(ops.CurateIncr.reportBucketed(spark, prefix, 2, Some(wh))) == want,
        "report did not survive a catalog death")
      Seq("md5", "line", "tf").foreach(k =>
        spark.sql(s"DROP TABLE ${prefix}_${k}_v2"))
      ops.CurateIncr.runDayBucketed(spark,
        docs.filter(lit(false)), prefix, wh, 3)
      // an empty day-3 fold right after the "restart" must re-register
      // v2 for the merge and carry the state forward unchanged
      assert(canon(ops.CurateIncr.reportBucketed(spark, prefix, 3, Some(wh))) == want,
        "fold after a catalog death diverged")
    } finally ops.CurateIncr.dropBucketedState(spark, prefix, 3)
  }

  test("streaming CDC inbox: interleaved add/delete events == reduced-corpus recompute") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("curate_cdc_stream_").toString
    val inbox = s"$root/inbox"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    val docs = Tables.documents(spark, sfDir)
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inbox/$name.parquet"))
    }
    def addSlice(k: Long) = docs.filter(pmod($"doc_id", lit(4L)) === k)
      .withColumn("op", lit("add"))
    // the retractable (member-level) backend: delete events carry the
    // documents as folded — keeper tombstones by doc_id + negated tf
    val del = docs.filter(pmod($"doc_id", lit(11L)) === 5)
    val prefix = "curate_cdc_s_" + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))
    val wh = s"$root/wh"
    val ckpt = s"$root/ckpt"
    try {
      land(addSlice(0), "e0_add0")
      land(addSlice(1), "e1_add1")
      land(del.withColumn("op", lit("del")), "e2_del")
      land(addSlice(2), "e3_add2")
      val v1 = streaming.CurateIncrStream.drainCdc(spark, inbox, prefix, wh, ckpt,
        nBuckets = 4, maxDeltaDays = 3)
      assert(v1 == 3, s"expected 4 one-file micro-batches -> batch 3, got $v1")
      land(addSlice(3), "e4_add3")
      val v2 = streaming.CurateIncrStream.drainCdc(spark, inbox, prefix, wh, ckpt,
        nBuckets = 4, maxDeltaDays = 3)
      assert(v2 == 4, s"restart should process exactly the new event, got $v2")
      val kept = docs.join(del.select($"doc_id"), Seq("doc_id"), "left_anti")
      val pE = "curate_cdc_e_" + java.lang.Long.toHexString(
        U.h64Local(java.util.UUID.randomUUID().toString))
      val whE = ops.IncrState.newWarehouse()
      try {
        (0 until 3).foreach { day =>
          ops.CurateIncr.runDayRetractable(spark,
            kept.filter(pmod($"doc_id", lit(3L)) === day), pE, whE, day, nBuckets = 4)
        }
        assert(canon(ops.CurateIncr.reportRetractable(spark, prefix, wh)) ==
          canon(ops.CurateIncr.reportRetractable(spark, pE, whE)),
          "CDC drain != batch recompute on the reduced corpus")
      } finally ops.CurateIncr.dropRetractableState(spark, pE)
    } finally ops.CurateIncr.dropRetractableState(spark, prefix)
  }
}
