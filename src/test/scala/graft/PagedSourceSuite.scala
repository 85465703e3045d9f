package graft

import graft.sources.paged.PagedApi
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The cursor-paginated DSv2 source (≙ reference src/main.py:136-160):
  * page clamp, per-trigger admission, global cap, and — the behavior
  * that matters — a killed-and-restarted query resuming from the
  * checkpointed cursor WITHOUT re-fetching pages it already committed.
  * `_access.log` records every page the "API" serves, so re-reads are
  * directly observable; the append-only parquet sink makes re-delivery
  * observable as duplicate ids. */
class PagedSourceSuite extends SparkSpec {

  private def mkApi(n: Int, startId: Int = 0): String = {
    val root = Files.createTempDirectory("graft_paged_api").toString
    PagedApi.appendRecords(root,
      (startId until startId + n).map(i => (i.toLong, f"2021-01-06T18:40:${i % 60}%02d.000Z", s"tweet $i #NBA")))
    root
  }

  /** start= cursors of every page fetch the service has served, sorted —
    * a trigger's pages are fetched in parallel across executor threads
    * (by design), so raw log order within a batch is nondeterministic. */
  private def fetchedCursors(root: String): (Seq[Long], Boolean) = {
    val p = PagedApi.accessLogPath(root)
    val raw =
      if (!Files.exists(p)) Seq.empty[Long]
      else new String(Files.readAllBytes(p), "UTF-8").linesIterator
        .map(l => l.split(' ')(1).stripPrefix("start=").toLong).toSeq
    (raw.sorted, raw.distinct.size == raw.size)
  }

  private def drain(root: String, out: String, ckpt: String,
                    opts: Map[String, String]): Unit = {
    var reader = spark.readStream.format("graft-pages").option("path", root)
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def landedIds(out: String): Seq[Long] = {
    import spark.implicits._
    spark.read.parquet(out).select($"id").as[Long].collect().sorted.toSeq
  }

  test("A1 drain: requested page size is clamped to the server max (src/main.py:95-96)") {
    val root = mkApi(170)
    val base = Files.createTempDirectory("graft_paged").toString
    drain(root, s"$base/out", s"$base/ckpt",
      Map("pageSize" -> "1000", "maxRecords" -> "100000"))
    assert(landedIds(s"$base/out") == (0L until 170L))
    // 1000 requested → 100 served: exactly two pages, cursors 0 and 100
    assert(fetchedCursors(root) == (Seq(0L, 100L), true))
  }

  test("A1 restart: resumes from the checkpointed cursor, no page re-read") {
    val root = mkApi(80)
    val base = Files.createTempDirectory("graft_paged").toString
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    // run 1: drain what the API has (4 pages of 20, 2 pages per trigger)
    drain(root, out, ckpt,
      Map("pageSize" -> "20", "maxPagesPerTrigger" -> "2", "maxRecords" -> "100000"))
    assert(landedIds(out) == (0L until 80L))
    assert(fetchedCursors(root) == (Seq(0L, 20L, 40L, 60L), true))
    // the API receives more data; the query was stopped (≙ kill) and is
    // restarted against the SAME checkpoint + append sink
    PagedApi.appendRecords(root,
      (80 until 120).map(i => (i.toLong, "2021-01-07T00:00:00.000Z", s"tweet $i")))
    drain(root, out, ckpt,
      Map("pageSize" -> "20", "maxPagesPerTrigger" -> "2", "maxRecords" -> "100000"))
    // every id exactly once — a re-delivered page would show as duplicates
    assert(landedIds(out) == (0L until 120L),
      "restart must deliver only post-cursor records, exactly once")
    // and no committed page was re-fetched from the API across the restart
    assert(fetchedCursors(root) == (Seq(0L, 20L, 40L, 60L, 80L, 100L), true))
  }

  test("end-to-end: paged source -> manifest sink, exactly-once across restart") {
    // the reference's whole loop composed from the engine's pieces:
    // cursor-paginated source (offset in the checkpoint) feeding the
    // manifest-committed sink (visibility gated on the commit log)
    import org.apache.spark.sql.DataFrame
    val root = mkApi(60)
    val base = Files.createTempDirectory("graft_e2e").toString
    val sinkRoot = s"$base/landed"; val ckpt = s"$base/ckpt"
    def run(): Unit = {
      val q = spark.readStream.format("graft-pages")
        .option("path", root).option("pageSize", "20")
        .option("maxPagesPerTrigger", "1").option("maxRecords", "100000")
        .load()
        .writeStream
        .foreachBatch(streaming.ManifestSink.write(sinkRoot) _)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    def ids(): Seq[Long] = {
      import spark.implicits._
      streaming.ManifestSink.read(spark, sinkRoot)
        .select($"id").as[Long].collect().sorted.toSeq
    }
    assert(ids() == (0L until 60L))
    // API grows; restart drains only the new pages, manifest stays exactly-once
    PagedApi.appendRecords(root,
      (60 until 80).map(i => (i.toLong, "2021-01-08T00:00:00.000Z", s"tweet $i")))
    run()
    assert(ids() == (0L until 80L), "duplicate or missing rows after restart")
  }

  /** All access-log lines the service has served, raw. */
  private def accessLines(root: String): Seq[String] = {
    val p = PagedApi.accessLogPath(root)
    if (!Files.exists(p)) Seq.empty
    else new String(Files.readAllBytes(p), "UTF-8").linesIterator.toSeq
  }

  private def pagedScanOf(df: org.apache.spark.sql.DataFrame): graft.sources.paged.PagedScan =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[graft.sources.paged.PagedScan]
    }.head

  test("A1 filter pushdown: predicate is compiled into the API query (src/main.py:89-101)") {
    import spark.implicits._
    val root = mkApi(1000)
    def read() = spark.read.format("graft-pages")
      .option("path", root).option("pageSize", "50").option("maxRecords", "100000")
      .load()
    // unfiltered: the full stream is 20 pages of 50 (collect rows, not
    // count() — COUNT(*) now pushes into the metadata probe and would
    // fetch zero pages)
    assert(read().collect().length == 1000)
    val fullPages = accessLines(root).size
    assert(fullPages == 20)
    // filtered: the predicate leaves the Spark plan and becomes a
    // server-side query — only the ~100 matching records are paged
    val df = read().filter($"id" >= 900L && $"text".contains("#NBA"))
    assert(df.select($"id").as[Long].collect().sorted.toSeq == (900L until 1000L))
    val pushedLines = accessLines(root).drop(fullPages)
    assert(pushedLines.size == 2,
      s"expected 2 pages of the filtered stream, got ${pushedLines.size}: $pushedLines")
    assert(pushedLines.forall(_.contains("q=id>=900&text~#NBA")),
      s"filter must ride the API request: $pushedLines")
    // and the plan records the pushdown (scan description carries the query)
    assert(pagedScanOf(df).description().contains("query=id>=900&text~#NBA"))
  }

  test("A1 projection pushdown: field list is compiled into the request (≙ tweet.fields)") {
    import spark.implicits._
    val root = mkApi(10)
    val df = spark.read.format("graft-pages")
      .option("path", root).option("maxRecords", "100000").load()
      .select($"text")
    assert(df.as[String].collect().length == 10)
    assert(pagedScanOf(df).readSchema().fieldNames.toSeq == Seq("text"),
      "scan must read only the required column")
    assert(accessLines(root).forall(_.endsWith("fields=text")),
      s"projection must ride the API request: ${accessLines(root)}")
  }

  test("A1 limit pushdown: .limit(k) plans only ⌈k/pageSize⌉ pages (≙ max_results)") {
    import spark.implicits._
    val root = mkApi(1000)
    val df = spark.read.format("graft-pages")
      .option("path", root).option("pageSize", "50").option("maxRecords", "100000")
      .load().limit(120)
    assert(df.count() == 120)
    // 120 records at 50/page = 3 pages fetched, not the stream's 20
    val lines = accessLines(root)
    assert(lines.size == 3, s"limit must bound the page plan, got ${lines.size}: $lines")
    assert(pagedScanOf(df).description().contains("limit=120"),
      "scan description must record the pushed limit")
    // limit composes with a pushed filter: pages walk the FILTERED stream
    val root2 = mkApi(1000)
    val df2 = spark.read.format("graft-pages")
      .option("path", root2).option("pageSize", "50").option("maxRecords", "100000")
      .load().filter($"id" >= 900L).limit(60)
    assert(df2.select($"id").as[Long].collect().sorted.toSeq == (900L until 960L))
    assert(accessLines(root2).size == 2,
      s"filtered+limited read must fetch 2 pages: ${accessLines(root2)}")
  }

  test("A1 residual filters stay in-plan: unsupported predicate is not pushed") {
    import spark.implicits._
    val root = mkApi(100)
    val df = spark.read.format("graft-pages")
      .option("path", root).option("maxRecords", "100000").load()
      .filter($"id" % 7 === 0) // not expressible as an API query term
    assert(df.select($"id").as[Long].collect().sorted.toSeq ==
      (0L until 100L).filter(_ % 7 == 0))
    assert(pagedScanOf(df).description().contains("query=-"),
      "unsupported predicate must not be pushed")
  }

  test("A1 streaming query options: server-side query string for the micro-batch path") {
    import spark.implicits._
    // Catalyst's V2 pushdown rule doesn't rewrite streaming relations, so
    // the streaming path carries the query as explicit options — the
    // reference's own shape (build_query assembles the string from
    // config, src/main.py:89-101)
    val root = mkApi(200)
    val base = Files.createTempDirectory("graft_paged").toString
    drain(root, s"$base/out", s"$base/ckpt",
      Map("pageSize" -> "20", "maxRecords" -> "100000",
        "query.minId" -> "150", "query.contains" -> "#NBA"))
    assert(landedIds(s"$base/out") == (150L until 200L),
      "streamed rows must be exactly the server-side matches")
    // 50 matching records → 3 pages of 20, not the 10 pages of the raw stream
    val lines = accessLines(root)
    assert(lines.size == 3, s"expected 3 filtered pages, got: $lines")
    assert(lines.forall(_.contains("q=id>=150&text~#NBA")))
  }

  test("A1 options are case-insensitive (DSv2 convention): 'pagesize'/'maxrecords' honored") {
    val root = mkApi(100)
    val base = Files.createTempDirectory("graft_paged").toString
    // all-lowercase keys: before the CaseInsensitiveStringMap wrap these
    // were silently ignored and the stream fell back to maxRecords=3000
    drain(root, s"$base/out", s"$base/ckpt",
      Map("pagesize" -> "20", "maxrecords" -> "50"))
    assert(landedIds(s"$base/out") == (0L until 50L),
      "lowercase maxrecords=50 must cap the stream (silently ignored before)")
    assert(fetchedCursors(root) == (Seq(0L, 20L, 40L), true),
      "lowercase pagesize=20 must size the pages")
  }

  test("A1 framing: tabs inside text survive; newlines are rejected at append") {
    val root = Files.createTempDirectory("graft_paged_api").toString
    PagedApi.appendRecords(root, Seq((1L, "2021-01-06T18:40:00.000Z", "col1\tcol2\tcol3")))
    val base = Files.createTempDirectory("graft_paged").toString
    drain(root, s"$base/out", s"$base/ckpt", Map("maxRecords" -> "10"))
    import spark.implicits._
    val texts = spark.read.parquet(s"$base/out").select($"text").as[String].collect()
    assert(texts.toSeq == Seq("col1\tcol2\tcol3"),
      "text containing tabs must round-trip whole, not truncate at the first tab")
    intercept[IllegalArgumentException] {
      PagedApi.appendRecords(root, Seq((2L, "2021-01-06", "line1\nline2")))
    }
    intercept[IllegalArgumentException] {
      PagedApi.appendRecords(root, Seq((3L, "2021\t01", "ok")))
    }
  }

  test("A1 global cap: admission stops at maxRecords (≙ MAX_RESULTS, src/main.py:18,136)") {
    val root = mkApi(100)
    val base = Files.createTempDirectory("graft_paged").toString
    drain(root, s"$base/out", s"$base/ckpt",
      Map("pageSize" -> "20", "maxRecords" -> "50"))
    assert(landedIds(s"$base/out") == (0L until 50L))
    // final page is a partial fetch up to the cap; nothing past it
    assert(fetchedCursors(root) == (Seq(0L, 20L, 40L), true))
  }

  test("A1 COUNT(*) pushdown: the count rides the metadata probe, zero pages fetched") {
    // ≙ the reference reading meta.result_count instead of the tweets
    // (src/main.py:156): SELECT COUNT(*) over the filtered, capped
    // source must answer from ONE metadata probe — the access log
    // (which records every page the service serves) must stay empty.
    import spark.implicits._
    val root = mkApi(150)
    val pages = spark.read.format("graft-pages")
      .option("path", root).option("maxRecords", "1000").load()
    // bare count
    assert(pages.count() == 150L)
    // pushed-filter count: ids 100..149 via id >= 100
    val filtered = pages.filter($"id" >= 100L).agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).as[Long].collect()(0)
    assert(filtered == 50L)
    // cap clamps the count like it clamps admission
    val capped = spark.read.format("graft-pages")
      .option("path", root).option("maxRecords", "40").load().count()
    assert(capped == 40L)
    val (cursors, _) = fetchedCursors(root)
    assert(cursors.isEmpty, s"COUNT(*) pushdown fetched pages at cursors $cursors")
    // and the plan really delegated: no page partitions, pushdown scan marker
    val planned = pages.groupBy().count()
    assert(planned.queryExecution.executedPlan.toString.contains("COUNT(*) pushdown"),
      s"aggregate not pushed into the scan:\n${planned.queryExecution.executedPlan}")
  }

  test("A1 retry: injected 429 + 5xx recover with exactly-once page delivery (batch)") {
    // ≙ the failure mode of the reference's bare requests.request call
    // (src/main.py:114-120): rate limits and transient 5xx. The reader's
    // bounded retry must re-read the SAME cursor slice — every record
    // exactly once, every successful page served exactly once.
    import spark.implicits._
    val root = mkApi(100)
    PagedApi.injectFault(root, "-", count = 1, kind = 429, retryAfterMs = 10)
    PagedApi.injectFault(root, "40", count = 2, kind = 503)
    val df = spark.read.format("graft-pages")
      .option("path", root).option("pageSize", "20").option("maxRecords", "100000")
      .option("retryBaseBackoffMs", "5")
      .load()
    assert(df.select($"id").as[Long].collect().sorted.toSeq == (0L until 100L),
      "faulted pages must recover without dropping or duplicating records")
    val lines = accessLines(root)
    assert(lines.count(_.contains("FAIL")) == 3,
      s"expected the 3 injected failures in the log: $lines")
    val served = lines.filterNot(_.contains("FAIL")).map(_.split(' ')(1))
    assert(served.distinct.size == served.size,
      s"a page was served twice despite per-cursor retry: $served")
  }

  test("A1 retry: AvailableNow drain recovers from injected faults, exactly-once") {
    val root = mkApi(80)
    PagedApi.injectFault(root, "-", count = 1, kind = 429, retryAfterMs = 10)
    PagedApi.injectFault(root, "60", count = 1, kind = 503)
    val base = Files.createTempDirectory("graft_paged").toString
    drain(root, s"$base/out", s"$base/ckpt",
      Map("pageSize" -> "20", "maxRecords" -> "100000", "retryBaseBackoffMs" -> "5"))
    assert(landedIds(s"$base/out") == (0L until 80L),
      "streamed drain must deliver every record exactly once under faults")
    assert(accessLines(root).count(_.contains("FAIL")) == 2)
  }

  test("A1 retry exhaustion: failures past retryMaxAttempts fail the read") {
    val root = mkApi(10)
    PagedApi.injectFault(root, "-", count = 10, kind = 429, retryAfterMs = 5)
    val df = spark.read.format("graft-pages")
      .option("path", root).option("maxRecords", "100000")
      .option("retryMaxAttempts", "2").option("retryBaseBackoffMs", "5")
      .load()
    val e = intercept[Exception] { df.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[PagedApi.RateLimitedException]),
      s"exhausted retries must surface the rate-limit error, got: $e")
  }

  test("A1 statistics report: a capped scan auto-broadcasts in a join (SupportsReportStatistics)") {
    // Without estimateStatistics a DSv2 scan is unknown-size = huge, so
    // even a 100-row capped API read would shuffle-join. With the
    // metadata-count report, Catalyst sizes the scan like a small dim:
    // under a 64KB broadcast threshold the paged side (≈ 100 rows × a
    // few dozen bytes) must broadcast while the 112KB lineitem side
    // cannot — so seeing any BroadcastHashJoin proves the report landed.
    import spark.implicits._
    val root = mkApi(150)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "65536")
    try {
      val pages = spark.read.format("graft-pages")
        .option("path", root).option("maxRecords", "100").load()
      val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select($"l_orderkey", $"l_quantity")
      val joined = fact.join(pages, $"l_orderkey" === $"id")
        .groupBy($"id").agg(org.apache.spark.sql.functions.sum($"l_quantity").as("q"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"capped paged scan did not broadcast under stats report:\n$p")
      assert(!p.contains("SortMergeJoin"), s"shuffle join despite tiny reported size:\n$p")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("A1 ingest throughput: many-page drains stay page-parallel (pages/s at two sizes)") {
    // VERDICT r12 #7: at crawl scale the source's first bottleneck is
    // ingest parallelism — one InputPartition per page, fetched across
    // all executor slots. Time a full materialization (NOT count(),
    // which rides the zero-fetch pushdown) at two page counts and pin
    // that per-page cost stays ~flat: a serial-fetch regression scales
    // time ∝ pages and fails the factor bound long before the absolute
    // numbers get host-sensitive. The absolute pages/s lands in the
    // build log (PAGED_THROUGHPUT line) and tools/bench_notes_r13.md.
    val pageSize = 50
    def timeDrain(nRecords: Int): (Double, Long) = {
      val root = mkApi(nRecords)
      val t0 = System.nanoTime()
      spark.read.format("graft-pages").option("path", root)
        .option("pageSize", pageSize.toString)
        .option("maxRecords", nRecords.toString) // lift the MAX_RESULTS default
        .load()
        .write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val (cursors, unique) = fetchedCursors(root)
      assert(unique, "a page was fetched twice in a single batch scan")
      assert(cursors.size == (nRecords + pageSize - 1) / pageSize,
        s"expected ${(nRecords + pageSize - 1) / pageSize} page fetches, saw ${cursors.size}")
      (secs, cursors.size.toLong)
    }
    timeDrain(500) // warm-up: codegen, source classes, noop sink
    val (tSmall, pSmall) = timeDrain(5000)  // 100 pages
    val (tBig, pBig) = timeDrain(40000)     // 800 pages
    val (rateSmall, rateBig) = (pSmall / tSmall, pBig / tBig)
    println(f"PAGED_THROUGHPUT pages_small=$pSmall t_small=$tSmall%.3f rate_small=$rateSmall%.1f " +
      f"pages_big=$pBig t_big=$tBig%.3f rate_big=$rateBig%.1f pages_per_sec")
    // 8× the pages must not cost ~8× per page: with per-page partitions
    // the parallel fill keeps the rate flat-or-better; 3× slack absorbs
    // host noise before we'd call it serial
    assert(rateBig >= rateSmall / 3.0,
      f"page throughput collapsed with page count: $rateSmall%.1f -> $rateBig%.1f pages/s")
  }
}
