package graft

import graft.streaming.Ingest
import java.nio.file.{Files, Paths}

/** Golden ingest test (SURVEY.md §5.6): tweet-shaped NDJSON fixture →
  * AvailableNow streaming drain → date/entity-partitioned parquet, the
  * reference's whole L1 dataflow (src/main.py:70-73,90,151-153). */
class IngestSuite extends SparkSpec {

  private def fixture(dir: String): Unit = {
    val lines = (0 until 20).map { i =>
      val day = 6 + i % 2 // two distinct days → two partitions
      s"""{"id":"134688943662625${1000 + i}","text":"tweet $i #NBA","created_at":"2021-01-0${day}T18:40:${10 + i}.000Z","public_metrics":{"retweet_count":$i,"reply_count":1,"like_count":${i * 2},"quote_count":0},"context_annotations":[{"domain":{"id":"46","name":"Brand Category","description":"d"},"entity":{"id":"10026792024","name":"NBA","description":"d"}}],"entities":{"hashtags":[{"start":11,"end":15,"tag":"NBA"}],"mentions":[],"urls":[],"annotations":[]}}"""
    } :+ """{"id":"9","text":"","created_at":"2021-01-06T00:00:00.000Z","public_metrics":null,"context_annotations":null,"entities":null}"""
    Files.write(Paths.get(s"$dir/page-00.json"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("A3/A5: JSON schema inference reads the fixture; NDJSON sink round-trips") {
    val base = Files.createTempDirectory("graft_json").toString
    new java.io.File(s"$base/src").mkdirs()
    fixture(s"$base/src")
    // A3: schema-on-read inference (≙ the Glue crawler, main.tf:304-314)
    val inferred = spark.read.json(s"$base/src")
    assert(inferred.columns.toSet.contains("public_metrics"))
    assert(inferred.schema("public_metrics").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(inferred.count() == 21)
    // A5: NDJSON append sink (≙ one json.dumps per line, src/main.py:151-153)
    val out = s"$base/ndjson_out"
    inferred.write.mode("append").json(out)
    inferred.write.mode("append").json(out) // append semantics: doubles
    assert(spark.read.json(out).count() == 42)
    // landed files are one JSON object per line
    val aFile = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".json")).head
    val firstLine = Files.readAllLines(aFile.toPath).get(0)
    assert(firstLine.trim.startsWith("{") && firstLine.trim.endsWith("}"))
  }

  test("A3b schema drift: a field added in a later batch merges as nullable (mergeSchema)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_drift").toString
    val out = s"$base/out"
    // day 1: the original shape
    val d1 = s"$base/day1"; new java.io.File(d1).mkdirs()
    Files.write(Paths.get(s"$d1/page.json"),
      Seq("""{"id":"1","text":"first day","like_count":3}""",
          """{"id":"2","text":"also first","like_count":5}""")
        .mkString("\n").getBytes("UTF-8"))
    spark.read.json(d1).write.mode("append").parquet(out)
    // day 2: upstream starts sending a new nullable field `lang`
    // (≙ the producer evolving; the Glue crawler re-crawl, main.tf:304-314)
    val d2 = s"$base/day2"; new java.io.File(d2).mkdirs()
    Files.write(Paths.get(s"$d2/page.json"),
      Seq("""{"id":"3","text":"second day","like_count":7,"lang":"en"}""")
        .mkString("\n").getBytes("UTF-8"))
    spark.read.json(d2).write.mode("append").parquet(out)
    // merged read: old + new rows both queryable, lang nullable
    val merged = Ingest.readMerged(spark, out)
    assert(merged.columns.toSet == Set("id", "text", "like_count", "lang"))
    assert(merged.count() == 3)
    val byId = merged.select($"id", $"lang").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byId == Map("1" -> None, "2" -> None, "3" -> Some("en")))
    // drifted field is filterable across the union (old rows just miss)
    assert(merged.filter($"lang" === "en").select($"id").as[String].collect().toSeq == Seq("3"))
    assert(merged.filter($"lang".isNull).count() == 2)
  }

  test("platform fan-out: one partition tree per configured platform; unknown fails fast") {
    import graft.sources.TopicConfig
    val base = Files.createTempDirectory("graft_fanout").toString
    val out = s"$base/out"
    // per-platform landing zones (≙ each platform's collection endpoint)
    TopicConfig.parsePlatforms(TopicConfig.ExamplePlatformsYaml).platforms.foreach { p =>
      val d = s"$base/src_$p"; new java.io.File(d).mkdirs(); fixture(d)
    }
    // fan-out driven by the VERSIONED platforms config (src/platforms.yaml shape)
    Ingest.runPlatforms(spark,
      TopicConfig.parsePlatforms(TopicConfig.ExamplePlatformsYaml),
      p => s"$base/src_$p", out)
    // 2 platforms in → 2 partition trees out (src/main.py:203-219)
    assert(new java.io.File(s"$out/platform=Twitter/league=NBA/year=2021").exists)
    assert(new java.io.File(s"$out/platform=Mastodon/league=NBA/year=2021").exists)
    val landed = spark.read.parquet(out)
    assert(landed.count() == 40) // 20 valid rows per platform
    import spark.implicits._
    assert(landed.select($"platform").distinct().as[String].collect().sorted.toSeq ==
      Seq("Mastodon", "Twitter"))
    // unknown platform: a REAL exception (not the reference's
    // raise-a-string bug, src/main.py:218), and fail-fast — validation
    // happens before any platform lands, so the output is untouched
    val bad = TopicConfig.Platforms(1.0, Seq("Twitter", "FriendFace"))
    val e = intercept[IllegalArgumentException] {
      Ingest.runPlatforms(spark, bad, p => s"$base/src_$p", s"$base/out2")
    }
    assert(e.getMessage.contains("FriendFace"))
    assert(!new java.io.File(s"$base/out2").exists,
      "fail-fast must reject the whole run before any platform lands")
  }

  test("AvailableNow ingest lands filtered, projected, partitioned parquet") {
    val base = Files.createTempDirectory("graft_ingest").toString
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(src).mkdirs()
    fixture(src)
    Ingest.runAvailableNow(spark, src, out, ckpt)
    val landed = spark.read.parquet(out)
    // empty-text row filtered (≙ server-side filters, src/main.py:89)
    assert(landed.count() == 20)
    // nested projection flattened
    assert(landed.columns.toSet == Set("id", "text", "created_at", "like_count",
      "retweet_count", "hashtags", "platform", "league", "year", "month", "day"))
    // partition layout <platform>/<league>/year/month/day (src/main.py:70-73)
    assert(new java.io.File(s"$out/platform=Twitter/league=NBA/year=2021/month=1/day=6").exists)
    assert(new java.io.File(s"$out/platform=Twitter/league=NBA/year=2021/month=1/day=7").exists)
    // hashtag array survived the transform
    import spark.implicits._
    assert(landed.select(org.apache.spark.sql.functions.explode($"hashtags"))
      .distinct().as[String].collect().toSeq == Seq("NBA"))
    // idempotent re-run (A8): batch re-process overwrites, count unchanged
    Ingest.runBatch(spark, src, out)
    assert(spark.read.parquet(out).count() == 20)
  }

  test("A3c corrupt records: PERMISSIVE quarantine splits good/bad; FAILFAST halts") {
    val base = Files.createTempDirectory("graft_corrupt").toString
    new java.io.File(s"$base/src").mkdirs()
    fixture(s"$base/src")
    // append a page with torn/garbage lines amid a good one (a malformed
    // API page is a certainty at scale)
    Files.write(Paths.get(s"$base/src/page-01.json"),
      Seq(
        """{"id":"42","text":"good row","created_at":"2021-01-06T01:00:00.000Z"}""",
        """{"id":"43","text":"torn line...""",
        """not json at all""").mkString("\n").getBytes("UTF-8"))
    val (good, bad) = Ingest.readQuarantined(spark, s"$base/src")
    assert(good.count() == 22, "21 fixture rows + 1 good row from the dirty page")
    val badLines = bad.collect().map(_.getString(0))
    assert(badLines.length == 2, s"expected 2 quarantined lines, got ${badLines.toSeq}")
    assert(badLines.exists(_.contains("torn line")) && badLines.exists(_.contains("not json")))
    // the good side feeds the normal transform unchanged
    assert(Ingest.transform(good, "Twitter", "NBA").count() > 0)
    // FAILFAST: same input halts the run
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(graft.model.TweetSchema.schema)
        .option("mode", "FAILFAST").json(s"$base/src").count()
    }
  }

  test("compaction: per-partition small files merge to size-targeted counts, rows intact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    import graft.streaming.Compact
    val dir = Files.createTempDirectory("graft_compact_").toString + "/t"
    // 6 small files per lang partition (a micro-batch sink's accretion shape)
    Tables.documents(spark, sfDir)
      .repartition(6)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val wantRows = spark.read.parquet(dir).count()
    val wantSum = spark.read.parquet(dir).agg(sum($"doc_id")).as[Long].head()
    val nLangs = spark.read.parquet(dir).select($"lang").distinct().count()

    // huge target ⇒ k=1 per partition: exactly one file per lang
    val s1 = Compact.run(spark, dir, Seq("lang"), targetBytes = 1L << 40)
    assert(s1.filesBefore > s1.filesAfter, s"no compaction happened: $s1")
    assert(s1.filesAfter == nLangs, s"expected one file per lang: $s1")
    assert(s1.rows == wantRows)
    assert(spark.read.parquet(dir).count() == wantRows)
    assert(spark.read.parquet(dir).agg(sum($"doc_id")).as[Long].head() == wantSum)

    // tiny target ⇒ k>1: per-partition splitting kicks in, rows still intact
    val s2 = Compact.run(spark, dir, Seq("lang"), targetBytes = 1024)
    assert(s2.filesAfter > s2.filesBefore, s"size-targeted split produced no extra files: $s2")
    assert(spark.read.parquet(dir).count() == wantRows)

    // idempotent: recompacting a compacted table is a no-op in file count
    val s3 = Compact.run(spark, dir, Seq("lang"), targetBytes = 1L << 40)
    val s4 = Compact.run(spark, dir, Seq("lang"), targetBytes = 1L << 40)
    assert(s3.filesAfter == s4.filesAfter && s4.rows == wantRows)
  }

  test("compaction: hive-escaped and null partition values still size-split") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    import graft.streaming.Compact
    val dir = Files.createTempDirectory("graft_compact_esc_").toString + "/t"
    // partition values a directory name must percent-encode (space, ':',
    // '=') plus a null — the dir-derived key and the in-row key must
    // still byte-match, else _k falls back to 1 and splitting silently
    // degrades for exactly these partitions
    val tags: Seq[Option[String]] = Seq(Some("a b"), Some("x:y=z"), None)
    val df = (0 until 3000).map(i => (i.toLong, tags(i % 3), s"payload $i " * 20))
      .toDF("id", "tag", "body")
    df.repartition(8).write.mode("overwrite").partitionBy("tag").parquet(dir)
    val wantRows = spark.read.parquet(dir).count()
    val wantSum = spark.read.parquet(dir).agg(sum($"id")).as[Long].head()
    // tiny target forces k>1 PER PARTITION — a key mismatch would fall
    // back to k=1 and emit exactly 3 files; a match emits strictly more
    val s = Compact.run(spark, dir, Seq("tag"), targetBytes = 8 * 1024)
    assert(s.filesAfter > 3, s"escaped/null partitions fell back to k=1: $s")
    assert(spark.read.parquet(dir).count() == wantRows)
    assert(spark.read.parquet(dir).agg(sum($"id")).as[Long].head() == wantSum)
    // null partition round-trips as null (hive default-partition dir)
    assert(spark.read.parquet(dir).filter($"tag".isNull).count() == wantRows / 3)
  }

  test("streaming upsert keeps the serving table whole: only replayed days are replaced") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_serve")
    spark.sql("DROP TABLE IF EXISTS graft_serve.daily")
    // a previous JVM's in-memory catalog forgets the table but its
    // warehouse LOCATION persists — clear it or CREATE refuses
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_serve.db/daily")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    spark.sql("""CREATE TABLE graft_serve.daily (user_id BIGINT, n BIGINT, day STRING)
                 USING parquet PARTITIONED BY (day)""")
    // seed: a settled day 1 and a STALE day 2
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try Seq((1L, 10L, "2024-01-01"), (2L, 99L, "2024-01-02"))
      .toDF("user_id", "n", "day").write.mode("overwrite").insertInto("graft_serve.daily")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // stream carries a corrected day 2 and a new day 3
    val base = Files.createTempDirectory("graft_serve").toString
    val (src, ckpt) = (s"$base/src", s"$base/ckpt")
    Seq((2L, 42L, "2024-01-02"), (3L, 7L, "2024-01-03"))
      .toDF("user_id", "n", "day").write.parquet(src)
    def stream() = spark.readStream
      .schema("user_id BIGINT, n BIGINT, day STRING").parquet(src)
    // pin the session conf to the TRUNCATING mode for the whole stream:
    // the per-day guarantee must come from the table's own storage
    // properties (ADVICE r15), not from any session state the stream's
    // cloned session happened to inherit
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try Ingest.streamToServingTable(spark, stream(), "graft_serve.daily", ckpt)
    finally prevMode match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val got = spark.table("graft_serve.daily").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 10L, "2024-01-01"), (2L, 42L, "2024-01-02"), (3L, 7L, "2024-01-03")),
      s"serving table wrong after streaming upsert: $got")
    // replay from the same checkpoint: no new files, table unchanged
    Ingest.streamToServingTable(spark, stream(), "graft_serve.daily", ckpt)
    assert(spark.table("graft_serve.daily").count() == 3)
  }

  test("e2e: paged crawl → NDJSON landing → quarantine → curate → serving upsert → fresh-session SQL, pruned") {
    import graft.sources.paged.PagedApi
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // The reference's whole main() dataflow (src/main.py:246-277:
    // crawl → land → catalog → query) as ONE asserted pipeline.
    val base = Files.createTempDirectory("graft_e2e").toString
    // 1. the "API": 60 records across 3 days, every 20th page corrupt
    def tweetJson(i: Int, day: Int) =
      s"""{"id":"$i","text":"tweet $i #NBA","created_at":"2024-03-0${day}T12:00:${10 + i % 40}.000Z","public_metrics":{"retweet_count":$i,"reply_count":1,"like_count":${i * 2},"quote_count":0},"context_annotations":[],"entities":{"hashtags":[{"start":8,"end":12,"tag":"NBA"}],"mentions":[],"urls":[],"annotations":[]}}"""
    val recs = (0 until 60).map { i =>
      val day = 1 + i % 3
      val body = if (i % 20 == 19) s"""{"id":"$i","text": BROKEN""" else tweetJson(i, day)
      (i.toLong, s"2024-03-0${day}T12:00:00Z", body)
    }
    PagedApi.appendRecords(s"$base/api", recs)
    // 2. crawl with the DSv2 paged source; land the raw page bodies as
    //    NDJSON — the reference's landing format (src/main.py:151-153)
    val crawl = spark.readStream.format("graft-pages").option("path", s"$base/api").load()
      .select($"text".as("value"))
      .writeStream.format("text").option("path", s"$base/raw")
      .option("checkpointLocation", s"$base/ckpt_crawl")
      .trigger(Trigger.AvailableNow()).start()
    crawl.awaitTermination()
    // 3. quarantine split of the landed NDJSON: 3 corrupt lines isolated
    val (good, bad) = Ingest.readQuarantined(spark, s"$base/raw")
    assert(bad.count() == 3, s"expected 3 quarantined lines, got ${bad.count()}")
    assert(good.count() == 57)
    // 4. curated serving table: streaming re-drain of the landing dir →
    //    transform (the curate gate drops the null-parse corpses) →
    //    per-day dynamic upsert into the catalog table
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_serve")
    spark.sql("DROP TABLE IF EXISTS graft_serve.tweets_e2e")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_serve.db/tweets_e2e")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    val curatedShape = Ingest.transform(good, "Twitter", "NBA")
    curatedShape.limit(0).write
      .partitionBy("platform", "league", "year", "month", "day")
      .saveAsTable("graft_serve.tweets_e2e")
    val src = spark.readStream.schema(graft.model.TweetSchema.schema).json(s"$base/raw")
    Ingest.streamToServingTable(spark, Ingest.transform(src, "Twitter", "NBA"),
      "graft_serve.tweets_e2e", s"$base/ckpt_serve")
    // 5. the Athena half: a FRESH session queries the table by name
    val fresh = spark.newSession()
    val total = fresh.sql("SELECT COUNT(*) FROM graft_serve.tweets_e2e")
      .collect()(0).getLong(0)
    assert(total == 57, s"serving table has $total rows, want 57")
    val day1 = fresh.sql(
      "SELECT COUNT(*) FROM graft_serve.tweets_e2e WHERE day = 1")
      .collect()(0).getLong(0)
    assert(day1 == recs.count { case (i, _, b) => !b.contains("BROKEN") && i % 3 == 0 },
      s"day-1 slice wrong: $day1")
    // partition pruning reaches the scan: the day-filtered query reads a
    // strict file subset, all under day=1 directories
    val all = fresh.table("graft_serve.tweets_e2e")
    val pruned = fresh.sql("SELECT * FROM graft_serve.tweets_e2e WHERE day = 1")
    assert(pruned.inputFiles.nonEmpty && pruned.inputFiles.length < all.inputFiles.length,
      s"no pruning: ${pruned.inputFiles.length} of ${all.inputFiles.length} files")
    assert(pruned.inputFiles.forall(_.contains("day=1")),
      "day-filtered scan read a file outside day=1")
    // idempotent re-run: same checkpoint, no duplicate rows
    val src2 = spark.readStream.schema(graft.model.TweetSchema.schema).json(s"$base/raw")
    Ingest.streamToServingTable(spark, Ingest.transform(src2, "Twitter", "NBA"),
      "graft_serve.tweets_e2e", s"$base/ckpt_serve")
    assert(fresh.sql("SELECT COUNT(*) FROM graft_serve.tweets_e2e")
      .collect()(0).getLong(0) == 57, "checkpoint replay duplicated rows")
  }

  test("e2e composed crawl: filter pushdown reaches the API and a restart stays exactly-once through to the serving table") {
    import graft.sources.paged.PagedApi
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // VERDICT r8 #6: the L1 pieces composed as ONE pipeline — paged
    // source → NDJSON landing → quarantine → streamToServingTable —
    // with the two DSv2 behaviors asserted ON THE COMPOSED CHAIN, not
    // in isolation: (a) the server-side query term reaches the API (the
    // access log proves it paged the FILTERED stream — via the
    // `query.*` source options, the streaming path's form of pushdown:
    // Catalyst's V2 pushdown rule rewrites only batch relations, so the
    // stream declares its query up front exactly as the reference
    // builds its query string before paging, src/main.py:89-101; batch
    // reads of the same source get the identical effect from
    // .filter(...), PagedSourceSuite), and (b) a stopped-and-rerun
    // crawl resumes from the checkpointed cursor, never re-fetching a
    // committed page, and the downstream serving table stays
    // exactly-once.
    val base = Files.createTempDirectory("graft_e2e_push").toString
    def tweetJson(i: Int, day: Int) =
      s"""{"id":"$i","text":"tweet $i #NBA","created_at":"2024-03-0${day}T12:00:${10 + i % 40}.000Z","public_metrics":{"retweet_count":$i,"reply_count":1,"like_count":${i * 2},"quote_count":0},"context_annotations":[],"entities":{"hashtags":[{"start":8,"end":12,"tag":"NBA"}],"mentions":[],"urls":[],"annotations":[]}}"""
    def recsOf(ids: Range, day: Int => Int) = ids.map { i =>
      val body = if (i % 20 == 19) s"""{"id":"$i","text": BROKEN""" else tweetJson(i, day(i))
      (i.toLong, s"2024-03-0${day(i)}T12:00:00Z", body)
    }
    PagedApi.appendRecords(s"$base/api", recsOf(0 until 80, i => 1 + i % 3))
    def crawl(): Unit = {
      val q = spark.readStream.format("graft-pages")
        .option("path", s"$base/api").option("pageSize", "20")
        .option("maxRecords", "100000")
        .option("query.minId", "20") // server-side query term (≙ since_id)
        .load()
        .select($"text".as("value"))
        .writeStream.format("text").option("path", s"$base/raw")
        .option("checkpointLocation", s"$base/ckpt_crawl")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    crawl()
    // pushdown evidence on the composed chain: the API served the
    // 60-record FILTERED stream as 3 pages (cursors 0/20/40 of that
    // stream) — an unpushed filter would have paged all 80 records (4
    // pages) and filtered client-side
    def cursors(): Seq[Long] = {
      val p = PagedApi.accessLogPath(s"$base/api")
      new String(Files.readAllBytes(p), "UTF-8").linesIterator
        .map(_.split(' ')(1).stripPrefix("start=").toLong).toSeq.sorted
    }
    assert(cursors() == Seq(0L, 20L, 40L),
      s"filter not pushed: API paged cursors ${cursors()}")
    // quarantine split of the landed stream: ids 39/59/79 carry broken
    // bodies
    val (good, bad) = Ingest.readQuarantined(spark, s"$base/raw")
    assert(bad.count() == 3 && good.count() == 57)
    // curated serving table fed by a streaming re-read of the landing
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_serve")
    spark.sql("DROP TABLE IF EXISTS graft_serve.tweets_push")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_serve.db/tweets_push")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    Ingest.transform(good, "Twitter", "NBA").limit(0).write
      .partitionBy("platform", "league", "year", "month", "day")
      .saveAsTable("graft_serve.tweets_push")
    def serve(): Unit = {
      val src = spark.readStream.schema(graft.model.TweetSchema.schema).json(s"$base/raw")
      Ingest.streamToServingTable(spark, Ingest.transform(src, "Twitter", "NBA"),
        "graft_serve.tweets_push", s"$base/ckpt_serve")
    }
    serve()
    assert(spark.table("graft_serve.tweets_push").count() == 57)
    // the API receives a fresh day of records (the next daily run);
    // the SAME checkpoints drive both stages again — the crawl must
    // fetch exactly ONE new page (cursor 60 of the filtered stream,
    // nothing re-read), and the serving table must gain exactly the 19
    // parseable new rows
    PagedApi.appendRecords(s"$base/api", recsOf(80 until 100, _ => 4))
    crawl()
    assert(cursors() == Seq(0L, 20L, 40L, 60L),
      s"restart re-fetched or skipped pages: ${cursors()}")
    serve()
    val after = spark.table("graft_serve.tweets_push")
    assert(after.count() == 76, s"expected 57+19 rows, got ${after.count()}")
    // exactly-once end to end: every surviving id appears once
    val ids = after.select($"id".cast("long")).as[Long].collect().sorted.toSeq
    assert(ids == ids.distinct, "duplicate ids after composed restart")
    assert(ids == ((20 until 100).filter(i => i % 20 != 19).map(_.toLong)),
      "serving table id set wrong after restart")
  }
}
