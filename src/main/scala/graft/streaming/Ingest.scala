package graft.streaming

import graft.model.TweetSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** L1 ingest — the Spark-native form of the reference producer's whole
  * dataflow (reference src/main.py:203-277):
  *
  *   - paginated external scan → file-source micro-batches (each file ≙
  *     one API page, reference src/main.py:136-160);
  *   - filters/projection pushed into the source ≙ the reference pushing
  *     them into the API query string (src/main.py:89-101);
  *   - `Trigger.AvailableNow` ≙ the daily EventBridge-fired batch
  *     (main.tf:214-218) — drains everything available, then stops;
  *   - date/entity-partitioned parquet sink ≙ the
  *     `<platform>/<league>/YYYY/MM/DD/` S3 key layout
  *     (src/main.py:70-73,184-191), with dynamic partition overwrite
  *     giving the same idempotent re-run semantics (§2.A8).
  */
object Ingest {

  /** The projection+filter core, shared verbatim by batch and streaming
    * (same logical plan). English-only, non-empty text (≙ `lang:en`,
    * `-is:retweet` server-side filters, src/main.py:89), nested-field
    * projection (≙ tweet.fields, src/main.py:90), partition columns from
    * event time (≙ key layout, src/main.py:70-73). */
  def transform(tweets: DataFrame, platform: String, league: String): DataFrame =
    tweets
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(
        col("id"), col("text"), col("created_at"),
        col("public_metrics.like_count").as("like_count"),
        col("public_metrics.retweet_count").as("retweet_count"),
        transform_(col("entities.hashtags"), h => h.getField("tag")).as("hashtags"),
        lit(platform).as("platform"),
        lit(league).as("league"),
        year(col("created_at")).as("year"),
        month(col("created_at")).as("month"),
        dayofmonth(col("created_at")).as("day"))

  // scala 2.13 name clash with Function.transform under wildcard import
  private def transform_(c: org.apache.spark.sql.Column,
                         f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.transform(c, f)

  /** One scheduled run: drain all NDJSON files under `srcDir`, land as
    * partitioned parquet under `outDir`. Returns when the drain is done. */
  def runAvailableNow(spark: SparkSession, srcDir: String, outDir: String,
                      checkpoint: String,
                      platform: String = "Twitter", league: String = "NBA"): Unit = {
    val src = spark.readStream
      .schema(TweetSchema.schema)
      .json(srcDir)
    val q = transform(src, platform, league).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("platform", "league", "year", "month", "day")
          .parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming upsert into a catalog SERVING table (the Athena-facing
    * half of the daily run): each micro-batch dynamic-overwrites exactly
    * the day partitions it carries, so the table a SQL user queries by
    * name stays whole at all times — untouched days keep their rows,
    * replayed days are replaced idempotently (≙ re-running a day lands
    * on the same S3 prefix, reference src/main.py:70-73). */
  def streamToServingTable(spark: SparkSession, events: DataFrame, table: String,
                           checkpoint: String): Unit = {
    // Pin the dynamic mode in the TABLE's own storage properties before
    // the stream starts (ADVICE r15; the same channel IncrState.writeDay
    // uses): insertInto reads partitionOverwriteMode from the relation's
    // options — table storage properties — in preference to the session
    // conf, so the one-partition-per-day guarantee holds for EVERY later
    // writer of this table, on any session, under any conf. The previous
    // form mutated/restored the conf on the foreachBatch session, which
    // was safe only because foreachBatch hands over a per-stream cloned
    // session — an invariant nothing enforced. SET SERDEPROPERTIES is
    // the ALTER-time spelling of CREATE TABLE ... OPTIONS for
    // datasource tables (both land in CatalogTable.storage.properties).
    spark.sql(
      s"ALTER TABLE $table SET SERDEPROPERTIES ('partitionOverwriteMode' = 'dynamic')")
    val q = events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").insertInto(table)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Schema-drift-tolerant read of a landed parquet dataset: footers are
    * merged across files (`mergeSchema`) so a field that first appeared
    * in a later batch (≙ the Glue crawler re-inferring the schema daily,
    * reference main.tf:304-314) is visible as a nullable column, null
    * for rows written before it existed. Kept off Spark's default read
    * path on purpose — footer merging is a per-file metadata pass, so
    * callers opt in at the boundary where drift is expected rather than
    * paying it on every scan. */
  def readMerged(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(outDir)

  /** Quarantine read of landed NDJSON: PERMISSIVE parse splits the input
    * into (good rows, corrupt raw lines) instead of failing the day's run
    * on one bad record — at 100 TB a malformed API page is a certainty,
    * and the quarantine DF is what lands in the dead-letter path for
    * replay. The cache is required: Spark refuses a query that filters
    * solely on the internal corrupt-record column of a lazy scan.
    * FAILFAST stays available by reading with `mode=FAILFAST` where a
    * pipeline prefers to halt. */
  def readQuarantined(spark: SparkSession, srcDir: String): (DataFrame, DataFrame) = {
    // Force-nullable: a quarantine reader exists BECAUSE rows violate the
    // schema, so every field must tolerate null. Plain file reads coerce
    // the user schema nullable anyway, but reading a dir landed by a
    // STREAMING file sink (_spark_metadata present) takes the sink's
    // metadata-log path, which trusts declared nullability — a corrupt
    // row's null in a non-nullable field then NPEs the first projection
    // that materializes it (found composing crawl→land→quarantine e2e).
    def nullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
      dt match {
        case s: org.apache.spark.sql.types.StructType =>
          org.apache.spark.sql.types.StructType(s.fields.map(f =>
            f.copy(dataType = nullable(f.dataType), nullable = true)))
        case a: org.apache.spark.sql.types.ArrayType =>
          a.copy(elementType = nullable(a.elementType), containsNull = true)
        case m: org.apache.spark.sql.types.MapType =>
          m.copy(valueType = nullable(m.valueType), valueContainsNull = true)
        case other => other
      }
    val schemaWithCorrupt = org.apache.spark.sql.types.StructType(
      nullable(TweetSchema.schema).asInstanceOf[org.apache.spark.sql.types.StructType].fields :+
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType, nullable = true))
    val raw = spark.read.schema(schemaWithCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(srcDir)
      .cache()
    val bad = raw.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record"))
    val good = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    (good, bad)
  }

  /** Batch form over already-landed NDJSON (≙ re-processing a day). */
  def runBatch(spark: SparkSession, srcDir: String, outDir: String,
               platform: String = "Twitter", league: String = "NBA"): Unit =
    transform(spark.read.schema(TweetSchema.schema).json(srcDir), platform, league)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("platform", "league", "year", "month", "day")
      .parquet(outDir)

  /** Platforms this engine has a collector for (≙ the reference's
    * platform dispatch, src/main.py:214-219, which only implements
    * Twitter and raises on anything else). Both names here share the
    * tweet-shaped NDJSON collector; a differently-shaped platform would
    * register its own (schema, transform) pair. */
  val KnownPlatforms: Set[String] = Set("Twitter", "Mastodon")

  /** Multi-platform fan-out (≙ collect_and_write_all_platform_data_v1_0,
    * reference src/main.py:203-219): one landed `platform=<p>/…`
    * partition tree per configured platform, driven by the versioned
    * platforms config (TopicConfig.parsePlatforms).
    *
    * Fail-fast is STRICTER than the reference: every platform is
    * validated BEFORE any work starts (a real exception, not the
    * reference's raise-a-string TypeError, src/main.py:218 — and not
    * its mid-loop failure that leaves earlier platforms landed and
    * later ones not, a half-written fan-out an idempotent re-run then
    * has to repair). Dynamic partition overwrite keeps the whole run
    * re-runnable per §2.A8. */
  def runPlatforms(spark: SparkSession,
                   platforms: graft.sources.TopicConfig.Platforms,
                   srcDirFor: String => String, outDir: String,
                   league: String = "NBA"): Unit = {
    val unknown = platforms.platforms.filterNot(KnownPlatforms)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown platform(s) ${unknown.mkString(", ")}: no collector registered " +
          s"(known: ${KnownPlatforms.toSeq.sorted.mkString(", ")})")
    platforms.platforms.foreach { p =>
      runBatch(spark, srcDirFor(p), outDir, platform = p, league = league)
    }
  }
}
