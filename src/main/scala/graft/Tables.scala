package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (TESTDATA.md / FIXTURES.md).
  *
  * Mirrors the reference's landed-data surface — Glue-crawled S3 objects
  * queried by Athena (reference src/main.py:4-5, main.tf:304-314) — as
  * vectorized Parquet scans. Filters/projections applied downstream are
  * pushed into the scan by Catalyst, the Spark-native analogue of the
  * reference compiling its filters into the API query string
  * (reference src/main.py:89-101).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts is nanosecond parquet, which vanilla Spark 4 refuses
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw int64 ns and floor-divide to
    * a µs timestamp — the same truncation DuckDB applies on
    * CAST(ts AS TIMESTAMP), so both engines see identical µs instants
    * (oracle SQL must CAST accordingly; never output raw ts).
    * `spark.sql.legacy.parquet.nanosAsLong=true` must be pinned at session
    * build (Verify/Bench/SparkSpec do; SparkEntry.entry guards externally
    * built sessions) — a loader must not mutate session state. */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
