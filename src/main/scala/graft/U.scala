package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine determinism helpers (SURVEY.md §7.3/§7.5).
  *
  * The DuckDB oracle and Spark must produce bit-identical values. Rules:
  *   - Never aggregate raw doubles (FP summation order differs). Scale to
  *     int64 first: `floor(x * k)` is the same IEEE-754 multiply+floor in
  *     both engines, and int64 sums are exact and order-free.
  *   - Never output raw timestamps (events.ts is ns parquet: Spark reads
  *     µs-truncated, DuckDB reads TIMESTAMP_NS). Render strings instead.
  *   - Cast every integral output to BIGINT in both engines (Spark
  *     row_number is int32, DuckDB's is int64; DuckDB SUM(BIGINT) is
  *     HUGEINT unless cast back).
  */
object U {
  /** Money doubles (2-decimal) → exact int64 cents. Identical in DuckDB as
    * CAST(FLOOR(x*100) AS BIGINT). */
  def cents(c: Column): Column = floor(c * 100)

  /** Measurement doubles → int64 micro-units; DuckDB:
    * CAST(FLOOR(x*1000000) AS BIGINT). */
  def micros(c: Column): Column = floor(c * 1000000)

  /** lineitem revenue in cent-basis-points: cents(price) * (100 - pct(discount)).
    * Exact int64; DuckDB mirror in Oracle.scala. */
  def revC: Column = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))

  /** Timestamp → 'yyyy-MM-dd' string (DuckDB: strftime(x, '%Y-%m-%d')). */
  def dayStr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Timestamp → second-precision string (DuckDB: strftime(x, '%Y-%m-%d %H:%M:%S')). */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Portable 60-bit hash: first 15 hex chars of md5 as int64. Identical
    * in DuckDB via list_reduce hex parse (Oracle.h64Sql) and in driver
    * Scala via h64Local — the shared randomness source for MinHash /
    * SimHash / LSH, so sketches match the oracle bit-for-bit.
    * Backed by the native codegen'd expression graft.functions.H64
    * (digest-bytes → long, no hex-string intermediates); the composed
    * built-ins `conv(substring(md5(c),1,15),16,10)` compute the same
    * value and remain in use inside SQL-string lambdas. */
  def h64(c: Column): Column = graft.functions.H64.h64(c)

  /** Driver-side twin of h64 (for baking deterministic constants, e.g.
    * LSH hyperplanes, into both the Spark plan and the oracle SQL). */
  def h64Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }
}
