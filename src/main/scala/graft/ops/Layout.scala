package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-column data skipping for
  * the landed table (the reference's Athena layer prunes on the
  * partition key only, main.tf:311-313; range queries on OTHER columns
  * scan everything). Sorting files along the interleaved-bit curve
  * makes per-file min/max stats tight on EVERY interleaved dimension at
  * once, so parquet row-group/file skipping works for predicates on any
  * of them — the standard lakehouse layout for 100 TB fact tables
  * queried by more than one key.
  *
  * Keys are first normalized into the full 16-bit domain (min/max
  * affine scale — a metadata-sized agg broadcast back); without that, a
  * narrow key (e.g. a 10-value suppkey) contributes nothing to the high
  * interleave bits and the curve degenerates to a single-column sort.
  * Everything is integer shift/and/or/div on int64 — bit-identical
  * cross-engine, one codegen'd projection, no shuffle beyond the
  * explicit range-partition of the write path.
  */
object Layout {

  /** Bit-spread of a 16-bit value into the even bit positions of a
    * 32-bit lane (the classic Morton magic-mask chain). */
  private def spread(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: x in even bits, y in odd. */
  def z16(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Attach the Morton code of two int key columns as `__z`: bounds via
    * one metadata-sized agg broadcast back, all-integer affine scale to
    * 16 bits (`div` floor-div), then the interleave. The caller
    * range-partitions/sorts on `__z` and drops it. */
  def withZ(df: DataFrame, kx: String, ky: String): DataFrame =
    df.crossJoin(broadcast(df.agg(
        min(col(kx).cast("long")).as("__xmn"), max(col(kx).cast("long")).as("__xmx"),
        min(col(ky).cast("long")).as("__ymn"), max(col(ky).cast("long")).as("__ymx"))))
      .withColumn("__x16", expr(
        s"(CAST(`$kx` AS BIGINT) - __xmn) * 65535 div greatest(__xmx - __xmn, 1)"))
      .withColumn("__y16", expr(
        s"(CAST(`$ky` AS BIGINT) - __ymn) * 65535 div greatest(__ymx - __ymn, 1)"))
      .withColumn("__z", z16(col("__x16"), col("__y16")))
      .drop("__x16", "__y16", "__xmn", "__xmx", "__ymn", "__ymx")

  /** Write `df` z-ordered on two int key columns: range-partition by the
    * Morton code (files tile the curve), sort within partitions, drop
    * helpers. Each landed file then covers a square-ish region of
    * (kx, ky) space — min/max stats are tight on BOTH keys (LayoutSuite
    * asserts a band predicate on the SECOND key skips most files). */
  def zorderWrite(df: DataFrame, kx: String, ky: String, out: String, files: Int): Unit =
    withZ(df, kx, ky)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(out)

  val qs: Map[String, Q] = Map(
    // The curve's locality, made visible as a query: bucket = 8-bit
    // z-prefix (= top 4 bits of EACH normalized key), so every bucket
    // spans at most 1/16 of each key's domain — exactly the per-file
    // min/max tightness that makes two-dimensional skipping work. The
    // oracle recomputes the identical normalize + mask chain in DuckDB
    // int64 bit ops.
    "q_layout_zorder" -> ((s, d) => {
      import s.implicits._
      val k = Tables.lineitem(s, d)
        .select($"l_partkey".cast("long").as("x"), $"l_suppkey".cast("long").as("y"))
      val b = k.agg(min($"x").as("xmn"), max($"x").as("xmx"),
        min($"y").as("ymn"), max($"y").as("ymx"))
      k.crossJoin(broadcast(b))
        .withColumn("x16", expr("(x - xmn) * 65535 div greatest(xmx - xmn, 1)"))
        .withColumn("y16", expr("(y - ymn) * 65535 div greatest(ymx - ymn, 1)"))
        .withColumn("bucket", shiftright(z16($"x16", $"y16"), 24))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          min($"x").as("x_min"), max($"x").as("x_max"),
          min($"y").as("y_min"), max($"y").as("y_max"))
        .orderBy("bucket")
    })
  )
}
