package graft

import org.apache.spark.sql.functions._

/** Z-order layout: the property that pays at 100 TB is per-file min/max
  * tightness on BOTH interleaved keys — a range predicate on EITHER key
  * then overlaps only a fraction of the files (parquet row-group /
  * file skipping), where a single-column sort leaves the second key's
  * stats spanning the full domain in every file. */
class LayoutSuite extends SparkSpec {

  test("z16 Morton code interleaves bits (known values)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L), (3L, 5L))
      .toDF("x", "y")
      .select(ops.Layout.z16($"x", $"y").as("z")).collect().map(_.getLong(0))
    // interleave(3=0b11, 5=0b101) = x bits at even, y bits at odd:
    // x=011 -> 0_0_1_1 at bits 0,2; y=101 -> 1_0_1 at bits 1,3,5 => 100111 = 39
    assert(rows.toSeq == Seq(0L, 1L, 2L, 0x55555555L, 0xAAAAAAAAL, 39L))
  }

  test("zorderWrite: a range predicate on the second key overlaps only a fraction of files") {
    import spark.implicits._
    val files = 16
    val li = Tables.lineitem(spark, sfDir).select($"l_partkey", $"l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder_").toString

    // naive layout: sorted by partkey only — suppkey stats are useless
    li.repartitionByRange(files, $"l_partkey").sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/naive")
    // z-order layout on (partkey, suppkey)
    ops.Layout.zorderWrite(li, "l_partkey", "l_suppkey", s"$tmp/zorder", files)

    def overlapping(path: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"l_suppkey").as("mn"), max($"l_suppkey").as("mx"))
        .filter($"mx" >= lo && $"mn" <= hi)
        .count()

    val (yLo, yHi) = {
      val r = li.agg(min($"l_suppkey"), max($"l_suppkey")).collect()(0)
      val (mn, mx) = (r.getLong(0), r.getLong(1))
      (mn, mn + (mx - mn) / 8) // a 1/8-of-domain band on the SECOND key
    }
    val naiveHit = overlapping(s"$tmp/naive", yLo, yHi)
    val zHit = overlapping(s"$tmp/zorder", yLo, yHi)
    // partkey-sorted files all span the full suppkey domain; z-ordered
    // files tile the 2-D space, so most fall wholly outside the band
    assert(naiveHit >= files - 1, s"naive layout should not skip: $naiveHit/$files")
    assert(zHit <= files / 2,
      s"z-order should let a suppkey band skip most files: $zHit/$files overlap")

    // rows survive the relayout intact
    assert(spark.read.parquet(s"$tmp/zorder").count() == li.count())
  }

  test("zorderWrite survives a degenerate constant key (affine-scale div guard)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_zconst_").toString
    val df = (0L until 1000L).map(i => (i, 7L)).toDF("a", "b") // b is constant: max-min = 0
    ops.Layout.zorderWrite(df, "a", "b", s"$tmp/out", 4)
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 1000L)
    assert(back.agg(sum($"a"), min($"b"), max($"b")).collect()(0)
      .toSeq == Seq(999L * 1000 / 2, 7L, 7L))
  }

  test("Compact with zorderBy: OPTIMIZE-style rewrite keeps rows and gains two-key locality") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_zcompact_").toString
    val root = s"$tmp/t"
    // small-file mess: two lang partitions × 6 appended files each
    val base = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey",
        org.apache.spark.sql.functions.when($"l_orderkey" % 2 === 0, "en").otherwise("fr").as("lang"))
    (0 until 6).foreach { i =>
      base.filter($"l_partkey" % 6 === i)
        .write.mode("append").partitionBy("lang").parquet(root)
    }
    val rowsBefore = spark.read.parquet(root).count()
    val sumBefore = spark.read.parquet(root).agg(sum($"l_partkey"), sum($"l_suppkey")).collect()(0)

    val st = graft.streaming.Compact.run(spark, root, Seq("lang"),
      targetBytes = 16L * 1024, zorderBy = Some(("l_partkey", "l_suppkey")))
    assert(st.rows == rowsBefore && st.filesAfter > 1)

    val after = spark.read.parquet(root)
    assert(after.count() == rowsBefore)
    assert(after.agg(sum($"l_partkey"), sum($"l_suppkey")).collect()(0) == sumBefore)

    // locality: within each lang partition, a 1/8 band on the SECOND key
    // overlaps at most ~half the files (a salt/hash layout overlaps all)
    val perFile = after
      .groupBy($"lang", input_file_name().as("f"))
      .agg(min($"l_suppkey").as("mn"), max($"l_suppkey").as("mx"))
      .collect()
    val (yLo, yHi) = {
      val r = base.agg(min($"l_suppkey"), max($"l_suppkey")).collect()(0)
      (r.getLong(0), r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 8)
    }
    Seq("en", "fr").foreach { lg =>
      val files = perFile.filter(_.getString(0) == lg)
      if (files.length >= 4) {
        val hit = files.count(r => r.getLong(3) >= yLo && r.getLong(2) <= yHi)
        assert(hit <= files.length / 2 + 1,
          s"$lg: z-compacted files don't skip a suppkey band: $hit/${files.length}")
      }
    }
  }
}
