package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VERDICT r14 #1: the incremental-state family must be safe on a SHARED
  * SparkSession driven by many threads — the real deployment posture (a
  * multi-tenant Spark driver; Verify's own pool). The r14 failure mode:
  * `IncrState.withOverwriteMode` mutated the session-global
  * `spark.sql.sources.partitionOverwriteMode` and restored it in a
  * finally, so one query's restore could land between another's planning
  * and execution — and a STATIC-mode INSERT OVERWRITE on a partitioned
  * table truncates EVERY partition, not just its own day (the
  * `q_tfidf_del` 0-row driver failure). The fix pins the dynamic mode in
  * each state table's own storage properties (and in writer options for
  * path-based ledger writes), which are read per-write and never shared.
  *
  * These tests prove the stronger property the fix was designed for: the
  * family's correctness is INDEPENDENT of the session conf — no value,
  * and no concurrent mutation, of partitionOverwriteMode can corrupt
  * state. */
class ConcurrencySuite extends SparkSpec {

  private val ConfKey = "spark.sql.sources.partitionOverwriteMode"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  /** Run `body` with the session conf pinned to `mode` (restored after —
    * this suite runs single-threaded between tests, so the legacy
    * pattern is safe HERE; it is the concurrent production path that
    * must not depend on it). */
  private def withConf(mode: Option[String])(body: => Unit): Unit = {
    val prev = spark.conf.getOption(ConfKey)
    mode.fold(spark.conf.unset(ConfKey))(spark.conf.set(ConfKey, _))
    try body finally prev.fold(spark.conf.unset(ConfKey))(spark.conf.set(ConfKey, _))
  }

  test("IncrState.writeDay never depends on the session conf (static pinned)") {
    import spark.implicits._
    val t = ops.IncrState.StateTable("conc_ws_t", "k", Seq("k"))
    val wh = ops.IncrState.newWarehouse()
    withConf(Some("static")) {
      // day 0 creates the table; day 1 and the day-1 REPLAY must each
      // overwrite only their own partition even though the session says
      // static (the truncation mode that destroyed the r14 state)
      ops.IncrState.writeDay(spark,
        Seq((1L, "a", 0), (2L, "b", 0)).toDF("k", "v", "day"), t, wh, 0, 2)
      ops.IncrState.writeDay(spark,
        Seq((3L, "c", 1)).toDF("k", "v", "day"), t, wh, 1, 2)
      ops.IncrState.writeDay(spark,
        Seq((4L, "d", 1)).toDF("k", "v", "day"), t, wh, 1, 2)
      assert(canon(spark.table("conc_ws_t").select($"k", $"v", $"day")) ==
        Seq("1|a|0", "2|b|0", "4|d|1"),
        "a day write under STATIC session conf touched another partition")
      // the mode must be pinned in the table's own metadata, so a JVM
      // restart's re-registration path (ensureRegistered → CREATE TABLE
      // ... OPTIONS) keeps the guarantee; simulate by dropping the
      // catalog entry and writing again
      spark.sql("DROP TABLE conc_ws_t")
      ops.IncrState.writeDay(spark,
        Seq((5L, "e", 2)).toDF("k", "v", "day"), t, wh, 2, 2)
      assert(canon(spark.table("conc_ws_t").select($"k", $"v", $"day")) ==
        Seq("1|a|0", "2|b|0", "4|d|1", "5|e|2"),
        "re-registered table lost the dynamic-overwrite property")
    }
    spark.sql("DROP TABLE IF EXISTS conc_ws_t")
  }

  test("incremental fold + retraction correct under a STATIC session conf") {
    // the victim query of r14, end to end, with the conf pinned to the
    // truncation mode the race used to leak in — result must still match
    // the unpinned run
    val expected = canon(ops.TfidfIncr.incrementalDel(spark, sfDir, 3))
    assert(expected.nonEmpty, "tfidf_del corpus is vacuous")
    withConf(Some("static")) {
      assert(canon(ops.TfidfIncr.incrementalDel(spark, sfDir, 3)) == expected)
    }
  }

  test("concurrent folds on one session + a conf-mutating tenant stay intact") {
    // three incremental members run SIMULTANEOUSLY on the shared session
    // while an adversary thread keeps flipping the session conf between
    // static / dynamic / unset — the exact interleaving class that
    // truncated the r14 tf state. Every member must match its solo run.
    val solo: Map[String, Seq[String]] = Map(
      "tfidf_del" -> canon(ops.TfidfIncr.incrementalDel(spark, sfDir, 3)),
      "domains_del" -> canon(ops.DomainsIncr.incrementalDel(spark, sfDir, 3)),
      "dedup_incr" -> canon(ops.DedupIncr.incremental(spark, sfDir, 3)))
    solo.foreach { case (n, r) => assert(r.nonEmpty, s"$n solo run is vacuous") }

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val adversary = new Thread(() => {
      val modes = Seq(Some("static"), Some("dynamic"), None)
      var i = 0
      while (!stop.get()) {
        modes(i % 3).fold(spark.conf.unset(ConfKey))(spark.conf.set(ConfKey, _))
        i += 1
        Thread.sleep(1)
      }
      spark.conf.unset(ConfKey)
    })
    adversary.setDaemon(true)
    adversary.start()
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[(String, Seq[String])]] = Seq(
        () => "tfidf_del" -> canon(ops.TfidfIncr.incrementalDel(spark, sfDir, 3)),
        () => "domains_del" -> canon(ops.DomainsIncr.incrementalDel(spark, sfDir, 3)),
        () => "dedup_incr" -> canon(ops.DedupIncr.incremental(spark, sfDir, 3)))
      val got = pool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
      pool.shutdown()
      got.foreach { case (name, rows) =>
        assert(rows == solo(name),
          s"$name diverged under concurrency: ${rows.size} rows vs solo ${solo(name).size}")
      }
    } finally stop.set(true)
  }
}
