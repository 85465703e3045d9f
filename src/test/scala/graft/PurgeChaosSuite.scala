package graft.ops

import graft.{SparkSpec, Tables, U}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-injection for the DELETE-EPOCH purge (VERDICT r14 #6): the
  * purge is a full compaction whose transform anti-joins the tombstone
  * set (IncrState.compactAllWhere), claimed crash-safe by the
  * stage→swap ordering — "a crash mid-purge leaves a superset; the
  * replay re-runs the same filtered merge". This suite actually opens
  * the two windows no prior test killed:
  *
  *   1. BETWEEN the tombstone write and the purge — the state is
  *      tombstoned but physically unpurged, and the JVM "dies" (the
  *      in-memory catalog is dropped; the warehouse files survive, the
  *      real restart shape). Every read must already be delete-correct
  *      through the tombstone anti-joins, and the purge must run fine
  *      after re-registration.
  *   2. MID-purge across a MULTI-TABLE group — table 1 fully purged,
  *      the crash lands before table 2's merge (injected by a transform
  *      that throws when it reaches the second table). The group is now
  *      heterogeneous (one table purged, one superset) — reads must
  *      STILL be delete-correct, and the replayed purge must complete
  *      the job.
  *
  * Two members with different table counts: DedupIncr (bands + docs +
  * the tombstones compacted alongside) and AnnIncr (codes + vecs,
  * tombstones kept). The oracle everywhere is the member's own
  * reduced-corpus serving read captured BEFORE any chaos. */
class PurgeChaosSuite extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  private def freshPrefix(stem: String): String =
    stem + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))

  /** Simulate a JVM restart: drop the catalog entries (they are
    * in-memory only — a real restart loses them) while the warehouse
    * files survive. Consumers must come back via ensureRegistered. */
  private def simulateRestart(tables: Seq[String]): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("DedupIncr: crash between tombstone write and purge, then mid-purge") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val prefix = freshPrefix("purge_chaos_d_")
    val wh = IncrState.newWarehouse()
    val del = docs.filter(pmod($"doc_id", lit(7L)) === 3).select($"doc_id")
    try {
      (0 until 3).foreach(d => DedupIncr.runDay(spark,
        docs.filter(pmod($"doc_id", lit(3L)) === d), prefix, wh, d, nBuckets = 4))
      DedupIncr.deleteDay(spark, del, prefix, wh, 3, nBuckets = 4)
      val oracle = canon(DedupIncr.pairs(spark, prefix, wh))
      assert(oracle.nonEmpty, "reduced corpus has no pairs — suite is vacuous")

      // window 1: die between the tombstone write and the purge
      simulateRestart(Seq(DedupIncr.bandsTable(prefix),
        DedupIncr.docsTable(prefix), DedupIncr.delTable(prefix)))
      assert(canon(DedupIncr.pairs(spark, prefix, wh)) == oracle,
        "post-restart pre-purge read lost delete correctness")

      // window 2: purge crashes after the FIRST table of the group —
      // inject via a transform that throws when the merge reaches the
      // second table (docs); bands is already purged + swapped. The
      // tomb table's catalog entry also died in the restart — pairs()
      // has no reason to touch it (the delete already rewrote the
      // ledger), so this direct read must re-register it first, the
      // same ensureRegistered step every member read path performs.
      IncrState.ensureRegistered(spark,
        IncrState.StateTable(DedupIncr.delTable(prefix), "doc_id", Seq("doc_id")), wh)
      val tomb = spark.table(DedupIncr.delTable(prefix))
        .select($"doc_id").distinct()
      val boom = intercept[RuntimeException] {
        IncrState.compactAllWhere(spark, wh, DedupIncr.stateTables(prefix), 4,
          t => df =>
            if (t.name == DedupIncr.docsTable(prefix))
              throw new RuntimeException("injected mid-purge crash")
            else df.join(broadcast(tomb), Seq("doc_id"), "left_anti"))
      }
      assert(boom.getMessage.contains("injected"))
      // heterogeneous group (bands purged, docs superset): reads must
      // still be delete-correct through the tombstone anti-joins
      assert(canon(DedupIncr.pairs(spark, prefix, wh)) == oracle,
        "mid-purge crash broke the serving read")
      // the replayed purge completes the job
      DedupIncr.purgeDeleted(spark, prefix, wh, nBuckets = 4)
      assert(canon(DedupIncr.pairs(spark, prefix, wh)) == oracle,
        "replayed purge changed the serving read")
      // physical check: no tombstoned doc survives in either state table
      val delSet = del
      assert(spark.table(DedupIncr.docsTable(prefix))
        .join(delSet, Seq("doc_id"), "left_semi").count() == 0,
        "purge left tombstoned docs in the shingle store")
      assert(spark.table(DedupIncr.bandsTable(prefix))
        .join(delSet, Seq("doc_id"), "left_semi").count() == 0,
        "purge left tombstoned docs in the band store")
    } finally DedupIncr.dropState(spark, prefix)
  }

  test("AnnIncr: crash between tombstone write and purge, then mid-purge") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val prefix = freshPrefix("purge_chaos_a_")
    val wh = IncrState.newWarehouse()
    val del = emb.filter(pmod($"vec_id", lit(7L)) === 3).select($"vec_id")
    def serve(): Seq[String] = canon(
      AnnIncr.topK(spark, prefix, wh, AnnIncr.storeQueries(spark, prefix, wh), 3))
    try {
      (0 until 3).foreach(d => AnnIncr.runDay(spark,
        emb.filter(pmod($"vec_id", lit(3L)) === d), prefix, wh, d, nBuckets = 4))
      AnnIncr.deleteDay(spark, del, prefix, wh, 3, nBuckets = 4)
      val oracle = serve()
      assert(oracle.nonEmpty, "serving read is vacuous")

      // window 1: restart between tombstones and purge
      simulateRestart(Seq(AnnIncr.codesTable(prefix),
        AnnIncr.vecsTable(prefix), AnnIncr.delTable(prefix)))
      assert(serve() == oracle, "post-restart pre-purge read broke")

      // window 2: purge dies after codes, before vecs
      val tomb = spark.table(AnnIncr.delTable(prefix))
        .select($"vec_id").distinct()
      intercept[RuntimeException] {
        IncrState.compactAllWhere(spark, wh, AnnIncr.stateTables(prefix), 4,
          t => df =>
            if (t.name == AnnIncr.vecsTable(prefix))
              throw new RuntimeException("injected mid-purge crash")
            else df.join(broadcast(tomb), Seq("vec_id"), "left_anti"))
      }
      assert(serve() == oracle, "mid-purge crash broke the serving read")
      AnnIncr.purgeDeleted(spark, prefix, wh, nBuckets = 4)
      assert(serve() == oracle, "replayed purge changed the serving read")
      assert(spark.table(AnnIncr.vecsTable(prefix))
        .join(del, Seq("vec_id"), "left_semi").count() == 0,
        "purge left tombstoned vectors in the vec store")
      assert(spark.table(AnnIncr.codesTable(prefix))
        .join(del, Seq("vec_id"), "left_semi").count() == 0,
        "purge left tombstoned vectors in the code store")
    } finally AnnIncr.dropState(spark, prefix)
  }
}
