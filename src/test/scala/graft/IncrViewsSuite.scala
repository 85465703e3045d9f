package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL surface of the incremental serving reads (VERDICT r14 #4): each
  * `v_<prefix>_report` catalog view must return EXACTLY the member's
  * Scala `report` on the same warehouse — from a FRESH session (the
  * views use only built-in functions and default-catalog table names,
  * so a SQL-only user with zero Scala setup resolves them), and must
  * FOLLOW the state through later folds and deletes (the refresh hooks
  * re-bake marker literals / swap in the tombstone-aware form). */
class IncrViewsSuite extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  private def freshPrefix(stem: String): String =
    stem + java.lang.Long.toHexString(
      U.h64Local(java.util.UUID.randomUUID().toString))

  test("v_*_report == TfidfIncr.report, fresh session, follows folds + deletes") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val prefix = freshPrefix("tfidf_view_")
    val wh = ops.IncrState.newWarehouse()
    try {
      (0 to 1).foreach(d => ops.TfidfIncr.runDay(spark,
        docs.filter(pmod($"doc_id", lit(3L)) === d), prefix, wh, d, nBuckets = 4))
      val v = ops.IncrViews.registerTfidf(spark, prefix, wh)
      val fresh = spark.newSession()
      assert(canon(fresh.sql(s"SELECT * FROM $v")) ==
        canon(ops.TfidfIncr.report(spark, prefix, wh)),
        "view != Scala report after registration")
      // a later fold changes n_docs (a baked literal) — the runDay
      // refresh hook must keep the view current, no re-register needed
      ops.TfidfIncr.runDay(spark,
        docs.filter(pmod($"doc_id", lit(3L)) === 2), prefix, wh, 2, nBuckets = 4)
      assert(canon(fresh.sql(s"SELECT * FROM $v")) ==
        canon(ops.TfidfIncr.report(spark, prefix, wh)),
        "view went stale after a fold (n_docs literal not refreshed)")
      // retraction: negative partials + a negated marker line
      ops.TfidfIncr.deleteDay(spark,
        docs.filter(pmod($"doc_id", lit(7L)) === 3), prefix, wh, 3, nBuckets = 4)
      assert(canon(fresh.sql(s"SELECT * FROM $v")) ==
        canon(ops.TfidfIncr.report(spark, prefix, wh)),
        "view went stale after a delete")
    } finally {
      ops.IncrViews.dropView(spark, prefix)
      ops.TfidfIncr.dropState(spark, prefix)
    }
  }

  test("v_*_report == DomainsIncr.report, fresh session (static view)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val prefix = freshPrefix("domains_view_")
    val wh = ops.IncrState.newWarehouse()
    try {
      (0 to 1).foreach(d => ops.DomainsIncr.runDay(spark,
        docs.filter(pmod($"doc_id", lit(2L)) === d), prefix, wh, d, nBuckets = 4))
      val v = ops.IncrViews.registerDomains(spark, prefix, wh)
      val fresh = spark.newSession()
      assert(canon(fresh.sql(s"SELECT * FROM $v")) ==
        canon(ops.DomainsIncr.report(spark, prefix, wh)))
      // the domains view bakes nothing — a later fold and a retraction
      // flow through the state tables it reads live
      ops.DomainsIncr.deleteDay(spark,
        docs.filter(pmod($"doc_id", lit(11L)) === 5), prefix, wh, 2, nBuckets = 4)
      assert(canon(fresh.sql(s"SELECT * FROM $v")) ==
        canon(ops.DomainsIncr.report(spark, prefix, wh)),
        "static view diverged after a delete")
    } finally {
      ops.IncrViews.dropView(spark, prefix)
      ops.DomainsIncr.dropState(spark, prefix)
    }
  }

  test("v_*_report == QualityIncr.report, fresh session, tombstone identity") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"value")
    val customers = Tables.customer(spark, sfDir)
    val prefix = freshPrefix("quality_view_")
    val wh = ops.IncrState.newWarehouse()
    try {
      (0 to 1).foreach(d => ops.QualityIncr.runDay(spark,
        events.filter(pmod($"event_id", lit(2L)) === d), customers,
        prefix, wh, d, nBuckets = 4))
      val v = ops.IncrViews.registerQuality(spark, prefix, wh)
      val fresh = spark.newSession()
      assert(canon(fresh.sql(s"SELECT * FROM $v")) ==
        canon(ops.QualityIncr.report(spark, prefix, wh)),
        "view != Scala report (append-only form)")
      // first delete creates the tombstone table; the refresh hook must
      // swap the view to the |L∪T|−|T| form AND re-bake the counters —
      // pinning that the pure-SQL identity equals the native
      // bitmap_andnot the Scala report uses
      ops.QualityIncr.deleteDay(spark,
        events.filter(pmod($"event_id", lit(5L)) === 2), customers,
        prefix, wh, 2, nBuckets = 4)
      assert(canon(fresh.sql(s"SELECT * FROM $v")) ==
        canon(ops.QualityIncr.report(spark, prefix, wh)),
        "view went stale or the union identity != bitmap_andnot")
    } finally {
      ops.IncrViews.dropView(spark, prefix)
      ops.QualityIncr.dropState(spark, prefix)
    }
  }

  test("v_*_report == TriIncr.report, fresh session, tombstone swap") {
    import spark.implicits._
    // the exhibit graph at test scale: part co-occurrence of lineitem
    val e0 = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      .distinct()
    val edges = e0.as("a").join(e0.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .select($"a.pk".as("u"), $"b.pk".as("v")).distinct()
    val prefix = freshPrefix("tri_view_")
    val wh = ops.IncrState.newWarehouse()
    try {
      (0 to 1).foreach(d => ops.TriIncr.runDay(spark,
        edges.filter(pmod($"u" + $"v", lit(2L)) === d), prefix, wh, d, nBuckets = 4))
      val v = ops.IncrViews.registerTriangles(spark, prefix, wh)
      val fresh = spark.newSession()
      assert(canon(fresh.sql(s"SELECT * FROM $v")) ==
        canon(ops.TriIncr.report(spark, prefix, wh)),
        "view != Scala report (append-only form)")
      // first delete creates the edge tombstone table — the hook swaps
      // in the anti-join form
      ops.TriIncr.deleteDay(spark,
        edges.filter(pmod($"u", lit(13L)) === 3), prefix, wh, 2, nBuckets = 4)
      assert(canon(fresh.sql(s"SELECT * FROM $v")) ==
        canon(ops.TriIncr.report(spark, prefix, wh)),
        "view missed the tombstone swap")
    } finally {
      ops.IncrViews.dropView(spark, prefix)
      ops.TriIncr.dropState(spark, prefix)
    }
  }
}
