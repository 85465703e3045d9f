package graft

import graft.plans.LevRewrite
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: graft's injected optimizer rule
  * rewrites unbounded edit-distance predicates into Spark's early-exit
  * thresholded kernel plus a length-difference short-circuit — the
  * optimization fuzzyPairs hand-codes, applied automatically to
  * migrated SQL. */
class ExtensionsSuite extends SparkSpec {

  private val names = Seq("spark", "sparks", "spork", "catalyst",
    "catalysts", "tungsten", "ab", "yz", "window", "windows")

  private def pairs = {
    import spark.implicits._
    val df = names.toDF("nm")
    df.as("a").crossJoin(df.as("b"))
      .select($"a.nm".as("n1"), $"b.nm".as("n2"))
      .filter($"n1" < $"n2")
  }

  test("LevRewrite: lev(a,b) <= k becomes length guard + thresholded kernel, same rows") {
    import spark.implicits._
    val q = pairs.filter(expr("levenshtein(n1, n2) <= 2"))
    val want = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(want.nonEmpty)
    // un-rewritten plan carries the unbounded form (threshold = None)
    val before = q.queryExecution.optimizedPlan.toString
    assert(before.contains("levenshtein") && before.contains("None)"),
      s"test precondition: plan already thresholded?\n$before")
    LevRewrite.enable(spark)
    try {
      val q2 = pairs.filter(expr("levenshtein(n1, n2) <= 2"))
      val after = q2.queryExecution.optimizedPlan.toString
      assert(after.contains("Some(2)") && after.contains(">= 0"),
        s"no thresholded kernel in the rewritten plan:\n$after")
      assert(after.contains("abs("),
        s"no length-difference short-circuit in:\n$after")
      val got = q2.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == want, s"rewrite changed results: missing=${want -- got} extra=${got -- want}")
      // strict form: lev < 2 ≡ lev <= 1 — rewritten with k-1 and equal rows
      val strictWant = pairs.filter(expr("levenshtein(n1, n2) < 2"))
      val sGot = strictWant.collect().map(r => (r.getString(0), r.getString(1))).toSet
      LevRewrite.disable(spark)
      val sBase = pairs.filter(expr("levenshtein(n1, n2) < 2"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(sGot == sBase)
      LevRewrite.enable(spark)
      // idempotent: a second optimizer pass leaves the plan stable (the
      // thresholded form no longer matches the rewrite pattern)
      val once = q2.queryExecution.optimizedPlan
      assert(LevRewrite(once) fastEquals once, "rule re-fired on its own output")
    } finally LevRewrite.disable(spark)
  }

  test("GraftExtensions class injects the rule at session build (constructor contract)") {
    // spark.sql.extensions instantiates the class reflectively and hands
    // it a SparkSessionExtensions; verify the public contract holds (a
    // fresh SparkContext isn't available in-suite, so injection is
    // exercised through the extensions object directly)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions()(ext)
    val rules = org.apache.spark.sql.graftshim.GraftShim.optimizerRulesOf(ext, spark)
    assert(rules.exists(_ eq LevRewrite), "injected optimizer rule missing")
  }
}
