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

  /** Collect the Levenshtein thresholds in the optimized plan's
    * expression trees: one entry per node, Some(k) = thresholded kernel,
    * None = unbounded DP. Tree-shape assertions, not toString fragments
    * (those broke on pretty-printer changes across Spark versions). */
  private def levThresholds(df: org.apache.spark.sql.DataFrame): Seq[Option[Int]] = {
    import org.apache.spark.sql.catalyst.expressions.{Levenshtein, Literal}
    df.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect {
        case Levenshtein(_, _, t) => t.map { case Literal(v: Int, _) => v }
      })
  }

  test("LevRewrite: lev(a,b) <= k becomes length guard + thresholded kernel, same rows") {
    import spark.implicits._
    val q = pairs.filter(expr("levenshtein(n1, n2) <= 2"))
    val want = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(want.nonEmpty)
    // un-rewritten plan carries the unbounded form (threshold = None)
    assert(levThresholds(q) == Seq(None),
      s"test precondition: plan already thresholded? ${levThresholds(q)}")
    LevRewrite.enable(spark)
    try {
      val q2 = pairs.filter(expr("levenshtein(n1, n2) <= 2"))
      assert(levThresholds(q2) == Seq(Some(2)),
        s"no thresholded kernel in the rewritten plan: ${levThresholds(q2)}")
      val got = q2.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == want, s"rewrite changed results: missing=${want -- got} extra=${got -- want}")
      // strict form: lev < 2 ≡ lev <= 1 — rewritten with k-1 and equal rows
      val strict = pairs.filter(expr("levenshtein(n1, n2) < 2"))
      assert(levThresholds(strict) == Seq(Some(1)))
      val sGot = strict.collect().map(r => (r.getString(0), r.getString(1))).toSet
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

  test("LevRewrite: BIGINT literal and mirrored comparisons also rewrite") {
    import spark.implicits._
    LevRewrite.enable(spark)
    try {
      // BIGINT threshold (analyzer wraps lev in a LongType cast)
      val qLong = pairs.filter(expr("levenshtein(n1, n2) <= 2L"))
      assert(levThresholds(qLong) == Seq(Some(2)),
        s"BIGINT threshold kept the unbounded kernel: ${levThresholds(qLong)}")
      // mirrored: k >= lev(a,b) and strict k > lev(a,b)
      val qGte = pairs.filter(expr("2 >= levenshtein(n1, n2)"))
      assert(levThresholds(qGte) == Seq(Some(2)),
        s"flipped >= kept the unbounded kernel: ${levThresholds(qGte)}")
      val qGt = pairs.filter(expr("2 > levenshtein(n1, n2)"))
      assert(levThresholds(qGt) == Seq(Some(1)),
        s"flipped > kept the unbounded kernel: ${levThresholds(qGt)}")
      // all four produce the same rows as the unrewritten baseline
      val got = qLong.collect().map(r => (r.getString(0), r.getString(1))).toSet
      val gotGte = qGte.collect().map(r => (r.getString(0), r.getString(1))).toSet
      LevRewrite.disable(spark)
      val base = pairs.filter(expr("levenshtein(n1, n2) <= 2"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == base && gotGte == base, "rewritten variants diverged from baseline rows")
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
