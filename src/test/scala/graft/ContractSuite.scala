package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the queries/oracleSql maps must stay in
  * lockstep (a key in one but not the other silently weakens the
  * correctness gate). */
class ContractSuite extends AnyFunSuite {

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: $missing")
  }

  test("every query has an oracle — including the sketches (bound_ok certification)") {
    // since r11 even the algorithm-specific sketches (q_agg_hll,
    // q_agg_approx_pct) carry an oracle: the query emits a bound_ok
    // certification column and the oracle emits literal TRUE, so the
    // driver's hash compare is a real quantitative accuracy check
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected oracle-less queries: $noOracle")
  }

  test("query keys are well-formed q_* identifiers") {
    SparkEntry.queries.keySet.foreach { k =>
      assert(k.matches("q_[a-z0-9_]+"), s"bad key: $k")
    }
  }

  test("oracle SQL has no unresolved interpolation artifacts") {
    val singleRow = Set("q_agg_global") // one-row global agg: ORDER BY vacuous
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("${"), s"$k: unresolved interpolation in oracle SQL")
      if (!singleRow(k))
        assert(sql.toUpperCase.contains("ORDER BY"), s"$k: oracle lacks total ORDER BY")
    }
  }
}
