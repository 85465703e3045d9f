package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function pins for graft.Bench's per-query gate plumbing (no
  * SparkSession — these must stay testable without timing anything). */
class BenchGateSuite extends AnyFunSuite {

  test("gateThreshold: 2x multiplier plus min(1.5s, 6x baseline) slack") {
    // sub-second baseline: the slack absorbs fixed-cost contention — a
    // 3-row query timed at 1.4s under host contention (r7 driver
    // capture, 0.25s baseline) must NOT gate...
    assert(Bench.gateThreshold(0.25) === 2.0)
    assert(1.43 < Bench.gateThreshold(0.25))
    // ...while a genuine algorithmic cliff still fails by a wide margin
    assert(25.6 > Bench.gateThreshold(1.43))
    // multi-second baselines gate at effectively the pure 2x
    assert(Bench.gateThreshold(6.0) === 13.5)
    // the 6x-baseline CAP (VERDICT r8 #3): the old unconditional 1.5s
    // floor left every sub-0.75s baseline ungated in practice — an
    // 8x-inflated sub-second query must now FAIL the gate
    assert(8 * 0.5 > Bench.gateThreshold(0.5))   // 4.0s vs 2.5s threshold
    assert(9 * 0.2 > Bench.gateThreshold(0.2))   // 1.8s vs 1.6s threshold
    // by construction 2b + 6b = 8b: the gate line for the very fastest
    // queries IS 8x — nothing beyond it can pass
    assert(math.abs(Bench.gateThreshold(0.1) - 0.8) < 1e-12)
    // and the cap must not re-introduce the r7 false positives: the
    // worst benign contention multiple actually observed on a
    // sub-second query (q_url_escape 6.4x of ~0.23s, r8 capture)
    // stays under threshold
    assert(6.4 * 0.23 < Bench.gateThreshold(0.23))
  }

  test("quietRemeasureTargets: largest baseline regressors, 1.3x floor, cap 5") {
    val base = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0, "q_d" -> 1.0,
      "q_e" -> 1.0, "q_f" -> 1.0, "q_g" -> 1.0, "q_zero" -> 0.0)
    // ordered by regression ratio desc; 1.3x and below excluded (noise
    // that cannot change a gate verdict); crashed (-1) and zero-baseline
    // rows excluded; queries with no baseline (new this round) excluded
    val results = Map("q_a" -> 3.0, "q_b" -> 2.5, "q_c" -> 1.31, "q_d" -> 1.3,
      "q_e" -> 0.9, "q_f" -> -1.0, "q_zero" -> 5.0, "q_new" -> 9.9)
    assert(Bench.quietRemeasureTargets(results, base) === Seq("q_a", "q_b", "q_c"))
    // the child cap: at most 5 fresh JVMs even on a badly contended
    // capture — the re-measure pass must stay bounded
    val many = (1 to 9).map(i => s"q_$i" -> (10.0 - i)).toMap
    val manyBase = many.keys.map(_ -> 1.0).toMap
    assert(Bench.quietRemeasureTargets(many, manyBase).size === 5)
    assert(Bench.quietRemeasureTargets(many, manyBase).head === "q_1")
    // no baseline at all -> nothing to compare against
    assert(Bench.quietRemeasureTargets(results, Map.empty).isEmpty)
  }

  test("escalateSuspects: 2 consecutive suspect captures -> offender; absence resets") {
    // first capture: suspect but no history — lenient, count starts at 1
    val (e1, h1) = Bench.escalateSuspects(Map.empty, Set("q_a"))
    assert(e1.isEmpty && h1 === Map("q_a" -> 1))
    // second consecutive capture: escalates, count keeps growing (a
    // chronically loaded host must not hide a persistent regression)
    val (e2, h2) = Bench.escalateSuspects(h1, Set("q_a", "q_b"))
    assert(e2 === Set("q_a") && h2 === Map("q_a" -> 2, "q_b" -> 1))
    // a quiet capture where q_a is NOT suspect resets it; q_b escalates
    val (e3, h3) = Bench.escalateSuspects(h2, Set("q_b"))
    assert(e3 === Set("q_b") && h3 === Map("q_b" -> 2))
    val (e4, h4) = Bench.escalateSuspects(h3, Set("q_a"))
    assert(e4.isEmpty && h4 === Map("q_a" -> 1))
  }

  test("loadAvg: three non-negative values on linux") {
    val l = Bench.loadAvg()
    assert(l.size === 3 && l.forall(_ >= 0.0))
  }

  test("rerunWarnField: empty when no crashes; JSON fragment otherwise") {
    assert(Bench.rerunWarnField(Nil) === "")
    val f = Bench.rerunWarnField(Seq("q_a", "q_b"))
    assert(f === ""","rerun_crashed":["q_a","q_b"]""")
    // fragment must splice into a JSON object: {"k":1<fragment>} parses
    val doc = s"""{"gate_offenders":{}$f}"""
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(doc)
    assert(node.get("rerun_crashed").size() === 2)
  }
}
