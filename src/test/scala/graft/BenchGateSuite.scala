package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function pins for graft.Bench's per-query gate plumbing (no
  * SparkSession — these must stay testable without timing anything). */
class BenchGateSuite extends AnyFunSuite {

  test("gateThreshold: 2x multiplier plus the 1.5s fixed-cost slack floor") {
    // sub-second baseline: the floor dominates — a 3-row query timed at
    // 1.4s under host contention (r7 driver capture) must NOT gate...
    assert(Bench.gateThreshold(0.25) === 2.0)
    assert(1.43 < Bench.gateThreshold(0.25))
    // ...while a genuine algorithmic cliff still fails by a wide margin
    assert(25.6 > Bench.gateThreshold(1.43))
    // multi-second baselines gate at effectively the pure 2x
    assert(Bench.gateThreshold(6.0) === 13.5)
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
