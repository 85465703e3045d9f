package graft

import graft.streaming.{Ev, Stateful, UserState}
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.api.java.Optional

/** Skew hardening for the §2.I6 state functions: one "whale" key
  * receiving millions of events in a single micro-batch must fold in
  * O(1) heap. The event iterators below are generated lazily — with the
  * old toSeq.sortBy buffering this materializes tens of millions of
  * objects at once; the incremental folds never hold more than one. */
class WhaleKeySuite extends AnyFunSuite {

  private val N = 10_000_000L

  // lazily generated: event i at ts=i micros, value 3 micro-units
  private def whale(n: Long): Iterator[Ev] =
    (0L until n).iterator.map(i => Ev(i, i, 42L, if (i == n - 1) "last" else "mid", 3L))

  test("update folds 10M events through one key incrementally (O(1) heap)") {
    val state = TestGroupState.create[UserState](
      Optional.empty(), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(), false)
    val (user, st) = Stateful.update(42L, whale(N), state)
    assert(user == 42L)
    assert(st.n_events == N)
    assert(st.value_c == 3L * N)
    assert(st.last_type == "last")
    assert(st.lastTsMicros == N - 1)
    assert(st.lastId == N - 1)
    assert(state.get == st)
  }

  test("update result is order-independent (commutative fold)") {
    def run(evs: Iterator[Ev]): UserState = {
      val state = TestGroupState.create[UserState](
        Optional.empty(), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(), false)
      Stateful.update(7L, evs, state)._2
    }
    val evs = Seq(Ev(1, 100, 7, "a", 5), Ev(2, 300, 7, "b", 7), Ev(3, 200, 7, "c", 11))
    assert(run(evs.iterator) == run(evs.reverse.iterator))
    assert(run(evs.iterator) == run(scala.util.Random.shuffle(evs).iterator))
  }

  test("milestoneFold streams 10M events through one key, emissions exact") {
    val state = TestGroupState.create[Long](
      Optional.of(4_000_000L), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(), false)
    val out = Stateful.milestoneFold(42L, whale(N), state).toSeq
    val total = 4_000_000L + 3L * N
    assert(state.get == total)
    val wantFrom = 4_000_000L / Stateful.MilestoneStep + 1
    val wantTo = total / Stateful.MilestoneStep
    assert(out.map(_.threshold) == (wantFrom to wantTo).map(_ * Stateful.MilestoneStep))
    assert(out.forall(_.user_id == 42L))
  }

  test("milestoneFold emissions are exactly-once across any batching") {
    val evs = Seq(Ev(1, 1, 9, "a", 4_000_000L), Ev(2, 2, 9, "a", 7_000_000L),
      Ev(3, 3, 9, "a", 12_000_000L), Ev(4, 4, 9, "a", 1_000_000L))
    def run(batches: Seq[Seq[Ev]]): Seq[Long] = {
      var st = Optional.empty[Long]()
      batches.flatMap { b =>
        val state = TestGroupState.create[Long](
          st, GroupStateTimeout.NoTimeout(), 0L, Optional.empty(), false)
        val out = Stateful.milestoneFold(9L, b.iterator, state).toSeq
        st = Optional.of(state.get)
        out.map(_.threshold)
      }
    }
    val oneBatch = run(Seq(evs))
    val perEvent = run(evs.map(Seq(_)))
    val split = run(Seq(evs.take(2), evs.drop(2)))
    assert(oneBatch == perEvent && oneBatch == split)
    assert(oneBatch == Seq(10000000L, 20000000L))
  }

  test("connectedComponents handles a whale hub: 50k-spoke star converges in one round") {
    // a hub vertex with 50k neighbors is the dedup-graph skew shape
    // (one boilerplate doc near-dup to everything); the grouped min is
    // partial-aggregable so the hub's in-edges combine map-side
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val spokes = 50000
    val edges = spark.range(1, spokes + 1)
      .select(lit(0L).as("u"), $"id".as("v"))
    val t0 = System.nanoTime()
    val labels = graft.ops.Dedup.connectedComponents(edges)
    val byLbl = labels.groupBy($"lbl").count().collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(byLbl.length == 1 && byLbl.head.getLong(0) == 0L &&
      byLbl.head.getLong(1) == spokes + 1L)
    assert(secs < 60, s"whale-hub CC took ${secs}s")
  }

  test("star CC flattens a 1000-link chain in O(log n) rounds, not O(diameter)") {
    // the pathological shape for hash-to-min: a path graph of diameter
    // 999 would need ~500 label-propagation rounds; the alternating
    // large-star/small-star scheme pointer-doubles instead
    val spark = SparkSpec.session
    import spark.implicits._
    val n = 1000L
    val edges = spark.range(0, n - 1)
      .select($"id".as("u"), ($"id" + 1L).as("v"))
    val (labels, rounds) = graft.ops.Dedup.connectedComponentsStar(edges)
    val byLbl = labels.groupBy($"lbl").count().collect()
    assert(byLbl.length == 1 && byLbl.head.getLong(0) == 0L &&
      byLbl.head.getLong(1) == n, s"chain did not collapse to one component: ${byLbl.toSeq}")
    // 2·log2(1000) ≈ 20; generous headroom, but far below diameter/2
    assert(rounds <= 30, s"star CC took $rounds rounds on a 1000-chain")
  }

  test("hash-to-min round cap contracts and finishes on the star engine") {
    // a 200-link chain (diameter 199) with maxRounds=3 forces the
    // contraction fallback; labels must still equal the component min,
    // and disconnected components must stay separate through contraction
    val spark = SparkSpec.session
    import spark.implicits._
    val chain = spark.range(0, 199).select($"id".as("u"), ($"id" + 1L).as("v"))
    val second = spark.range(1000, 1050).select($"id".as("u"), ($"id" + 1L).as("v"))
    val labels = graft.ops.Dedup.connectedComponents(chain.union(second), maxRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 251)
    assert((0L to 199L).forall(labels(_) == 0L), "chain component label != min")
    assert((1000L to 1050L).forall(labels(_) == 1000L), "second component label != min")
  }
}
