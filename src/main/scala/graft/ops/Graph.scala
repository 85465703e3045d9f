package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the relational tables — SURVEY.md §2.L35.
  *
  * PageRank-style centrality is the classic crawl-quality signal (the
  * reference's domain is a crawler landing tweets for downstream
  * analytics; a production crawl pipeline ranks hosts/pages by link
  * centrality to prioritize fetch and to score training-data quality).
  * There is no hyperlink column in the test schema, so the exhibit
  * builds the natural bipartite interaction graph the warehouse DOES
  * have — customer↔supplier via orders⋈lineitem — and ranks suppliers.
  *
  * Determinism at scale is the interesting part: textbook PageRank
  * accumulates doubles, and distributed double summation is
  * merge-order-dependent — two runs of the same job can disagree in the
  * last ulp and flip a top-k boundary. This implementation is
  * FIXED-POINT INTEGER PageRank: ranks live in int64 micro-units
  * (1.0 ≡ 1_000_000), each neighbor contribution is exact integer
  * division `r div outdeg`, and the damping update is
  * `150000 + (Σ·85) div 100` — every intermediate an exact int64, every
  * aggregation a mergeable integer sum, so the result is bit-identical
  * across partitionings, retries, and engines (the oracle runs the same
  * integer recurrence). Three unrolled iterations; each is one
  * equi-join (edges⋈ranks) + one partial-aggregable sum — the
  * Pregel-without-Pregel shape whose per-round cost is |E| shuffle rows
  * on the destination key. At crawl scale the edge list would be
  * persisted/bucketed by source so the per-round join never re-shuffles
  * the static side (cf. connectedComponents' pinned rounds,
  * ops/Dedup.scala).
  */
object Graph {

  /** One synchronous integer-PageRank round: r'(v) = 0.15 + 0.85·Σ_{u→v}
    * r(u)/deg(u), all in micro-unit int64 arithmetic. */
  private def step(edges: DataFrame, deg: DataFrame, r: DataFrame): DataFrame = {
    val ss = edges.sparkSession
    import ss.implicits._
    edges.join(r, Seq("u")).join(deg, Seq("u"))
      .select($"v", expr("r div outdeg").as("contrib"))
      .groupBy($"v").agg(sum($"contrib").as("c"))
      .select($"v".as("u"), (lit(150000L) + expr("(c * 85) div 100")).as("r"))
  }

  val qs: Map[String, Q] = Map(
    // L35: supplier centrality in the customer↔supplier order graph.
    // Undirected edges (both directions materialized) so the bipartite
    // graph has no dangling nodes — every node with an edge both emits
    // and receives each round. Node encoding: cust → 2k, supp → 2k+1
    // keeps one int64 id space with zero collisions.
    "q_graph_pagerank" -> ((s, d) => {
      import s.implicits._
      val oc = Tables.orders(s, d)
        .select($"o_orderkey".as("ok"), ($"o_custkey" * 2).as("cu"))
      val ls = Tables.lineitem(s, d)
        .select($"l_orderkey".as("ok"), ($"l_suppkey" * 2 + 1).as("su"))
      val e0 = oc.join(ls, Seq("ok")).select($"cu".as("u"), $"su".as("v")).distinct()
      // pin the static side once (Tungsten-format persist, cf. the CC
      // fixpoint): all three rounds re-join edges and deg, and without
      // the pin each round recomputes the orders⋈lineitem distinct —
      // the lazily-materialized pin lives inside the returned plan and
      // is freed by the caller's session-level cache release
      val (edges, _) = org.apache.spark.sql.graftshim.GraftShim.pinInternal(
        e0.union(e0.select($"v".as("u"), $"u".as("v"))),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (deg, _) = org.apache.spark.sql.graftshim.GraftShim.pinInternal(
        edges.groupBy($"u").agg(count(lit(1)).as("outdeg")),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val r0 = deg.select($"u", lit(1000000L).as("r"))
      val r3 = step(edges, deg, step(edges, deg, step(edges, deg, r0)))
      r3.filter($"u" % 2 === 1)
        .select(expr("(u - 1) div 2").as("supp_key"), $"r".as("rank_m"))
        .orderBy($"rank_m".desc, $"supp_key")
        .limit(20)
    })
  )
}
