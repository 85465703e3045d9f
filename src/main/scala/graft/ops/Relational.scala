package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans, filters/projections, joins, sorts/limits, set ops — SURVEY.md
  * §2.A/B/C/F/G. Each query is pure DataFrame DSL so Catalyst gets a fully
  * declarative plan (pushdown, pruning, join selection for free), the
  * Spark-native counterpart of the reference hand-compiling filters,
  * projections and limits into its API URL (reference src/main.py:89-101,
  * 95-96) and partition paths (src/main.py:70-73).
  */
object Relational {

  /** C13: salted repartition equi-join — the skew hardening for a
    * fact ⋈ dim join where BOTH sides are too large to broadcast and a
    * few whale keys dominate the fact. A plain shuffle join lands every
    * row of a hot key in ONE task; AQE's skew-join split repairs that
    * for sort-merge partitions it can subdivide, but not when the join
    * feeds a stateful/streaming stage or the skew re-appears after a
    * partial aggregate upstream — the salted form is the portable fix.
    * Mechanics: the fact side gets `_salt = pmod(saltOf, n)` from a
    * per-row deterministic column (any unique id — NOT the join key, or
    * every copy of the hot key lands on one salt), the dim side is
    * replicated n× (dim rows are unique per key, so replication is n·|dim|
    * — bounded, and each (key, salt) cell holds exactly one dim row), and
    * the join runs on (key, salt): the hot key's rows now spread across n
    * shuffle partitions. Join output is row-identical to the unsalted
    * join. The `merge` hint pins the shuffle plan the helper exists to
    * fix — at the scale this matters the dim side is far over any
    * broadcast threshold, and letting the local-test dim broadcast would
    * silently turn the exhibit into a BHJ (SkewSuite asserts the hot
    * key's output really spans ≥ n/2 partitions). */
  def saltedJoin(fact: org.apache.spark.sql.DataFrame,
                 dim: org.apache.spark.sql.DataFrame, key: String,
                 saltOf: org.apache.spark.sql.Column, nSalt: Int): org.apache.spark.sql.DataFrame = {
    val saltCol = "__graft_salt" // namespaced: must not collide with user columns
    val salted = fact.withColumn(saltCol,
      pmod(U.h64(saltOf.cast("string")), lit(nSalt.toLong)))
    val rep = dim.withColumn(saltCol,
      explode(sequence(lit(0L), lit(nSalt.toLong - 1L))))
    salted.join(rep.hint("merge"), Seq(key, saltCol)).drop(saltCol)
  }

  val qs: Map[String, Q] = Map(
    // ----- §2.A scans -------------------------------------------------
    // A2: full vectorized parquet scan, projected columns only (pruned scan).
    "q_scan_parquet" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice")
    }),
    // A1/F2: bounded scan — reference's MAX_RESULTS row cap (src/main.py:136).
    "q_scan_limit" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .limit(100)
    }),

    // ----- §2.B projections / filters ---------------------------------
    // B1: column projection ≙ tweet.fields list (src/main.py:90).
    "q_project" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),
    // B2: derived columns; exact int64 arithmetic (U.revC).
    "q_project_compute" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber",
          U.revC.as("revenue_c"),
          (U.cents($"l_quantity") + U.cents($"l_tax")).as("qty_tax_c"))
        .orderBy($"l_orderkey", $"l_linenumber", $"revenue_c", $"qty_tax_c")
    }),
    // B3/J1: equality filter ≙ `lang:en` (src/main.py:89).
    "q_filter_eq" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .filter($"lang" === "en")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    // B4/B9: negated + compound predicate ≙ `-is:retweet -#nbatopshot`.
    "q_filter_not" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .filter($"o_orderstatus" =!= "F" && !($"o_orderpriority" === "4-NOT SPECIFIED"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    }),
    // B5: pattern filter ≙ entity phrase match (src/main.py:99).
    "q_filter_like" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_type".like("%O%") || $"p_brand".like("Brand#1%"))
        .select("p_partkey", "p_type", "p_brand")
        .orderBy("p_partkey")
    }),
    // B6: temporal range ≙ start_time=utcnow-24h (src/main.py:263).
    "q_filter_range" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                $"l_shipdate" <  lit("1997-01-01").cast("timestamp"))
        .select($"l_orderkey", $"l_linenumber", U.dayStr($"l_shipdate").as("ship_day"))
        .orderBy($"l_orderkey", $"l_linenumber", $"ship_day")
    }),
    // B7: null guard ≙ `if 'data' in res` (src/main.py:148).
    "q_filter_null" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("st", when($"o_orderstatus" === "P", lit(null: String)).otherwise($"o_orderstatus"))
        .filter($"st".isNull)
        .select($"o_orderkey", coalesce($"st", lit("PENDING")).as("st"))
        .orderBy("o_orderkey")
    }),
    // B8: conditional expression ≙ Team-vs-League key choice (src/main.py:184-186).
    "q_case_when" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("bucket",
          when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), "hot")
            .when($"o_orderpriority" === "3-MEDIUM", "warm")
            .otherwise("cold"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), sum(U.cents($"o_totalprice")).as("total_c"))
        .orderBy("bucket")
    }),

    // ----- §2.C joins --------------------------------------------------
    // C1: broadcast hash join — dim side ≙ YAML config tables (src/main.py:49-61).
    "q_join_broadcast" -> ((s, d) => {
      import s.implicits._
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    }),
    // C1b/A4: the alias-enrichment join — the reference's ONLY join:
    // expand the topic config's aliases into a dimension and annotate
    // every document whose text contains one (src/main.py:171-186,
    // src/nba.yaml:6-7). The dim is config-sized (a handful of rows), so
    // it broadcasts and the containment predicate runs map-side over the
    // corpus scan — the big side never shuffles, at any scale. (The
    // resulting BroadcastNestedLoopJoin is the RIGHT plan here: "nested
    // loop" over a 3-row broadcast side is a per-row predicate battery,
    // not an O(n·m) blowup — pinned in PlanSuite.)
    "q_topic_alias" -> ((s, d) => {
      import s.implicits._
      val topic = graft.sources.TopicConfig.parseTopic(graft.sources.TopicConfig.ExampleTopicYaml)
      val dim = graft.sources.TopicConfig.topicDim(s, topic)
      Tables.documents(s, d)
        .join(broadcast(dim), contains($"text", $"alias"))
        .select($"doc_id", $"alias", $"topic", $"type")
        .orderBy("doc_id", "alias")
    }),
    // C2: shuffle join on the two fact tables (sort-merge / shuffled-hash by AQE).
    "q_join_inner" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select("o_orderkey", "l_linenumber", "o_orderstatus", "l_quantity")
        .orderBy("o_orderkey", "l_linenumber", "l_quantity")
    }),
    // C3: left outer — customers with zero orders kept at n_orders=0.
    "q_join_left" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"))
        .orderBy("c_custkey")
    }),
    // C4: left semi (EXISTS).
    "q_join_semi" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .join(Tables.lineitem(s, d), $"p_partkey" === $"l_partkey", "left_semi")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    }),
    // C3b: full outer — keys on either side survive with nulls opposite.
    "q_join_full" -> ((s, d) => {
      import s.implicits._
      val early = Tables.orders(s, d).filter(year($"o_orderdate") === 1996)
        .groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("n_1996"))
      val late = Tables.orders(s, d).filter(year($"o_orderdate") === 1997)
        .groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("n_1997"))
      early.join(late, Seq("k"), "full_outer")
        .select($"k", coalesce($"n_1996", lit(0L)).as("n_1996"),
          coalesce($"n_1997", lit(0L)).as("n_1997"))
        .orderBy("k")
    }),
    // C5: left anti (NOT EXISTS).
    "q_join_anti" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),
    // C6: multiway star join; small dims broadcast, facts shuffle once.
    "q_join_star" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(sum(U.revC).as("revenue_c"), count(lit(1)).as("n"))
        .orderBy("r_name")
    }),
    // C7: theta (non-equi) join. Semantics: per part, count suppliers with
    // s_acctbal < p_retailprice. The naive plan is an O(|part|·|supplier|)
    // BroadcastNestedLoopJoin; instead we decompose into a value-bucketed
    // histogram — count(s < p) = cum_count(buckets below) + strict-< count
    // inside p's bucket. The cross-bucket part is a broadcast join against
    // a tiny aggregated histogram; the within-bucket residual shuffles on
    // the bucket key only. Both stages stay O(n) at any scale.
    "q_join_theta" -> ((s, d) => {
      import s.implicits._
      val bucket = (c: org.apache.spark.sql.Column) => floor(c / 100).cast("long")
      val sup = Tables.supplier(s, d).select($"s_acctbal", bucket($"s_acctbal").as("bkt"))
      val hist = sup.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
      val parts = Tables.part(s, d)
        .select($"p_partkey", $"p_retailprice", bucket($"p_retailprice").as("bkt"))
      // densify the bucket domain across BOTH sides before the cumulative
      // sum — a part whose own bucket holds no suppliers must still see
      // the counts from all lower buckets (sparse histograms otherwise
      // drop them entirely)
      val bounds = parts.select($"bkt").union(hist.select($"bkt"))
        .agg(min($"bkt").as("lo"), max($"bkt").as("hi"))
      val dense = bounds.select(explode(sequence($"lo", $"hi")).as("bkt"))
      val wcum = Window.orderBy($"bkt").rowsBetween(Window.unboundedPreceding, -1)
      val cum = dense.join(hist, Seq("bkt"), "left")
        .na.fill(0, Seq("cnt"))
        .select($"bkt", coalesce(sum($"cnt").over(wcum), lit(0L)).as("below"))
      val inBucket = parts
        .join(sup, Seq("bkt"))
        .filter($"s_acctbal" < $"p_retailprice")
        .groupBy($"p_partkey").agg(count(lit(1)).as("n_in"))
      parts
        .join(broadcast(cum), Seq("bkt"), "left")
        .join(inBucket, Seq("p_partkey"), "left")
        .withColumn("n_cheaper", coalesce($"below", lit(0L)) + coalesce($"n_in", lit(0L)))
        .filter($"n_cheaper" > 0)
        .select($"p_partkey", $"n_cheaper")
        .orderBy("p_partkey")
    }),
    // C8: range join — equi key + temporal band residual.
    "q_join_range" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_early"))
        .orderBy("o_orderkey")
    }),
    // C9: bounded cross join (5 × 25).
    "q_join_cross" -> ((s, d) => {
      import s.implicits._
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    }),
    // C10: as-of join — for each purchase, the latest click at-or-before it
    // by the same user. Range join + row_number, the composed-builtins form.
    "q_join_asof" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val p = e.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"))
      val c = e.filter($"event_type" === "click")
        .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      val w = Window.partitionBy($"p_id").orderBy($"c_ts".desc_nulls_last, $"c_id".desc_nulls_last)
      p.join(c, $"user_id" === $"c_user" && $"c_ts" <= $"p_ts", "left_outer")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"p_id", $"user_id", $"c_id".as("asof_click_id"))
        .orderBy("p_id")
    }),

    // C10b: FORWARD as-of — for each purchase, the EARLIEST view strictly
    // after it by the same user (the attribution-forward / next-touch
    // direction; same window decomposition, ascending).
    "q_join_asof_fwd" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val p = e.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"))
      val v = e.filter($"event_type" === "view")
        .select($"event_id".as("v_id"), $"user_id".as("v_user"), $"ts".as("v_ts"))
      val w = Window.partitionBy($"p_id").orderBy($"v_ts".asc_nulls_last, $"v_id".asc_nulls_last)
      p.join(v, $"user_id" === $"v_user" && $"v_ts" > $"p_ts", "left_outer")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"p_id", $"user_id", $"v_id".as("next_view_id"))
        .orderBy("p_id")
    }),
    // E8: forward fill (gap filling) — last non-null observation carried
    // forward per user in event order (`last(ignoreNulls)` over the
    // running frame); nulls planted deterministically so both engines
    // fill the same gaps. The time-series imputation every metrics
    // pipeline runs; one window, no self-join.
    "q_win_fill" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("v_cents",
          when($"event_id" % 7 === 0, lit(null).cast("long"))
            .otherwise(U.cents($"value").cast("long")))
        .withColumn("filled", last($"v_cents", ignoreNulls = true).over(w))
        .select($"event_id", $"user_id", $"v_cents", $"filled")
        .orderBy("event_id")
    }),

    // ----- §2.F sorts / top-K -------------------------------------------
    // F1: global multi-column mixed-direction sort (range-partitioned SortExec).
    "q_sort_multi" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy($"o_orderpriority".asc, $"o_totalprice".desc, $"o_orderkey".asc)
    }),
    // F3: top-K ≙ "latest posts" (reference README.md:2) → TakeOrderedAndProject.
    "q_topk" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(50)
    }),

    // A8 row-level: CDC-style upsert compaction — union(base, updates) →
    // latest-wins per key. The merge the reference gets by overwriting a
    // whole date partition (src/main.py:70-73), done at row granularity:
    // the shuffle carries only the key + version ordinal, the standard
    // lakehouse compaction shape.
    "q_upsert_merge" -> ((s, d) => {
      import s.implicits._
      val base = Tables.events(s, d)
        .select($"event_id", $"user_id", U.micros($"value").as("value_c"), lit(0L).as("ver"))
      // the "update batch": re-delivered events with corrected values
      val updates = Tables.events(s, d)
        .filter($"event_id" % 100 === 0)
        .select($"event_id", $"user_id", (U.micros($"value") + 1000000L).as("value_c"),
          lit(1L).as("ver"))
      val w = Window.partitionBy($"event_id").orderBy($"ver".desc)
      base.unionByName(updates)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"event_id", $"user_id", $"value_c", $"ver".as("from_update"))
        .orderBy("event_id")
    }),

    // ----- subqueries (Athena SQL surface, SURVEY §3.3/§4) --------------
    // Scalar subquery: orders above the global average, compared in EXACT
    // int64 by cross-multiplying (total_c · n > Σ total_c ⟺ total_c >
    // avg). `AVG(bigint)` itself would be the latent scale bug: Spark's
    // Average accumulates integral input in a DOUBLE, so past 2^53
    // cumulative cents (~2 B orders) the mean picks up merge-order-
    // dependent rounding — two runs of the same job could disagree at the
    // boundary — while DuckDB's 128-bit AVG stays exact. The product form
    // is wrap-safe to ~2×10^17 orders (max total_c ≈ 5×10^7 cents ×
    // count < 2^63) and every intermediate is an exact integer in both
    // engines at ANY corpus size.
    "q_subquery_scalar" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("total_c", floor(col("o_totalprice") * 100).cast("long"))
        .createOrReplaceTempView("orders_sq")
      s.sql("""
        SELECT o_orderkey, total_c FROM orders_sq
        WHERE total_c * (SELECT COUNT(*) FROM orders_sq)
              > (SELECT SUM(total_c) FROM orders_sq)
        ORDER BY o_orderkey
      """)
    }),
    // IN subquery (decorrelated to a semi join by Catalyst).
    "q_subquery_in" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_sq")
      Tables.orders(s, d).createOrReplaceTempView("orders_sq2")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_sq
        WHERE c_custkey IN (SELECT o_custkey FROM orders_sq2
                            WHERE o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
      """)
    }),

    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    // each other instead of vanishing — the join semantics migrating SQL
    // uses for "same value or both missing". The NULLs are derived
    // (urgent → NULL) since the test tables carry none natively; a plain
    // equi-join here would silently drop every urgent order, and the
    // '(urgent-as-null)' output row proves they survived. EqualNullSafe
    // is still a hash-joinable equi-condition (no nested loop).
    "q_join_nullsafe" -> ((s, d) => {
      import s.implicits._
      val facts = Tables.orders(s, d)
        .select($"o_orderkey", expr("nullif(o_orderpriority, '1-URGENT')").as("prio"))
      val dim = facts.select($"prio").distinct()
        .select($"prio", coalesce($"prio", lit("(urgent-as-null)")).as("prio_tag"))
      facts.as("f").join(dim.as("d"), $"f.prio" <=> $"d.prio")
        .groupBy($"prio_tag")
        .agg(count(lit(1)).as("n"), min($"o_orderkey").as("first_key"))
        .orderBy("prio_tag")
    }),
    // C13: the salted join exhibit — cohort enrichment over a planted
    // whale key. The fact collapses every 7th user onto cohort key 0
    // (~14% of all events on ONE key — the test tables are uniform, so
    // the skew is planted in-query, spliced identically in the oracle);
    // the dim is the per-cohort profile aggregated from the fact itself
    // (at crawl scale: a billion-row user-profile table — never
    // broadcastable). The salted mechanics are semantically invisible —
    // the oracle is the PLAIN join — while SkewSuite pins the physical
    // effect (hot key spread across ≥ nSalt/2 partitions, row-identical
    // output).
    "q_join_salted" -> ((s, d) => {
      import s.implicits._
      val f = Tables.events(s, d)
        .select($"event_id", $"event_type",
          when($"user_id" % 7 === 0, 0L).otherwise($"user_id").as("uk"))
      val dim = f.groupBy($"uk").agg(count(lit(1)).as("n_cohort"))
      Relational.saltedJoin(f, dim, "uk", $"event_id", 8)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"n_cohort").as("cohort_weight"))
        .orderBy("event_type")
    }),
    // Correlated EXISTS — Catalyst decorrelates it (RewritePredicateSubquery)
    // into a LeftSemi whose join condition carries BOTH the correlation key
    // and the per-row comparison; distinct from q_subquery_in (uncorrelated
    // IN) and q_join_semi (explicit semi): this is the shape migrating SQL
    // actually arrives in.
    "q_exists_correlated" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_ex")
      Tables.orders(s, d).createOrReplaceTempView("orders_ex")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_ex c
        WHERE EXISTS (SELECT 1 FROM orders_ex o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'
                        AND o.o_totalprice > c.c_acctbal)
        ORDER BY c_custkey
      """)
    }),
    // UNPIVOT / melt: wide measure columns → (measure, value) rows — the
    // reshape feeding a generic metrics pipeline. stack() is the built-in
    // generator form: one pass over the input, rows emitted map-side (no
    // join, no shuffle beyond the final ORDER BY); the oracle pins it to
    // the portable 3-way UNION ALL definition.
    "q_unpivot" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_orderkey" <= 100)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
          expr("stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice, 'discount', l_discount)")
            .as(Seq("measure", "val")))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    }),

    // ----- §2.G set ops --------------------------------------------------
    // G1: UNION ALL ≙ multi-platform fan-out union (src/main.py:212-219).
    "q_union_all" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val hot = o.filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
        .select($"o_orderkey", lit("hot").as("tag"))
      val cold = o.filter($"o_orderpriority".isin("4-NOT SPECIFIED", "5-LOW"))
        .select($"o_orderkey", lit("cold").as("tag"))
      hot.unionByName(cold).orderBy("o_orderkey", "tag")
    }),
    // G2: UNION distinct.
    "q_union_distinct" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      c.filter($"c_mktsegment" === "BUILDING").select($"c_nationkey".cast("long").as("nk"))
        .union(c.filter($"c_mktsegment" === "MACHINERY").select($"c_nationkey".cast("long").as("nk")))
        .distinct()
        .orderBy("nk")
    }),
    // G3: INTERSECT — custkeys active in both years.
    "q_intersect" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      o.filter(year($"o_orderdate") === 1996).select($"o_custkey")
        .intersect(o.filter(year($"o_orderdate") === 1997).select($"o_custkey"))
        .orderBy("o_custkey")
    }),
    // G4: EXCEPT — new-rows-since-last-run semantics (src/main.py:263 overlap).
    "q_except" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      o.filter(year($"o_orderdate") === 1996).select($"o_custkey")
        .except(o.filter(year($"o_orderdate") === 1997).select($"o_custkey"))
        .orderBy("o_custkey")
    }),
    // G3b/G4b: the ALL (bag-semantics) forms — multiplicity is data at
    // dedup scale (how many copies survive both runs), and the plan is a
    // different physical shape from the DISTINCT forms: no aggregate,
    // multiplicity arithmetic rides the join. Output is aggregated per
    // key for a stable oracle compare.
    "q_intersect_all" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      o.filter(year($"o_orderdate") === 1996).select($"o_custkey")
        .intersectAll(o.filter(year($"o_orderdate") === 1997).select($"o_custkey"))
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_copies"))
        .orderBy("o_custkey")
    }),
    "q_except_all" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      o.filter(year($"o_orderdate") === 1996).select($"o_custkey")
        .exceptAll(o.filter(year($"o_orderdate") === 1997).select($"o_custkey"))
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_copies"))
        .orderBy("o_custkey")
    })
  )
}
