package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Aggregations — SURVEY.md §2.D. Reference anchors: the global running
  * count with early termination (reference src/main.py:156) and the
  * per-topic/per-day rollups implied by the partitioned landing layout
  * (src/main.py:70-73,184-191). All group-bys are two-phase hash
  * aggregates (partial map-side combine + final) — the shape that scales
  * to 100 TB because the shuffle carries only group keys × partial states.
  */
object Aggregates {

  /** D16 sketch: Misra–Gries frequent-items summary with K counters — a
    * mergeable bounded-memory heavy-hitter candidate generator (Agarwal
    * et al., "Mergeable Summaries", PODS '12): after any sequence of
    * partial merges, every item with true frequency > N/(K+1) is
    * guaranteed present in the summary. State per partition is ≤K
    * entries no matter how many distinct keys stream past — the property
    * that makes the op viable when the key domain itself doesn't fit in
    * memory (exact top-k via groupBy would shuffle the full domain). */
  private val MgK = 64
  object MisraGriesAgg extends Aggregator[String, Map[String, Long], Seq[String]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      b.get(t) match {
        case Some(c) => b.updated(t, c + 1L)
        case None if b.size < MgK => b.updated(t, 1L)
        // full and t absent: decrement all (t's implicit counter and the
        // K stored ones — the classic "cancel K+1 distinct items" step)
        case None => b.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val m = b.foldLeft(a) { case (acc, (k, c)) => acc.updated(k, acc.getOrElse(k, 0L) + c) }
      if (m.size <= MgK) m
      else {
        // subtract the (K+1)-th largest count from everything and drop
        // non-positives — the PODS'12 merge that preserves the N/(K+1)
        // error bound under arbitrary merge trees
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(MgK)
        m.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
      }
    }
    def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** Exact (n, Σx, Σx², Σy, Σy², Σxy) per l_returnflag from long (x, y)
    * columns, two-phase: int64 partial sums per (group, input
    * partition) — pure whole-stage-codegen long arithmetic — then a
    * Decimal(38,0) merge of the #partitions×#groups partial rows.
    * Exactness contract: sum(long) per partition cannot wrap as long as
    * rows-per-input-partition × max(y²) < 2^63 — with 128 MB parquet
    * splits (≤ ~3M rows) and y ≤ ~1e5 that holds with ~7 orders of
    * magnitude of margin, and ANY partitioning gives the same final
    * sums (int64 addition is exact and associative below the bound).
    * The decimal widening then happens on the tiny merge only: DuckDB's
    * HUGEINT-promoting SUM(BIGINT) and this pipeline produce identical
    * moments at any scale, without paying object-decimal arithmetic on
    * every row (the r8 all-decimal version measured ~3× the r4 long
    * baseline on the bench; this restores the long path and keeps the
    * 100 TB no-wrap guarantee). */
  private[graft] def momentSums(xy: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = xy.sparkSession
    import s.implicits._
    xy.groupBy($"l_returnflag", spark_partition_id().as("_pid"))
      .agg(count(lit(1)).as("n0"),
        sum($"x").as("sx0"), sum($"x" * $"x").as("sxx0"),
        sum($"y").as("sy0"), sum($"y" * $"y").as("syy0"),
        sum($"x" * $"y").as("sxy0"),
        greatest(max(abs($"x")), max(abs($"y"))).as("m0"))
      // The exactness contract above is ENFORCED, not just documented: if
      // a single input partition is so large (non-splittable file,
      // upstream coalesce) that rows × max(|x|,|y|)² approaches 2^63, the
      // int64 partials could wrap silently and still look plausible
      // downstream. Conservative log-domain check (Σ|v²| ≤ n·max², 0.1
      // bit of double-rounding margin) on the tiny per-(group, partition)
      // row set; a filter over assert_true cannot be pruned away, so a
      // breach fails the job loudly with a repartition hint.
      .filter(assert_true(
        log2(greatest($"n0", lit(1L)).cast("double")) +
          lit(2.0) * log2(greatest($"m0", lit(1L)).cast("double")) < lit(62.9),
        lit("momentSums exactness envelope breached: partition rows × max(value)² " +
          "approaches 2^63 — split the input (smaller files / repartition) " +
          "or reduce the value scaling")).isNull)
      .groupBy($"l_returnflag")
      .agg(sum($"n0").as("n"),
        sum($"sx0".cast("decimal(38,0)")).as("sx"),
        sum($"sxx0".cast("decimal(38,0)")).as("sxx"),
        sum($"sy0".cast("decimal(38,0)")).as("sy"),
        sum($"syy0".cast("decimal(38,0)")).as("syy"),
        sum($"sxy0".cast("decimal(38,0)")).as("sxy"))
  }

  val qs: Map[String, Q] = Map(
    // D16: exact heavy hitters via sketch→verify — the MG summary
    // (bounded memory, mergeable) nominates ≤K candidates, then ONLY the
    // candidates are recounted exactly (broadcast semi-join, no
    // full-domain shuffle) and thresholded on the exact count: results
    // are EXACT, memory is O(K), guarantee cnt > N/25 ⊂ cnt > N/(K+1)
    // so no qualifying key can be missed. The key stream plants
    // deterministic skew over the uniform test table (3 hot keys at
    // ~6.7% each over a 7919-key cold tail, same splice in the oracle)
    // because heavy-hitter semantics need a heavy tail to demonstrate.
    "q_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val keyed = Tables.events(s, d).select(
        when($"event_id" % 5 === 0, concat(lit("hot_"), ($"event_id" % 3).cast("string")))
          .otherwise(concat(lit("cold_"), ($"event_id" % 7919).cast("string"))).as("k"))
      val cands = keyed.as[String].select(MisraGriesAgg.toColumn.name("ks"))
        .toDF("ks").select(explode($"ks").as("k"))
      val totals = keyed.agg(count(lit(1)).as("total"))
      keyed.join(broadcast(cands), Seq("k"), "left_semi")
        .groupBy($"k").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(totals))
        .filter($"cnt" * 25 > $"total")
        .select($"k", $"cnt")
        .orderBy($"cnt".desc, $"k")
    }),
    // D1: global aggregate, one row.
    "q_agg_global" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        sum(U.cents($"l_quantity")).as("qty_c"),
        sum(U.revC).as("rev_c"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"),
        countDistinct($"l_orderkey").as("n_orders"),
        (sum(U.cents($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price_c"))
    }),
    // D2: hash group-by (TPC-H Q1 shape).
    "q_agg_group" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(U.cents($"l_quantity")).as("sum_qty_c"),
          sum(U.cents($"l_extendedprice")).as("sum_base_c"),
          sum(U.revC).as("sum_disc_c"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // D10: incremental aggregation (partial-state merge) — the 100 TB
    // daily pattern: history is never rescanned. The pre-2024-01-20
    // "history" is reduced to per-group partial state once, the fresh
    // slice is aggregated alone, and the two are MERGED by re-aggregating
    // the union of states — lossless because count/sum are algebraic
    // (merge = sum of partials). Oracle is the FULL recompute, proving
    // merge == rescan; at scale the history branch is a tiny stored
    // summary table instead of a scan.
    "q_agg_incremental" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).withColumn("vm", U.micros($"value"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"vm").as("value_micros"))
      val hist = partial(ev.filter($"ts" < lit("2024-01-20").cast("timestamp")))
      val fresh = partial(ev.filter($"ts" >= lit("2024-01-20").cast("timestamp")))
      hist.union(fresh)
        .groupBy($"event_type")
        .agg(sum($"n").as("n"), sum($"value_micros").as("value_micros"))
        .orderBy("event_type")
    }),
    // Per-group outlier detection with EXACT integer moment math — the
    // classically floating-point op (|x − μ| > kσ) done deterministically:
    // the test (x·n − Σx)² · 4 > 9 · (n·Σx² − (Σx)²) is |x−μ| > 1.5σ
    // cleared of every division and sqrt (k = 1.5 because the uniform-ish
    // value column HAS no 2σ tail), evaluated in decimal(38,0) so the
    // ~1e19 intermediates never overflow or round. Two-phase at scale:
    // the moment table is group-cardinality-sized and broadcast back;
    // count/sum/sum-of-squares are all partial-aggregable.
    "q_agg_outliers" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"event_type", U.cents($"value").cast("decimal(38,0)").as("x"))
      val st = ev.groupBy($"event_type").agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum($"x").as("sum_c"),
        sum($"x" * $"x").as("ssq"))
      ev.join(broadcast(st), "event_type")
        .withColumn("dev", $"x" * $"n" - $"sum_c")
        .withColumn("is_out",
          (lit(4) * $"dev" * $"dev" > lit(9) * ($"n" * $"ssq" - $"sum_c" * $"sum_c"))
            .cast("int").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"is_out").as("n_outliers"),
          max(when($"is_out" === 1, $"x".cast("long"))).as("max_outlier_cents"))
        .orderBy("event_type")
    }),
    // Data-quality constraint report (the Deequ/dbt-test shape): one
    // pass over the fact table computing row count, PK-duplicate count,
    // null rate, domain violations, plus an FK-orphan anti-join against
    // the dim — emitted as a tall (check_name, violations) report. The
    // test tables are clean by construction, so deterministic dirt is
    // planted in-query (null/orphan user_ids, negated values, a
    // duplicated slice) identically in the oracle; the report counts
    // exactly the planted rows. Scale shape: every metric is one
    // partial-aggregable pass; the orphan check shuffles only FK keys.
    "q_quality_report" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"event_id",
          when($"event_id" % 97 === 0, lit(null).cast("long"))
            .when($"event_id" % 103 === 0, $"user_id" + 1000000L)
            .otherwise($"user_id").as("uid"),
          when($"event_id" % 89 === 0, -$"value").otherwise($"value").as("v"))
      val dirty = ev.union(ev.filter($"event_id" % 101 === 0))
      val orphans = dirty.filter($"uid".isNotNull)
        .join(Tables.customer(s, d).select($"c_custkey"),
          $"uid" === $"c_custkey", "left_anti")
        .agg(count(lit(1)).as("fk_orphans"))
      dirty.agg(
          count(lit(1)).as("row_count"),
          (count(lit(1)) - countDistinct($"event_id")).as("pk_dupes"),
          sum(when($"uid".isNull, 1L).otherwise(0L)).as("null_user_id"),
          sum(when($"v" < 0, 1L).otherwise(0L)).as("negative_value"))
        .crossJoin(broadcast(orphans))
        .selectExpr("""stack(5,
            'fk_orphans', fk_orphans,
            'negative_value', negative_value,
            'null_user_id', null_user_id,
            'pk_dupes', pk_dupes,
            'row_count', row_count) AS (check_name, violations)""")
        .orderBy("check_name")
    }),
    // Exact distinct via bitmap aggregates (the re-aggregable distinct
    // pattern): values bucket into 32k-bit bitmaps
    // (bitmap_bucket_number/bit_position), per-bucket bitmaps OR
    // together (bitmap_construct_agg), popcount (bitmap_count), sum.
    // Unlike COUNT(DISTINCT), the per-bucket bitmaps are STORABLE and
    // mergeable with bitmap_or_agg — the incremental-distinct shape
    // (store per-day bitmaps, union for any date range, never rescan) —
    // yet the answer is exact, which is why the oracle is plain
    // COUNT(DISTINCT).
    "q_agg_bitmap" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag",
          expr("bitmap_bucket_number(l_partkey)").as("bkt"),
          expr("bitmap_bit_position(l_partkey)").as("pos"))
        .groupBy($"l_returnflag", $"bkt")
        .agg(expr("bitmap_count(bitmap_construct_agg(pos))").as("c"))
        .groupBy($"l_returnflag")
        .agg(sum($"c").as("n_distinct_parts"))
        .orderBy("l_returnflag")
    }),
    // D14b: INCREMENTAL exact distinct — the D11 hist/fresh merge shape
    // applied to the one metric additive partials cannot carry:
    // COUNT(DISTINCT). Per-slice state is (group, bucket, bitmap) via
    // bitmap_construct_agg; merging any set of slices is bitmap_or_agg
    // (associative + commutative + idempotent — re-delivered slices
    // cannot double-count, unlike a sum), so day-over-day state folds
    // losslessly and the final count is EXACT, which is why the oracle
    // is a plain COUNT(DISTINCT) full recompute. At 100 TB the stored
    // per-day bitmap table answers any date-range distinct without
    // rescanning a single event row — the cost no sketch (HLL merge
    // loses exactness) or expand-distinct (rescan) matches.
    "q_agg_bitmap_incr" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"ts", $"user_id")
      def partial(df: org.apache.spark.sql.DataFrame) = df
        .select($"event_type",
          expr("bitmap_bucket_number(user_id)").as("bkt"),
          expr("bitmap_bit_position(user_id)").as("pos"))
        .groupBy($"event_type", $"bkt")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      val hist = partial(ev.filter($"ts" < lit("2024-01-20").cast("timestamp")))
      val fresh = partial(ev.filter($"ts" >= lit("2024-01-20").cast("timestamp")))
      hist.unionByName(fresh)
        .groupBy($"event_type", $"bkt")
        .agg(expr("bitmap_count(bitmap_or_agg(bm))").as("c"))
        .groupBy($"event_type")
        .agg(sum($"c").as("n_distinct_users"))
        .orderBy("event_type")
    }),
    // D3: distinct aggregation (expand + two-phase plan).
    "q_agg_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(countDistinct($"o_custkey").as("n_cust"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),
    // D4: filtered/conditional aggregation.
    "q_agg_filtered" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(
          sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L)).as("n_urgent"),
          sum(when($"o_totalprice" > 100000, U.cents($"o_totalprice")).otherwise(0L)).as("big_c"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),
    // D5: ROLLUP over the region→nation hierarchy.
    "q_agg_rollup" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n"))
        .select(coalesce($"r_name", lit("ALL")).as("r"),
                coalesce($"n_name", lit("ALL")).as("n_nm"), $"n")
        .orderBy("r", "n_nm")
    }),
    // D6: CUBE.
    "q_agg_cube" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(U.cents($"o_totalprice")).as("total_c"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("st"),
                coalesce($"o_orderpriority", lit("ALL")).as("prio"), $"n", $"total_c")
        .orderBy("st", "prio")
    }),
    // D7: GROUPING SETS — SQL-only surface, via Spark SQL on a temp view.
    "q_agg_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS st,
               COALESCE(o_orderpriority, 'ALL') AS prio,
               COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY st, prio
      """)
    }),
    // D8: HLL sketch — mergeable across partitions/days, the 100 TB-safe
    // distinct count. The sketch value itself is algorithm-specific (no
    // DuckDB twin), so the query CERTIFIES it instead (VERDICT r10 #5):
    // `bound_ok` is true iff the sketch landed within the declared
    // ±5·rsd accuracy envelope of the exact count computed in the same
    // pass — the oracle emits the exact count and literal TRUE, so a
    // sketch outside its bound breaks the hash compare. Deterministic:
    // HLL register merge is element-wise max (order-free), so the
    // estimate is a fixed number for a fixed input.
    "q_agg_hll" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"),
             countDistinct($"user_id").as("exact_users"))
        .select($"event_type", $"exact_users",
          (abs($"approx_users" - $"exact_users") <=
            greatest(lit(1L), floor(lit(5 * 0.02) * $"exact_users").cast("long")))
            .as("bound_ok"))
        .orderBy("event_type")
    }),
    // PIVOT: status columns per priority (groupBy().pivot() with explicit
    // pivot values — never let the engine scan for distinct values on a
    // 100 TB table).
    "q_agg_pivot" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .select($"o_orderpriority", $"F".as("n_f"), $"O".as("n_o"), $"P".as("n_p"))
        .orderBy("o_orderpriority")
    }),
    // Approx percentiles — the mergeable KLL-style sketch
    // (approx_percentile) that replaces the exact sort-based form at
    // 100 TB. The sketch value is algorithm-specific (no DuckDB twin),
    // so the query CERTIFIES it (VERDICT r10 #5): GK guarantees rank
    // error ≤ ε·n (ε = 1/accuracy = 0.001) under ANY merge order, so
    // the estimate must lie inside the exact [p(0.5−10ε), p(0.5+10ε)]
    // value window; `bound_ok` asserts that, the oracle emits the exact
    // median and literal TRUE — a sketch outside its rank envelope
    // breaks the hash compare.
    "q_agg_approx_pct" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("total_c", U.cents($"o_totalprice"))
        .groupBy($"o_orderpriority")
        .agg(
          expr("approx_percentile(total_c, 0.5, 1000)").as("approx_median_c"),
          round(expr("percentile(total_c, 0.5)"), 6).as("exact_median_c"),
          round(expr("percentile(total_c, 0.49)"), 6).as("p_lo"),
          round(expr("percentile(total_c, 0.51)"), 6).as("p_hi"),
          count(lit(1)).as("n"))
        .select($"o_orderpriority", $"exact_median_c", $"n",
          ($"approx_median_c" >= $"p_lo" && $"approx_median_c" <= $"p_hi")
            .as("bound_ok"))
        .orderBy("o_orderpriority")
    }),
    // Exact percentiles (linear interpolation — same formula in DuckDB's
    // quantile_cont) over int64 cents.
    "q_agg_percentile" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("total_c", U.cents($"o_totalprice"))
        .groupBy($"o_orderpriority")
        .agg(
          round(expr("percentile(total_c, 0.25)"), 6).as("p25_c"),
          round(expr("percentile(total_c, 0.5)"), 6).as("median_c"),
          round(expr("percentile(total_c, 0.9)"), 6).as("p90_c"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),
    // D15: statistical aggregate family (variance/stddev/covariance/
    // correlation) from EXACT integer moments. Spark's stddev/corr
    // accumulate floating-point state whose partition merge order is
    // nondeterministic — unusable under a bit-identical oracle and a
    // repeatability contract. Here one partial-aggregable pass collects
    // the six classical moments (n, Σx, Σx², Σy, Σy², Σxy) as exact int64
    // sums (order-free), and every statistic is a FIXED IEEE expression
    // over those integers, identical in the oracle: the shuffle carries
    // six numbers per group at any scale, and the same moments are
    // storable/mergeable for incremental stats (cf. q_agg_incremental).
    "q_agg_stats" -> ((s, d) => {
      import s.implicits._
      momentSums(Tables.lineitem(s, d)
        .select($"l_returnflag",
          $"l_quantity".cast("long").as("x"),
          floor($"l_extendedprice").cast("long").as("y")))
        .select($"l_returnflag", $"n",
          round($"sx".cast("double") / $"n".cast("double"), 6).as("mean_x"),
          round($"sy".cast("double") / $"n".cast("double"), 6).as("mean_y"),
          // var_pop = (nΣx² − (Σx)²)/n² — numerators in double (Σy² terms
          // exceed int64 when multiplied by n; the moments themselves are
          // < 2^53 so the conversion is exact and the arithmetic is the
          // same single-rounded IEEE ops in both engines)
          round(($"n".cast("double") * $"sxx".cast("double")
            - $"sx".cast("double") * $"sx".cast("double"))
            / ($"n".cast("double") * $"n".cast("double")), 6).as("var_pop_x"),
          round(sqrt(($"n".cast("double") * $"sxx".cast("double")
            - $"sx".cast("double") * $"sx".cast("double"))
            / ($"n".cast("double") * ($"n".cast("double") - 1.0))), 6).as("stddev_samp_x"),
          round(($"n".cast("double") * $"sxy".cast("double")
            - $"sx".cast("double") * $"sy".cast("double"))
            / ($"n".cast("double") * $"n".cast("double")), 6).as("covar_pop"),
          round(($"n".cast("double") * $"sxy".cast("double")
            - $"sx".cast("double") * $"sy".cast("double"))
            / (sqrt($"n".cast("double") * $"sxx".cast("double")
                - $"sx".cast("double") * $"sx".cast("double"))
              * sqrt($"n".cast("double") * $"syy".cast("double")
                - $"sy".cast("double") * $"sy".cast("double"))), 6).as("corr_xy"))
        .orderBy("l_returnflag")
    }),
    // D15b: per-group OLS trend fit (slope/intercept/R²) from the SAME
    // exact integer moments as q_agg_stats — the canonical "fit a line
    // per segment" analytics op (quantity vs price here; tokens-per-doc
    // vs quality score in a curation pipeline). One partial-aggregable
    // pass collects (n, Σx, Σx², Σy, Σy², Σxy) as order-free int64 sums;
    // each statistic is then a FIXED single-rounding IEEE expression over
    // those exact integers, identical in the DuckDB oracle — so the
    // result is bit-stable across partitionings and engines, and the
    // moments are mergeable for incremental refits at 100 TB.
    "q_agg_regression" -> ((s, d) => {
      import s.implicits._
      val m = momentSums(Tables.lineitem(s, d)
        .select($"l_returnflag",
          $"l_quantity".cast("long").as("x"),
          floor($"l_extendedprice").cast("long").as("y")))
      val nd  = $"n".cast("double")
      val sx  = $"sx".cast("double");  val sxx = $"sxx".cast("double")
      val sy  = $"sy".cast("double");  val syy = $"syy".cast("double")
      val sxy = $"sxy".cast("double")
      val covN = nd * sxy - sx * sy     // n·cov numerator (exact-int inputs)
      val varXN = nd * sxx - sx * sx    // n·var_x numerator
      val varYN = nd * syy - sy * sy
      val slope = covN / varXN
      m.select($"l_returnflag", $"n",
          round(slope, 6).as("slope"),
          round((sy - slope * sx) / nd, 6).as("intercept"),
          round(covN * covN / (varXN * varYN), 6).as("r2"))
        .orderBy("l_returnflag")
    }),
    // D17: Shannon entropy of the per-day event-type mix — the
    // distribution-drift / content-mix monitor a training-data pipeline
    // runs per ingest batch (a collapsing entropy = one source flooding
    // the corpus; cf. q_split_drift's pairwise TV distance). Exact
    // (day, type) counts shuffle map-side-combined; each type's
    // p·ln(1/p) term is quantized to int64 micro-nats PER ROW (the same
    // per-row-quantize-then-integer-sum scheme as q_text_perplexity), so
    // the per-day sum is order-free and bit-identical to the oracle at
    // any partitioning. Work ∝ days × |event types| after the first
    // aggregate — flat at 100 TB.
    "q_agg_entropy" -> ((s, d) => {
      import s.implicits._
      val c = Tables.events(s, d)
        .select(U.dayStr($"ts").as("day"), $"event_type")
        .groupBy($"day", $"event_type").agg(count(lit(1)).as("c"))
      val n = c.groupBy($"day")
        .agg(sum($"c").as("n"), count(lit(1)).as("n_types"))
      c.join(n, Seq("day"))
        .select($"day", $"n", $"n_types",
          // round-to-NEAREST micro-nat (floor(x·1e6 + 0.5)): a +ε-only
          // guard protects terms just below an integer but not just
          // above one — libm-vs-JVM ln can differ by ulps in either
          // direction; centering puts the decision boundary half a
          // micro-nat from any representable result
          floor(($"c".cast("double") / $"n".cast("double"))
            * log($"n".cast("double") / $"c".cast("double"))
            * 1000000.0 + 0.5).cast("long").as("nm"))
        .groupBy($"day")
        .agg(max($"n").as("n_events"), max($"n_types").as("n_types"),
          sum($"nm").as("entropy_micro_nats"))
        .orderBy("day")
    }),
    // D18: exact per-group MODE with a DETERMINISTIC tie-break — SQL's
    // mode() leaves ties implementation-defined (DuckDB picks first-seen,
    // Spark's mode() picks arbitrarily), which is unusable under a
    // repeatability contract; the (count desc, value asc) row_number
    // formulation makes the answer total. Count first (partial-
    // aggregable), rank the GROUP×VALUE-sized count table — the window
    // never sees corpus rows.
    "q_agg_mode" -> ((s, d) => {
      import s.implicits._
      val c = Tables.documents(s, d)
        .groupBy($"lang", $"source").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"n".desc, $"source")
      c.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        .select($"lang", $"source".as("modal_source"), $"n")
        .orderBy("lang")
    }),
    // D9: bounded collect-style agg, rendered as a sorted CSV string so the
    // comparison is representation-free (≙ alias lists, reference src/nba.yaml:6-7).
    "q_agg_collect" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"lang")
        .agg(array_join(array_sort(collect_set($"source")), ",").as("sources_csv"),
             count(lit(1)).as("n"))
        .orderBy("lang")
    }),
    // D10: ordered string aggregation (LISTAGG/STRING_AGG semantics,
    // duplicates KEPT unlike q_agg_collect's set form). The explicit
    // array_sort makes the concatenation order total — the only way a
    // string agg is deterministic on a distributed engine.
    "q_agg_listagg" -> ((s, d) => {
      import s.implicits._
      Tables.nation(s, d)
        .groupBy($"n_regionkey".cast("long").as("regionkey"))
        .agg(array_join(array_sort(collect_list($"n_name")), ",").as("nations"))
        .orderBy("regionkey")
    })
  )
}
