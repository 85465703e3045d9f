package graft.ops

import org.apache.spark.sql.SparkSession

/** SQL surface of the incremental-state family's SERVING READS
  * (VERDICT r14 #4, A9b ∘ L46/L47/L48/L55): a SQL-only user — the
  * Athena-migrating persona of the reference, src/main.py:4-5 — can
  * reach every BATCH operator through the `graft.v_*` views but had no
  * name for the incremental members' reports, which are plain
  * relational programs over the (default-catalog) state tables. These
  * builders register `v_<prefix>_report` catalog views whose SQL is the
  * exact serving read of the member's Scala `report` (IncrViewsSuite
  * pins fresh-session row equality on the same warehouse).
  *
  * Two non-relational inputs need special handling:
  *
  *   - MARKER SCALARS (TF-IDF's n_docs, quality's four counters) live
  *     in warehouse marker files, which Spark's file listing cannot see
  *     (underscore-prefixed = hidden). They are baked into the view SQL
  *     as LITERALS at registration — and kept fresh by a refresh hook
  *     at the end of every fold/delete (`refreshIfRegistered`: a no-op
  *     catalog probe unless the view exists, then a CREATE OR REPLACE
  *     with the new literal — pure catalog ops, no jobs).
  *   - CONDITIONAL STATE (quality/triangle tombstone tables exist only
  *     once a delete ran): the SQL is generated against the tables
  *     present at registration, and the delete path's refresh hook
  *     swaps in the tombstone-aware form the moment it first matters.
  *
  * Views use ONLY built-in functions (the house rule of
  * Catalog.operatorViews: a permanent view cannot reference a
  * session-registered function), which for the quality report means
  * the native `bitmap_andnot` is replaced by the set identity
  * |live \ tomb| = |live ∪ tomb| − |tomb| over the built-in
  * bitmap_or_agg/bitmap_count. Plan cost of that trade, measured and
  * pinned (IncrViewsSuite): the UNION ALL under the |L∪T| or_agg loses
  * the bucketed scans' output partitioning, so the view pays ONE
  * exchange the Scala report does not — over the replay-deduped bitmap
  * rows, i.e. ≤ buckets × (days + epochs) ROWS regardless of corpus
  * (bytes ∝ the bitmaps themselves), plus the trivial SinglePartition
  * scalar sum. The TF-IDF view keeps the member plan's shape exactly:
  * state sides exchange-free over the tok-bucketed scans (the tok join
  * is a sort-only SMJ), one output-inherent doc_id window exchange,
  * WindowGroupLimit applied. The Scala reports stay the zero-/minimal-
  * exchange serving paths; the views are the SQL doorway. */
object IncrViews {

  def viewName(prefix: String): String = s"v_${prefix}_report"

  private def create(s: SparkSession, prefix: String, sql: String): String = {
    val v = viewName(prefix)
    s.sql(s"CREATE OR REPLACE VIEW $v AS $sql")
    v
  }

  private def refreshIfRegistered(s: SparkSession, prefix: String)
                                 (register: => Unit): Unit =
    if (s.catalog.tableExists(viewName(prefix))) register

  // ---- L46 incremental TF-IDF -------------------------------------

  /** n_docs is a literal from the `_doc_counts` marker — re-baked by
    * the fold/delete refresh hooks so the view never goes stale. */
  def registerTfidf(s: SparkSession, prefix: String, warehouse: String): String = {
    val nDocs = IncrState.readDayCounts(s, warehouse, "_doc_counts").values.sum
    create(s, prefix,
      s"""WITH tf AS (SELECT doc_id, tok, SUM(tf) AS tf
         |            FROM (SELECT DISTINCT doc_id, tok, src_day, tf
         |                  FROM ${TfidfIncr.tfTable(prefix)})
         |            GROUP BY doc_id, tok HAVING SUM(tf) > 0),
         |     df AS (SELECT tok, SUM(df_part) AS df
         |            FROM (SELECT DISTINCT tok, src_day, df_part
         |                  FROM ${TfidfIncr.dfTable(prefix)})
         |            GROUP BY tok HAVING SUM(df_part) > 0),
         |     sc AS (SELECT tf.doc_id, tf.tok,
         |                   ROUND(tf.tf * LN(CAST($nDocs AS DOUBLE) / df.df), 4) AS score
         |            FROM tf JOIN df ON tf.tok = df.tok)
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, score
         |FROM (SELECT doc_id, tok, score,
         |             ROW_NUMBER() OVER (PARTITION BY doc_id
         |               ORDER BY score DESC, tok) AS rk
         |      FROM sc)
         |WHERE rk <= 3""".stripMargin)
  }

  private[ops] def refreshTfidf(s: SparkSession, prefix: String,
                                warehouse: String): Unit =
    refreshIfRegistered(s, prefix) { registerTfidf(s, prefix, warehouse); () }

  // ---- L47 incremental domain stats --------------------------------

  /** Fully static (no marker scalars, single always-present state
    * table) — register once, never needs a refresh. The deny list is
    * the same inline dimension as the batch query's
    * (ops/TextAnalysis.scala L25), as VALUES. */
  def registerDomains(s: SparkSession, prefix: String, warehouse: String): String =
    create(s, prefix,
      s"""WITH net AS (SELECT domain, lang, SUM(n_part) AS n
         |             FROM (SELECT DISTINCT domain, lang, src_day, n_part
         |                   FROM ${DomainsIncr.dlTable(prefix)})
         |             GROUP BY domain, lang HAVING SUM(n_part) > 0),
         |     agg AS (SELECT domain, SUM(n) AS n_docs, COUNT(1) AS n_langs
         |             FROM net GROUP BY domain),
         |     deny AS (SELECT * FROM VALUES
         |                ('src1.example.com', CAST(1 AS BIGINT)),
         |                ('src3.example.com', CAST(1 AS BIGINT))
         |              AS t(domain, blocked))
         |SELECT a.domain, a.n_docs, a.n_langs,
         |       COALESCE(d.blocked, CAST(0 AS BIGINT)) AS blocked
         |FROM agg a LEFT JOIN deny d ON a.domain = d.domain""".stripMargin)

  // ---- L48 incremental quality report -------------------------------

  /** The four additive counters are literals from the counts marker;
    * pk-distinct uses the |L∪T|−|T| identity when the tombstone table
    * exists (both or_aggs bucket-local under the bkt bucketing). */
  def registerQuality(s: SparkSession, prefix: String, warehouse: String): String = {
    val sums = QualityIncr.readCounts(s, warehouse, prefix).values
      .foldLeft(Seq(0L, 0L, 0L, 0L))((a, b) => a.zip(b).map(t => t._1 + t._2))
    val Seq(rc, nulls, negs, orph) = sums
    val hasTomb = s.catalog.tableExists(QualityIncr.tombTable(prefix))
    val ndCte =
      if (!hasTomb)
        s"""lv AS (SELECT bkt, bm FROM (SELECT DISTINCT bkt, src_day, bm
           |                            FROM ${QualityIncr.pkTable(prefix)})),
           |nd AS (SELECT COALESCE(SUM(c), CAST(0 AS BIGINT)) AS nd
           |       FROM (SELECT bitmap_count(bitmap_or_agg(bm)) AS c
           |             FROM lv GROUP BY bkt))""".stripMargin
      else
        s"""lv AS (SELECT bkt, bm FROM (SELECT DISTINCT bkt, src_day, bm
           |                            FROM ${QualityIncr.pkTable(prefix)})),
           |tb AS (SELECT bkt, bm FROM (SELECT DISTINCT bkt, src_day, bm
           |                            FROM ${QualityIncr.tombTable(prefix)})),
           |ut AS (SELECT bkt, bitmap_count(bitmap_or_agg(bm)) AS c
           |       FROM (SELECT bkt, bm FROM lv
           |             UNION ALL SELECT bkt, bm FROM tb) GROUP BY bkt),
           |tc AS (SELECT bkt, bitmap_count(bitmap_or_agg(bm)) AS c
           |       FROM tb GROUP BY bkt),
           |nd AS (SELECT COALESCE(SUM(u.c - COALESCE(t.c, CAST(0 AS BIGINT))),
           |                       CAST(0 AS BIGINT)) AS nd
           |       FROM ut u LEFT JOIN tc t ON u.bkt = t.bkt)""".stripMargin
    create(s, prefix,
      s"""WITH $ndCte
         |SELECT stack(5,
         |    'fk_orphans', ${orph}L,
         |    'negative_value', ${negs}L,
         |    'null_user_id', ${nulls}L,
         |    'pk_dupes', ${rc}L - nd,
         |    'row_count', ${rc}L) AS (check_name, violations)
         |FROM nd""".stripMargin)
  }

  private[ops] def refreshQuality(s: SparkSession, prefix: String,
                                  warehouse: String): Unit =
    refreshIfRegistered(s, prefix) { registerQuality(s, prefix, warehouse); () }

  // ---- L55 incremental triangles ------------------------------------

  /** No marker scalars; the only registration-time dependence is
    * whether the tombstone table exists (first deleteDay refreshes).
    * ORDER BY … LIMIT 20 stays in the view — it is the operator's
    * top-k semantics, not presentation. */
  def registerTriangles(s: SparkSession, prefix: String, warehouse: String): String = {
    val hasTomb = s.catalog.tableExists(TriIncr.delTable(prefix))
    val liveCte =
      if (!hasTomb)
        s"live AS (SELECT DISTINCT x, y FROM ${TriIncr.adjTable(prefix)})"
      else
        s"""adj AS (SELECT DISTINCT x, y FROM ${TriIncr.adjTable(prefix)}),
           |live AS (SELECT a.x, a.y FROM adj a
           |         LEFT ANTI JOIN ${TriIncr.delTable(prefix)} t
           |           ON a.x = t.x AND a.y = t.y)""".stripMargin
    create(s, prefix,
      s"""WITH $liveCte,
         |     deg AS (SELECT x AS node, COUNT(1) AS degree
         |             FROM live GROUP BY x),
         |     tri AS (SELECT node, SUM(tri_part) AS tri
         |             FROM (SELECT DISTINCT node, src_day, tri_part
         |                   FROM ${TriIncr.triTable(prefix)})
         |             GROUP BY node)
         |SELECT deg.node AS part_key,
         |       COALESCE(tri.tri, CAST(0 AS BIGINT)) AS tri,
         |       deg.degree,
         |       CASE WHEN deg.degree >= 2
         |            THEN COALESCE(tri.tri, CAST(0 AS BIGINT)) * 2000000
         |                   div (deg.degree * (deg.degree - 1))
         |            ELSE CAST(0 AS BIGINT) END AS cc_ppm
         |FROM deg LEFT JOIN tri ON deg.node = tri.node
         |ORDER BY tri DESC, part_key LIMIT 20""".stripMargin)
  }

  private[ops] def refreshTriangles(s: SparkSession, prefix: String,
                                    warehouse: String): Unit =
    refreshIfRegistered(s, prefix) { registerTriangles(s, prefix, warehouse); () }

  /** Drop a previously registered report view (member dropState twins). */
  def dropView(s: SparkSession, prefix: String): Unit =
    s.sql(s"DROP VIEW IF EXISTS ${viewName(prefix)}")
}
