package graft

/** DuckDB oracle SQL, one entry per oracle-able key in SparkEntry.queries.
  *
  * Mirrors each Spark query expression-for-expression under the
  * determinism rules in U.scala / SURVEY.md §7.5:
  *   - int64 scaling via CAST(FLOOR(x*k) AS BIGINT) everywhere Spark uses
  *     floor(x*k) (same IEEE multiply+floor → identical values);
  *   - CAST(SUM(...) AS BIGINT) because DuckDB SUM(BIGINT) is HUGEINT;
  *   - CAST(ts AS TIMESTAMP) on events.ts (ns in DuckDB, µs in Spark);
  *   - strftime for every rendered timestamp;
  *   - every query ends with a total-order ORDER BY.
  */
object Oracle {

  private val revC =
    "CAST(FLOOR(l_extendedprice*100) AS BIGINT) * (100 - CAST(FLOOR(l_discount*100) AS BIGINT))"

  /** DuckDB twin of U.h64: first 15 hex chars of md5 parsed big-endian to
    * int64 (DuckDB's md5_number_* are little-endian, hence the explicit
    * hex fold). */
  private def h64Sql(e: String): String =
    s"""list_reduce(list_transform(string_split(substring(md5($e), 1, 15), ''),
        c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1), (a, b) -> a*16 + b)"""

  /** One BPE learning round (count pairs → argmax → sentinel replace),
    * chained d0 → d3 — shared by the q_text_bpe_train / _encode oracles
    * (same recurrence as ops/TextAnalysis.scala bpeTrain). */
  private def bpeRoundSql(i: Int): String = {
    val prev = s"d${i - 1}"
    s"""
     p$i AS (SELECT syms, freq FROM (
               SELECT list_filter(string_split(repr, '|'), x -> x != '') AS syms, freq
               FROM $prev) WHERE len(syms) >= 2),
     c$i AS (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
               SELECT freq, unnest([{'a': syms[i], 'b': syms[i+1]} for i in range(1, len(syms))],
                                   recursive := true)
               FROM p$i) GROUP BY 1, 2),
     b$i AS (SELECT a, b, cnt FROM c$i ORDER BY cnt DESC, a, b LIMIT 1),
     d$i AS (SELECT w, freq,
                    replace(replace(replace(replace(repr, pat, rep), pat, rep), pat, rep), pat, rep) AS repr
             FROM $prev, (SELECT '|'||a||'|'||b||'|' AS pat, '|'||a||b||'|' AS rep FROM b$i))"""
  }

  /** Seed word-dict CTEs (wt, d0) + 3 learning rounds → final dict d3. */
  private val bpeCtes =
    s"""wt AS (SELECT t AS w, COUNT(*) AS freq FROM (
           SELECT unnest(string_split(text, ' ')) AS t FROM documents)
         WHERE len(t) > 0 GROUP BY 1),
     d0 AS (SELECT w, freq,
              '|' || array_to_string([w[i] for i in range(1, len(w)+1)], '|') || '|' AS repr
            FROM wt),${bpeRoundSql(1)},${bpeRoundSql(2)},${bpeRoundSql(3)}"""

  /** Word-3-gram shingle CTEs shared by the dedup oracles. */
  private def shingleCtesOn(source: String) =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $source),
       sh AS (SELECT doc_id, list_distinct(list_transform(list_slice(tk, 3, len(tk)),
                (x, i) -> tk[i] || ' ' || tk[i+1] || ' ' || x)) AS shs FROM toks)"""

  private val shingleCtes = shingleCtesOn("documents")

  private val permMod = ops.Dedup.PermMod
  private val minCols = (0 until ops.Dedup.NumSeeds)
    .map(j => s"MIN((${ops.Dedup.permA(j)} * h + ${ops.Dedup.permB(j)}) % $permMod) AS m$j")
    .mkString(",\n             ")
  private val bandList = (0 until ops.Dedup.NumBands)
    .map(b => s"concat_ws(':', $b, m${2 * b}, m${2 * b + 1})").mkString(", ")
  private val bandList4 = (0 until ops.Dedup.NumSeeds / 4)
    .map(b => s"concat_ws(':', $b, m${4 * b}, m${4 * b + 1}, m${4 * b + 2}, m${4 * b + 3})")
    .mkString(", ")

  /** CTE list ending in `j(d1, d2, jac)` — the verified minhash candidate
    * pairs, shared by the q_dedup_minhash and q_dedup_cluster oracles. */
  private def minhashPairCtesOn(source: String): String = {
    val p = permMod
    s"""${shingleCtesOn(source)},
        e0 AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
        e AS (SELECT doc_id, ${h64Sql("sh")} % $p AS h FROM e0),
        mins AS (SELECT doc_id, $minCols FROM e GROUP BY 1),
        bands AS (SELECT doc_id, unnest([$bandList]) AS band FROM mins),
        cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                 FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
        v AS (SELECT d1, d2,
                     CAST(len(list_filter(sa.shs, x -> list_contains(sb.shs, x))) AS BIGINT) AS ni,
                     len(sa.shs) AS na, len(sb.shs) AS nb
              FROM cand JOIN sh sa ON sa.doc_id = d1 JOIN sh sb ON sb.doc_id = d2),
        j AS (SELECT d1, d2, round(CAST(ni AS DOUBLE) / (na + nb - ni), 6) AS jac FROM v)"""
  }

  private val minhashPairCtes: String = minhashPairCtesOn("documents")

  private def minhashSqlOn(source: String): String =
    s"""WITH ${minhashPairCtesOn(source)}
        SELECT d1, d2, jac FROM j WHERE jac >= 0.2 ORDER BY d1, d2"""

  private val minhashSql: String = minhashSqlOn("documents")

  /** Connected components over the minhash pair graph: min-reachable-
    * vertex per vertex via a recursive CTE — the oracle twin of
    * Dedup.connectedComponents' hash-to-min fixpoint. */
  private val dedupClusterSql: String =
    s"""WITH RECURSIVE $minhashPairCtes,
        pairs AS (SELECT d1, d2 FROM j WHERE jac >= 0.2),
        edges AS (SELECT d1 AS u, d2 AS v FROM pairs
                  UNION ALL SELECT d2, d1 FROM pairs),
        reach(vid, lbl) AS (
          SELECT DISTINCT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.vid),
        comp AS (SELECT vid AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY 1),
        sz AS (SELECT cluster_id, COUNT(*) AS n_members FROM comp GROUP BY 1)
        SELECT doc_id, c.cluster_id, n_members
        FROM comp c JOIN sz USING (cluster_id) ORDER BY doc_id"""

  /** Curated corpus post-dedup: everything except non-canonical cluster
    * members (same recursive-CC core as dedupClusterSql). */
  private val dedupSurvivorsSql: String =
    s"""WITH RECURSIVE $minhashPairCtes,
        pairs AS (SELECT d1, d2 FROM j WHERE jac >= 0.2),
        edges AS (SELECT d1 AS u, d2 AS v FROM pairs
                  UNION ALL SELECT d2, d1 FROM pairs),
        reach(vid, lbl) AS (
          SELECT DISTINCT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.vid),
        comp AS (SELECT vid, MIN(lbl) AS cluster_id FROM reach GROUP BY 1),
        losers AS (SELECT vid FROM comp WHERE vid <> cluster_id)
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id NOT IN (SELECT vid FROM losers)
        ORDER BY doc_id"""

  private val simhashSql: String = {
    val bitSums = (0 until 32)
      .map(k => s"SUM(CASE WHEN (h >> $k) & 1 = 1 THEN f ELSE -f END) AS b$k")
      .mkString(",\n             ")
    val code = (0 until 32).map(k => s"CASE WHEN b$k > 0 THEN ${1L << k} ELSE 0 END")
      .mkString(" + ")
    val blocks = (0 until 4).map(b => s"concat_ws(':', $b, (simhash >> ${b * 8}) & 255)")
      .mkString(", ")
    s"""WITH tf AS (SELECT doc_id, tok, COUNT(*) AS f
                    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
                    GROUP BY 1, 2),
        h AS (SELECT doc_id, f, ${h64Sql("tok")} AS h FROM tf),
        sums AS (SELECT doc_id, $bitSums FROM h GROUP BY 1),
        codes AS (SELECT doc_id, CAST($code AS BIGINT) AS simhash FROM sums),
        blocks AS (SELECT doc_id, simhash, unnest([$blocks]) AS blk FROM codes),
        cand AS (SELECT DISTINCT a.doc_id AS d1, a.simhash AS h1, b.doc_id AS d2, b.simhash AS h2
                 FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.doc_id < b.doc_id),
        r AS (SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS ham FROM cand)
        SELECT d1, d2, ham FROM r WHERE ham <= 3 ORDER BY d1, d2"""
  }

  private val embedLshSql: String = {
    val bitCols = (0 until ops.Dedup.NumPlanes).map { p =>
      val lits = ops.Dedup.planes(p).mkString("[", ", ", "]")
      s"CASE WHEN list_sum(list_transform(v, (x, i) -> x * ($lits)[i])) > 0 THEN 1 ELSE 0 END AS bit$p"
    }.mkString(",\n             ")
    val tabs = (0 until ops.Dedup.NumTables).map { t =>
      val code = (0 until 4).map(k => s"bit${4 * t + k} * ${1L << k}").mkString(" + ")
      s"concat_ws(':', $t, $code)"
    }.mkString(", ")
    s"""WITH n AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM embeddings),
        m AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS norm2 FROM n),
        bits AS (SELECT vec_id, $bitCols FROM m),
        tabs AS (SELECT vec_id, unnest([$tabs]) AS bkt FROM bits),
        cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
                 FROM tabs a JOIN tabs b ON a.bkt = b.bkt AND a.vec_id < b.vec_id),
        p AS (SELECT d1, d2,
                     CAST(list_sum(list_transform(ma.v, (x, i) -> x * mb.v[i])) AS DOUBLE) AS dot,
                     CAST(ma.norm2 AS DOUBLE) AS na, CAST(mb.norm2 AS DOUBLE) AS nb
              FROM cand JOIN m ma ON ma.vec_id = d1 JOIN m mb ON mb.vec_id = d2),
        r AS (SELECT d1, d2, round(dot / (sqrt(na) * sqrt(nb)), 6) AS sim FROM p)
        SELECT d1, d2, sim FROM r WHERE sim >= 0.4 ORDER BY d1, d2"""
  }

  /** Shared by q_quality_report (batch), q_quality_incr (the
    * incremental fold is lossless under any slicing — additive counters
    * sum, the distinct-PK term ORs exact per-day bitmaps — so the batch
    * recompute IS its oracle), and q_quality_del (`source` = the corpus
    * minus the takedown set: the retraction fold must land exactly on
    * the reduced-corpus recompute). */
  private def qualityReportSqlOn(source: String): String =
    s"""WITH ev AS (SELECT event_id,
              CASE WHEN event_id % 97 = 0 THEN NULL
                   WHEN event_id % 103 = 0 THEN user_id + 1000000
                   ELSE user_id END AS uid,
              CASE WHEN event_id % 89 = 0 THEN -value ELSE value END AS v
            FROM $source),
       dirty AS (SELECT * FROM ev
                 UNION ALL SELECT * FROM ev WHERE event_id % 101 = 0),
       orph AS (SELECT CAST(COUNT(*) AS BIGINT) AS fk_orphans FROM dirty d
                WHERE uid IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = d.uid)),
       m AS (SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
                    CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS pk_dupes,
                    CAST(SUM(CASE WHEN uid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
                    CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_value
             FROM dirty)
       SELECT check_name, violations FROM (
         SELECT 'fk_orphans' AS check_name, fk_orphans AS violations FROM orph
         UNION ALL SELECT 'negative_value', negative_value FROM m
         UNION ALL SELECT 'null_user_id', null_user_id FROM m
         UNION ALL SELECT 'pk_dupes', pk_dupes FROM m
         UNION ALL SELECT 'row_count', row_count FROM m)
       ORDER BY check_name"""

  private val qualityReportSql: String = qualityReportSqlOn("events")

  /** Shared by q_url_domains (batch), q_domains_incr (the incremental
    * fold is lossless, so the batch recompute IS its oracle — summed
    * per-day (domain, lang) partials equal the full-corpus counts), and
    * q_domains_del (`source` = the corpus minus the takedown set). */
  private def urlDomainsSqlOn(source: String): String =
    s"""WITH u AS (SELECT doc_id, lang,
              regexp_extract('https://' || source || '.example.com/d/' ||
                CAST(doc_id AS VARCHAR), 'https?://([^/]+)/', 1) AS domain
            FROM $source)
       SELECT domain, COUNT(*) AS n_docs,
              CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
              CAST(CASE WHEN domain IN ('src1.example.com', 'src3.example.com')
                        THEN 1 ELSE 0 END AS BIGINT) AS blocked
       FROM u GROUP BY domain ORDER BY domain"""

  private val urlDomainsSql: String = urlDomainsSqlOn("documents")

  /** Shared by q_text_tfidf (batch) and q_tfidf_incr (the incremental
    * fold is lossless, so the batch recompute IS its oracle); the
    * `source` form serves q_tfidf_del (`source` = the corpus minus the
    * takedown set). */
  private def tfidfSqlOn(source: String): String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM $source),
       tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
       n AS (SELECT COUNT(*) AS n_docs FROM $source),
       sc AS (SELECT doc_id, tf.tok AS tok,
                     round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score
              FROM tf JOIN df USING (tok) CROSS JOIN n),
       r AS (SELECT doc_id, tok, score,
                    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, tok) AS BIGINT) AS rk
             FROM sc)
       SELECT doc_id, rk, tok, score FROM r WHERE rk <= 3
       ORDER BY doc_id, rk"""

  private val tfidfSql: String = tfidfSqlOn("documents")

  private def annLshSqlOn(source: String): String = {
    val bitCols = (0 until ops.Dedup.NumPlanes).map { p =>
      val lits = ops.Dedup.planes(p).mkString("[", ", ", "]")
      s"CASE WHEN list_sum(list_transform(v, (x, i) -> x * ($lits)[i])) > 0 THEN 1 ELSE 0 END AS bit$p"
    }.mkString(",\n             ")
    val codeCols = (0 until ops.Dedup.NumTables).map { t =>
      val code = (0 until 4).map(k => s"bit${4 * t + k} * ${1L << k}").mkString(" + ")
      s"($code) AS c$t"
    }.mkString(", ")
    val corpusBkts = (0 until ops.Dedup.NumTables)
      .map(t => s"concat_ws(':', $t, c$t)").mkString(", ")
    // radius-1 multiprobe on the query side — mirrors Dedup.ProbeMasks1
    val probeBkts = (for {
      t <- 0 until ops.Dedup.NumTables
      m <- ops.Dedup.ProbeMasks1
    } yield s"concat_ws(':', $t, xor(c$t, $m))").mkString(", ")
    s"""WITH n AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM $source),
        m AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS norm2 FROM n),
        bits AS (SELECT vec_id, $bitCols FROM m),
        codes AS (SELECT vec_id, $codeCols FROM bits),
        cb AS (SELECT vec_id, unnest([$corpusBkts]) AS bkt FROM codes),
        qp AS (SELECT vec_id, unnest([$probeBkts]) AS bkt FROM codes WHERE vec_id % 50 = 0),
        cand AS (SELECT DISTINCT qp.vec_id AS q_id, cb.vec_id AS c_id
                 FROM qp JOIN cb USING (bkt) WHERE cb.vec_id <> qp.vec_id),
        p AS (SELECT q_id, c_id,
                     CAST(list_sum(list_transform(ma.v, (x, i) -> x * mb.v[i])) AS DOUBLE) AS dot,
                     CAST(ma.norm2 AS DOUBLE) AS qn, CAST(mb.norm2 AS DOUBLE) AS cn
              FROM cand JOIN m ma ON ma.vec_id = q_id JOIN m mb ON mb.vec_id = c_id),
        r AS (SELECT q_id, c_id, round(dot / (sqrt(qn) * sqrt(cn)), 6) AS sim FROM p),
        k AS (SELECT q_id, c_id, sim,
                     CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rk
              FROM r)
        SELECT q_id, rk, c_id, sim FROM k WHERE rk <= 3 ORDER BY q_id, rk"""
  }

  /** L51 incremental k-means, parameterized by corpus: the batch
    * recompute with the DETERMINISTIC seed directions inlined as
    * literals; the `source` form serves q_cluster_del (`source` = the
    * corpus minus the takedown set). */
  private def clusterIncrSqlOn(source: String): String = {
      val seedRows = ops.ClusterIncr.seeds.zipWithIndex.map { case (v, p) =>
        s"(CAST($p AS BIGINT), ${v.mkString("[", ", ", "]")})"
      }.mkString(",\n                   ")
      s"""WITH n AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM $source),
         m AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM n),
         seeds AS (SELECT sid, sv, list_sum(list_transform(sv, x -> x * x)) AS sn2
                   FROM (VALUES $seedRows) t(sid, sv)),
         a1 AS (SELECT vec_id, sid,
                       CAST(list_sum(list_transform(v, (x, i) -> x * sv[i])) AS DOUBLE)
                         / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(sn2 AS DOUBLE))) AS sim
                FROM m, seeds),
         as1 AS (SELECT vec_id, sid AS cl FROM (
                   SELECT vec_id, sid,
                          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, sid) AS rk
                   FROM a1) t WHERE rk = 1),
         e AS (SELECT as1.cl, i, m.v[i] AS c
               FROM as1 JOIN m USING (vec_id)
               CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix),
         cs AS (SELECT cl, i, CAST(FLOOR(CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cc
                FROM e GROUP BY 1, 2),
         cv AS (SELECT cl, list(cc ORDER BY i) AS cvec FROM cs GROUP BY 1),
         cn AS (SELECT cl AS cl2, cvec, list_sum(list_transform(cvec, x -> x * x)) AS cn2 FROM cv),
         a2 AS (SELECT vec_id, cl2,
                       CAST(list_sum(list_transform(v, (x, i) -> x * cvec[i])) AS DOUBLE)
                         / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS sim
                FROM m, cn),
         as2 AS (SELECT vec_id, cl2, sim FROM (
                   SELECT vec_id, cl2, sim,
                          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cl2) AS rk
                   FROM a2) t WHERE rk = 1),
         f AS (SELECT cl2 AS cluster, CAST(FLOOR(sim * 1000000) AS BIGINT) AS sim_i FROM as2)
         SELECT cluster, COUNT(*) AS n,
                CAST(SUM(sim_i) AS BIGINT) AS sim_sum,
                round(CAST(CAST(SUM(sim_i) AS BIGINT) AS DOUBLE)
                      / (1000000.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS mean_sim
         FROM f GROUP BY 1 ORDER BY cluster"""
  }

  /** Shared by q_pipeline_curate_incr (batch recompute == the lossless
    * fold) and q_curate_del (`curateSource` = the corpus minus the
    * takedown set — the retractable member-level backend). */
  private def curateIncrSqlOn(curateSource: String): String =
    s"""WITH docs AS (SELECT doc_id, lang, text, string_split(text, ' ') AS tk
                        FROM $curateSource),
         g0 AS (SELECT doc_id, lang, text, tk,
                       CAST(len(tk) AS BIGINT) AS nt,
                       CAST(len(list_distinct(tk)) AS BIGINT) AS nd
                FROM docs WHERE lang = 'en' AND len(tk) >= 10),
         g AS (SELECT *, (nt + 2) // 3 AS nl,
                      CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'valid'
                           ELSE 'test' END AS sp
               FROM (SELECT *, ${h64Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 1000 AS h
                     FROM g0)
               WHERE nd * 1000000 // nt >= 300000),
         mk AS (SELECT sp, lang, nt, nl,
                       ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                FROM g),
         d1 AS (SELECT sp, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(nt) AS BIGINT) AS sum_toks,
                       CAST(SUM(nl) AS BIGINT) AS n_lines
                FROM mk WHERE rn = 1 GROUP BY 1, 2),
         ch AS (SELECT doc_id, lang, unnest([{'idx': CAST((i - 1) // 3 AS INT),
                                              'line': array_to_string(tk[i:i+2], ' ')}
                                             for i in range(1, len(tk) + 1, 3)]) AS u
                FROM g),
         l AS (SELECT doc_id, lang, u.idx AS idx, u.line AS line FROM ch),
         lk AS (SELECT line, doc_id, lang, CAST(length(line) AS BIGINT) AS len,
                       ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
                FROM l),
         d2 AS (SELECT CASE WHEN h2 < 800 THEN 'train' WHEN h2 < 900 THEN 'valid'
                            ELSE 'test' END AS sp, lang,
                       CAST(COUNT(*) AS BIGINT) AS n_kept,
                       CAST(SUM(len) AS BIGINT) AS kept_chars
                FROM (SELECT *, ${h64Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 1000 AS h2
                      FROM lk WHERE rn = 1)
                GROUP BY 1, 2),
         tok AS (SELECT sp, lang, unnest(tk) AS tok FROM g),
         d3 AS (SELECT sp, lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_vocab,
                       CAST(COUNT(*) AS BIGINT) AS n_tok_occ
                FROM tok GROUP BY 1, 2)
         SELECT sp AS split, lang,
                COALESCE(n_docs, CAST(0 AS BIGINT)) AS n_docs,
                COALESCE(sum_toks, CAST(0 AS BIGINT)) AS sum_toks,
                COALESCE(n_lines, CAST(0 AS BIGINT)) AS n_lines,
                COALESCE(n_kept, CAST(0 AS BIGINT)) AS n_kept,
                COALESCE(kept_chars, CAST(0 AS BIGINT)) AS kept_chars,
                COALESCE(n_vocab, CAST(0 AS BIGINT)) AS n_vocab,
                COALESCE(n_tok_occ, CAST(0 AS BIGINT)) AS n_tok_occ
         FROM d1 FULL OUTER JOIN d2 USING (sp, lang)
                 FULL OUTER JOIN d3 USING (sp, lang)
         ORDER BY split, lang"""

  /** L37 per-vertex triangle profile, parameterized by an edge-set
    * predicate: "" for the full graph (q_graph_triangles, q_tri_incr —
    * the incremental fold is lossless, so the batch recompute IS its
    * oracle) or a WHERE clause excluding the takedown edges
    * (q_tri_del). */
  private def trianglesSqlOn(edgeWhere: String, lsWhere: String = ""): String =
    s"""WITH ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem $lsWhere),
         e0 AS (SELECT DISTINCT a.sk AS u, b.sk AS v
                FROM ls a JOIN ls b ON a.ok = b.ok AND a.sk < b.sk $edgeWhere),
         deg AS (SELECT x, COUNT(*) AS dg FROM
                   (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
         e AS (SELECT CASE WHEN d1.dg < d2.dg OR (d1.dg = d2.dg AND u < v)
                           THEN u ELSE v END AS s,
                      CASE WHEN d1.dg < d2.dg OR (d1.dg = d2.dg AND u < v)
                           THEN v ELSE u END AS t
               FROM e0 JOIN deg d1 ON d1.x = e0.u JOIN deg d2 ON d2.x = e0.v),
         tri AS (SELECT e1.s AS a, e1.t AS b, e2.t AS c
                 FROM e e1 JOIN e e2 ON e1.t = e2.s
                 WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.s = e1.s AND e3.t = e2.t)),
         pn AS (SELECT x, COUNT(*) AS tri FROM
                  (SELECT a AS x FROM tri UNION ALL SELECT b FROM tri
                   UNION ALL SELECT c FROM tri) GROUP BY 1)
         SELECT deg.x AS part_key, CAST(COALESCE(pn.tri, 0) AS BIGINT) AS tri,
                CAST(deg.dg AS BIGINT) AS degree,
                CAST(CASE WHEN deg.dg >= 2
                     THEN (COALESCE(pn.tri, 0) * 2000000) // (deg.dg * (deg.dg - 1))
                     ELSE 0 END AS BIGINT) AS cc_ppm
         FROM deg LEFT JOIN pn ON pn.x = deg.x
         ORDER BY tri DESC, part_key LIMIT 20"""

  val sql: Map[String, String] = Map(
    // ----- scans -----
    "q_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_extendedprice
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity, l_extendedprice""",
    "q_scan_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""",

    // ----- projections / filters -----
    "q_project" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders ORDER BY o_orderkey",
    "q_project_compute" ->
      s"""SELECT l_orderkey, l_linenumber,
            $revC AS revenue_c,
            CAST(FLOOR(l_quantity*100) AS BIGINT) + CAST(FLOOR(l_tax*100) AS BIGINT) AS qty_tax_c
          FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue_c, qty_tax_c""",
    "q_filter_eq" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         WHERE lang = 'en' ORDER BY doc_id""",
    "q_filter_not" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
         WHERE o_orderstatus <> 'F' AND NOT (o_orderpriority = '4-NOT SPECIFIED')
         ORDER BY o_orderkey""",
    "q_filter_like" ->
      """SELECT p_partkey, p_type, p_brand FROM part
         WHERE p_type LIKE '%O%' OR p_brand LIKE 'Brand#1%'
         ORDER BY p_partkey""",
    "q_filter_range" ->
      """SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_day
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         ORDER BY l_orderkey, l_linenumber, ship_day""",
    "q_filter_null" ->
      """SELECT o_orderkey, COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS st
         FROM orders WHERE NULLIF(o_orderstatus, 'P') IS NULL
         ORDER BY o_orderkey""",
    "q_case_when" ->
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot'
                     WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
                     ELSE 'cold' END AS bucket,
                COUNT(*) AS n,
                CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
         FROM orders GROUP BY 1 ORDER BY bucket""",

    // ----- joins -----
    "q_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
         JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey""",
    // dim inlined as VALUES: it comes from TopicConfig.ExampleTopicYaml
    // (config bytes, not a parquet table) — topic + each alias, one row each
    "q_topic_alias" ->
      """WITH dim(alias, topic, "type") AS (
           VALUES ('spark','spark','engine'),
                  ('stream','spark','engine'),
                  ('vector','spark','engine'))
         SELECT d.doc_id, m.alias, m.topic, m."type"
         FROM documents d JOIN dim m ON contains(d.text, m.alias)
         ORDER BY doc_id, alias""",
    "q_join_inner" ->
      """SELECT o_orderkey, l_linenumber, o_orderstatus, l_quantity FROM orders
         JOIN lineitem ON o_orderkey = l_orderkey
         ORDER BY o_orderkey, l_linenumber, l_quantity""",
    "q_join_left" ->
      """SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders FROM customer
         LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1 ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         ORDER BY p_partkey""",
    "q_join_full" ->
      """WITH early AS (SELECT o_custkey AS k, COUNT(*) AS n_1996 FROM orders
                        WHERE year(o_orderdate) = 1996 GROUP BY 1),
              late AS (SELECT o_custkey AS k, COUNT(*) AS n_1997 FROM orders
                       WHERE year(o_orderdate) = 1997 GROUP BY 1)
         SELECT COALESCE(early.k, late.k) AS k,
                COALESCE(n_1996, 0) AS n_1996,
                COALESCE(n_1997, 0) AS n_1997
         FROM early FULL OUTER JOIN late ON early.k = late.k
         ORDER BY k""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_star" ->
      s"""SELECT r_name, CAST(SUM($revC) AS BIGINT) AS revenue_c, COUNT(*) AS n
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1 ORDER BY r_name""",
    "q_join_theta" ->
      """SELECT p_partkey, COUNT(*) AS n_cheaper FROM part
         JOIN supplier ON s_acctbal < p_retailprice
         GROUP BY 1 ORDER BY p_partkey""",
    "q_join_range" ->
      """SELECT o_orderkey, COUNT(*) AS n_early FROM orders
         JOIN lineitem ON l_orderkey = o_orderkey
           AND l_shipdate >= o_orderdate
           AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
         GROUP BY 1 ORDER BY o_orderkey""",
    "q_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "q_join_asof" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT event_id AS c_id, user_id AS c_user, CAST(ts AS TIMESTAMP) AS c_ts
                    FROM events WHERE event_type = 'click'),
              j AS (SELECT p_id, user_id, c_id,
                           ROW_NUMBER() OVER (PARTITION BY p_id
                             ORDER BY c_ts DESC NULLS LAST, c_id DESC NULLS LAST) AS rn
                    FROM p LEFT JOIN c ON user_id = c_user AND c_ts <= p_ts)
         SELECT p_id, user_id, c_id AS asof_click_id FROM j WHERE rn = 1 ORDER BY p_id""",

    "q_join_asof_fwd" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
                    FROM events WHERE event_type = 'purchase'),
              v AS (SELECT event_id AS v_id, user_id AS v_user, CAST(ts AS TIMESTAMP) AS v_ts
                    FROM events WHERE event_type = 'view'),
              j AS (SELECT p_id, user_id, v_id,
                           ROW_NUMBER() OVER (PARTITION BY p_id
                             ORDER BY v_ts ASC NULLS LAST, v_id ASC NULLS LAST) AS rn
                    FROM p LEFT JOIN v ON user_id = v_user AND v_ts > p_ts)
         SELECT p_id, user_id, v_id AS next_view_id FROM j WHERE rn = 1 ORDER BY p_id""",
    "q_win_fill" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                CASE WHEN event_id % 7 = 0 THEN NULL
                     ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS v_cents
              FROM events)
         SELECT event_id, user_id, v_cents,
                last_value(v_cents IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM e ORDER BY event_id""",

    // ----- sorts / top-K -----
    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
         ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC""",
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""",

    // ----- set ops -----
    "q_union_all" ->
      """SELECT o_orderkey, 'hot' AS tag FROM orders
         WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
         UNION ALL
         SELECT o_orderkey, 'cold' AS tag FROM orders
         WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW')
         ORDER BY o_orderkey, tag""",
    "q_union_distinct" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer WHERE c_mktsegment = 'MACHINERY'
         ORDER BY nk""",
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
         ORDER BY o_custkey""",
    "q_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
         ORDER BY o_custkey""",
    "q_intersect_all" ->
      """WITH i AS (
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
           INTERSECT ALL
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
         SELECT o_custkey, COUNT(*) AS n_copies FROM i
         GROUP BY 1 ORDER BY o_custkey""",
    "q_except_all" ->
      """WITH e AS (
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
           EXCEPT ALL
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
         SELECT o_custkey, COUNT(*) AS n_copies FROM e
         GROUP BY 1 ORDER BY o_custkey""",

    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
                    FROM events),
         c AS (SELECT user_id, event_type, ts, event_id,
                      LAG(event_type) OVER w AS prev,
                      ROW_NUMBER() OVER w AS rn
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         ch AS (SELECT user_id, event_type, ts, event_id FROM c
                WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
         h AS (SELECT user_id, event_type, ts AS valid_from,
                      LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
               FROM ch)
         SELECT user_id, event_type, valid_from,
                COALESCE(valid_to, TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
                (valid_to IS NULL) AS is_current
         FROM h
         ORDER BY user_id, valid_from, event_type, valid_to""",

    "q_upsert_merge" ->
      """WITH base AS (SELECT event_id, user_id,
                  CAST(FLOOR(value*1000000) AS BIGINT) AS value_c, CAST(0 AS BIGINT) AS ver
               FROM events),
         updates AS (SELECT event_id, user_id,
                  CAST(FLOOR(value*1000000) AS BIGINT) + 1000000 AS value_c, CAST(1 AS BIGINT) AS ver
               FROM events WHERE event_id % 100 = 0),
         u AS (SELECT * FROM base UNION ALL SELECT * FROM updates),
         r AS (SELECT event_id, user_id, value_c, ver,
                      ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ver DESC) AS rn
               FROM u)
         SELECT event_id, user_id, value_c, ver AS from_update
         FROM r WHERE rn = 1 ORDER BY event_id""",

    // ----- subqueries -----
    "q_subquery_scalar" ->
      """WITH o AS (SELECT o_orderkey, CAST(FLOOR(o_totalprice*100) AS BIGINT) AS total_c
                    FROM orders)
         SELECT o_orderkey, total_c FROM o
         WHERE total_c * (SELECT COUNT(*) FROM o)
               > (SELECT CAST(SUM(total_c) AS BIGINT) FROM o)
         ORDER BY o_orderkey""",
    "q_subquery_in" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    // ----- aggregations -----
    "q_agg_global" ->
      s"""SELECT COUNT(*) AS n,
            CAST(SUM(CAST(FLOOR(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c,
            CAST(SUM($revC) AS BIGINT) AS rev_c,
            MIN(l_quantity) AS min_qty,
            MAX(l_quantity) AS max_qty,
            CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
            CAST(SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_price_c
          FROM lineitem""",
    "q_agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
            CAST(SUM(CAST(FLOOR(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
            CAST(SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
            CAST(SUM($revC) AS BIGINT) AS sum_disc_c,
            COUNT(*) AS n
          FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""",
    "q_agg_distinct" ->
      """SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust, COUNT(*) AS n
         FROM orders GROUP BY 1 ORDER BY o_orderpriority""",
    "q_agg_filtered" ->
      """SELECT o_orderstatus,
                CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
                CAST(SUM(CASE WHEN o_totalprice > 100000
                              THEN CAST(FLOOR(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS big_c,
                COUNT(*) AS n
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",
    "q_agg_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS r, COALESCE(n_name, 'ALL') AS n_nm, COUNT(*) AS n
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name) ORDER BY r, n_nm""",
    "q_agg_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st, COALESCE(o_orderpriority, 'ALL') AS prio,
                COUNT(*) AS n,
                CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY st, prio""",
    "q_agg_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st, COALESCE(o_orderpriority, 'ALL') AS prio,
                COUNT(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
         ORDER BY st, prio""",
    "q_agg_pivot" ->
      """SELECT o_orderpriority,
                CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
                CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
         FROM orders GROUP BY 1 ORDER BY o_orderpriority""",
    // D8 sketch certification (VERDICT r10 #5): the Spark query emits
    // bound_ok = |approx − exact| within the declared envelope; the
    // oracle emits the exact value and literal TRUE, so an out-of-bound
    // sketch fails the hash compare — the quantitative driver-side check
    // replacing the old rows-only `no_oracle` posture.
    "q_agg_hll" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                TRUE AS bound_ok
         FROM events GROUP BY 1 ORDER BY event_type""",
    "q_agg_approx_pct" ->
      """WITH o AS (SELECT o_orderpriority, CAST(FLOOR(o_totalprice*100) AS BIGINT) AS total_c
                    FROM orders)
         SELECT o_orderpriority,
                round(quantile_cont(total_c, 0.5), 6) AS exact_median_c,
                COUNT(*) AS n,
                TRUE AS bound_ok
         FROM o GROUP BY 1 ORDER BY o_orderpriority""",
    "q_agg_percentile" ->
      """WITH o AS (SELECT o_orderpriority, CAST(FLOOR(o_totalprice*100) AS BIGINT) AS total_c
                    FROM orders)
         SELECT o_orderpriority,
                round(quantile_cont(total_c, 0.25), 6) AS p25_c,
                round(quantile_cont(total_c, 0.5), 6) AS median_c,
                round(quantile_cont(total_c, 0.9), 6) AS p90_c,
                COUNT(*) AS n
         FROM o GROUP BY 1 ORDER BY o_orderpriority""",
    "q_agg_collect" ->
      """SELECT lang,
                array_to_string(list_sort(list(DISTINCT source)), ',') AS sources_csv,
                COUNT(*) AS n
         FROM documents GROUP BY 1 ORDER BY lang""",
    // BPE merge training: 3 chained rounds of the same count→argmax→
    // sentinel-replace recurrence as ops/TextAnalysis.scala L36
    "q_text_bpe_train" ->
      s"""WITH $bpeCtes
         SELECT CAST(1 AS BIGINT) AS merge_rank, a AS pair_a, b AS pair_b, cnt FROM b1
         UNION ALL SELECT CAST(2 AS BIGINT), a, b, cnt FROM b2
         UNION ALL SELECT CAST(3 AS BIGINT), a, b, cnt FROM b3
         ORDER BY merge_rank""",
    // L39 BPE encoding: final dict d3 → per-word piece counts → per-doc
    // sums (same helpers as ops/TextAnalysis.scala q_text_bpe_encode)
    "q_text_bpe_encode" ->
      s"""WITH $bpeCtes,
         dict AS (SELECT w,
                         CAST(len(list_filter(string_split(repr, '|'), x -> x != '')) AS BIGINT) AS np
                  FROM d3),
         tok AS (SELECT doc_id, t AS w FROM (
                   SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
                 WHERE len(t) > 0),
         enc AS (SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(np) AS BIGINT) AS n_pieces
                 FROM tok JOIN dict USING (w) GROUP BY 1)
         SELECT doc_id, n_words, n_pieces,
                (n_pieces * 1000000) // n_words AS ppw_ppm
         FROM enc ORDER BY doc_id""",
    // fixed-point integer PageRank: the same int64 micro-unit recurrence
    // as ops/Graph.scala L35 (`//` == Spark's `div` on positive ints)
    "q_graph_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
         deg AS (SELECT u, COUNT(*) AS outdeg FROM e GROUP BY 1),
         r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS r FROM deg),
         s1 AS (SELECT e.v AS u,
                       CAST(150000 + (SUM(r0.r // deg.outdeg) * 85) // 100 AS BIGINT) AS r
                FROM e JOIN r0 ON e.u = r0.u JOIN deg ON deg.u = e.u GROUP BY e.v),
         s2 AS (SELECT e.v AS u,
                       CAST(150000 + (SUM(s1.r // deg.outdeg) * 85) // 100 AS BIGINT) AS r
                FROM e JOIN s1 ON e.u = s1.u JOIN deg ON deg.u = e.u GROUP BY e.v),
         s3 AS (SELECT e.v AS u,
                       CAST(150000 + (SUM(s2.r // deg.outdeg) * 85) // 100 AS BIGINT) AS r
                FROM e JOIN s2 ON e.u = s2.u JOIN deg ON deg.u = e.u GROUP BY e.v)
         SELECT (u - 1) // 2 AS supp_key, r AS rank_m
         FROM s3 WHERE u % 2 = 1
         ORDER BY rank_m DESC, supp_key LIMIT 20""",
    // degree-oriented triangle counting over the part co-occurrence
    // graph — same orientation rule and int64 ppm coefficient as
    // ops/Graph.scala L37
    "q_graph_triangles" -> trianglesSqlOn(""),
    // L55 incremental triangles: the fold over edge-arrival-day slices
    // is lossless (a triangle is counted once, on the day its last
    // edge arrives), so the batch profile is the oracle verbatim
    "q_tri_incr" -> trianglesSqlOn("", "WHERE l_orderkey % 6 = 0"),
    // L55 retraction: fold + lost-triangle delete of the takedown edge
    // set ((u + v) % 7 == 3) must land exactly on the reduced-graph
    // batch profile
    "q_tri_del" ->
      trianglesSqlOn("WHERE (a.sk + b.sk) % 7 <> 3", "WHERE l_orderkey % 6 = 0"),
    // L37b approximate triangles: identical deterministic h64-mod-4
    // VERTEX coloring (colorful counting — edges kept iff endpoints
    // share a color), exact recount on the monochromatic subgraph
    // (u<v<w form: (u,v),(v,w),(u,w) counts each triangle once — no
    // orientation needed at oracle scale), scale-up by 4² (see
    // ops/Graph.scala colorfulTriangles)
    "q_graph_triangles_approx" ->
      s"""WITH ls AS (SELECT ok, sk, (${h64Sql("CAST(sk AS VARCHAR)")}) % 4 AS c
                FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem)),
         es AS (SELECT DISTINCT a.sk AS u, b.sk AS v
                FROM ls a JOIN ls b ON a.ok = b.ok AND a.sk < b.sk AND a.c = b.c),
         tri AS (SELECT COUNT(*) AS t FROM es e1
                 JOIN es e2 ON e2.u = e1.v
                 JOIN es e3 ON e3.u = e1.u AND e3.v = e2.v),
         ne AS (SELECT COUNT(*) AS n FROM es)
         SELECT CAST(4 AS BIGINT) AS sample_mod,
                CAST(ne.n AS BIGINT) AS edges_sampled,
                CAST(tri.t AS BIGINT) AS tri_sampled,
                CAST(tri.t * 16 AS BIGINT) AS est_tri
         FROM tri, ne ORDER BY sample_mod""",
    // heavy hitters: exact recount over the planted-skew key stream —
    // the MG sketch on the Spark side only NOMINATES candidates, so the
    // exact SQL is the full semantics (see ops/Aggregates.scala D16)
    "q_heavy_hitters" ->
      """WITH k AS (SELECT CASE WHEN event_id % 5 = 0
                     THEN 'hot_' || CAST(event_id % 3 AS VARCHAR)
                     ELSE 'cold_' || CAST(event_id % 7919 AS VARCHAR) END AS k
               FROM events),
         c AS (SELECT k, COUNT(*) AS cnt FROM k GROUP BY 1),
         n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
         SELECT k, CAST(cnt AS BIGINT) AS cnt
         FROM c, n WHERE cnt * 25 > total ORDER BY cnt DESC, k""",
    // exact-moment statistics: identical double arithmetic over exact
    // integer moments (see ops/Aggregates.scala D15)
    "q_agg_stats" ->
      """WITH b AS (SELECT l_returnflag,
                  CAST(l_quantity AS BIGINT) AS x,
                  CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
               FROM lineitem),
         m AS (SELECT l_returnflag, COUNT(*) AS n,
                      CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(x*x) AS DOUBLE) AS sxx,
                      CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(y*y) AS DOUBLE) AS syy,
                      CAST(SUM(x*y) AS DOUBLE) AS sxy,
                      CAST(COUNT(*) AS DOUBLE) AS nd
               FROM b GROUP BY 1)
         SELECT l_returnflag, n,
                round(sx / nd, 6) AS mean_x,
                round(sy / nd, 6) AS mean_y,
                round((nd*sxx - sx*sx) / (nd*nd), 6) AS var_pop_x,
                round(sqrt((nd*sxx - sx*sx) / (nd*(nd - 1.0))), 6) AS stddev_samp_x,
                round((nd*sxy - sx*sy) / (nd*nd), 6) AS covar_pop,
                round((nd*sxy - sx*sy)
                      / (sqrt(nd*sxx - sx*sx) * sqrt(nd*syy - sy*sy)), 6) AS corr_xy
         FROM m ORDER BY l_returnflag""",

    "q_agg_mode" ->
      """WITH c AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY n DESC, source) AS rk FROM c)
         SELECT lang, source AS modal_source, n FROM r WHERE rk = 1 ORDER BY lang""",
    "q_win_pct_of_total" ->
      """WITH e AS (SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
                           event_type, CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
                    FROM events),
         g AS (SELECT day, event_type, CAST(SUM(vm) AS BIGINT) AS vm FROM e GROUP BY 1, 2)
         SELECT day, event_type, vm,
                CAST(vm * 1000000 // nullif(CAST(SUM(vm) OVER (PARTITION BY day) AS BIGINT), 0)
                  AS BIGINT) AS share_ppm
         FROM g ORDER BY day, event_type""",
    "q_agg_regression" ->
      """WITH b AS (SELECT l_returnflag,
                  CAST(l_quantity AS BIGINT) AS x,
                  CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
               FROM lineitem),
         m AS (SELECT l_returnflag, COUNT(*) AS n,
                      CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(x*x) AS DOUBLE) AS sxx,
                      CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(y*y) AS DOUBLE) AS syy,
                      CAST(SUM(x*y) AS DOUBLE) AS sxy,
                      CAST(COUNT(*) AS DOUBLE) AS nd
               FROM b GROUP BY 1)
         SELECT l_returnflag, n,
                round((nd*sxy - sx*sy) / (nd*sxx - sx*sx), 6) AS slope,
                round((sy - ((nd*sxy - sx*sy) / (nd*sxx - sx*sx)) * sx) / nd, 6) AS intercept,
                round((nd*sxy - sx*sy) * (nd*sxy - sx*sy)
                      / ((nd*sxx - sx*sx) * (nd*syy - sy*sy)), 6) AS r2
         FROM m ORDER BY l_returnflag""",

    "q_agg_entropy" ->
      """WITH e AS (SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
                           event_type
                    FROM events),
         c AS (SELECT day, event_type, COUNT(*) AS c FROM e GROUP BY 1, 2),
         n AS (SELECT day, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_types
               FROM c GROUP BY 1),
         t AS (SELECT c.day, n.n, n.n_types,
                      CAST(FLOOR((CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))
                        * ln(CAST(n.n AS DOUBLE) / CAST(c.c AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT) AS nm
               FROM c JOIN n USING (day))
         SELECT day, MAX(n) AS n_events, CAST(MAX(n_types) AS BIGINT) AS n_types,
                CAST(SUM(nm) AS BIGINT) AS entropy_micro_nats
         FROM t GROUP BY day ORDER BY day""",

    // ----- windows -----
    "q_win_rownum" ->
      """SELECT user_id, event_id,
                CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS BIGINT) AS rn
         FROM events ORDER BY user_id, rn""",
    "q_win_rank" ->
      """SELECT event_type, event_id, value,
                CAST(RANK() OVER tie AS BIGINT) AS rnk,
                CAST(DENSE_RANK() OVER tie AS BIGINT) AS drnk,
                PERCENT_RANK() OVER tie AS prnk,
                CAST(NTILE(4) OVER tot AS BIGINT) AS quartile
         FROM events
         WINDOW tie AS (PARTITION BY event_type ORDER BY value DESC),
                tot AS (PARTITION BY event_type ORDER BY value DESC, event_id)
         ORDER BY event_type, rnk, event_id""",
    "q_win_lag_lead" ->
      """SELECT user_id, event_id, value,
                LAG(value, 1) OVER w AS prev_value,
                LEAD(event_type, 1) OVER w AS next_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         ORDER BY event_id""",
    "q_win_moving_avg" ->
      """SELECT user_id, event_id,
                CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) OVER w AS DOUBLE)
                  / COUNT(*) OVER w AS mov_avg_micros
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_win_cumsum" ->
      """SELECT user_id, event_id,
                CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) OVER w AS BIGINT) AS cum_c
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_win_range" ->
      """SELECT event_type, event_id,
                CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) OVER w AS BIGINT) AS trailing_c,
                COUNT(*) OVER w AS trailing_n
         FROM (SELECT *, CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec FROM events)
         WINDOW w AS (PARTITION BY event_type ORDER BY sec
                      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_win_range_salted" ->
      """SELECT event_type, event_id,
                CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) OVER w AS BIGINT) AS trailing_c,
                COUNT(*) OVER w AS trailing_n
         FROM (SELECT *, CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec FROM events)
         WINDOW w AS (PARTITION BY event_type ORDER BY sec
                      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_win_rank_salted" ->
      """SELECT event_type, event_id, value,
                CAST(RANK() OVER tie AS BIGINT) AS rnk,
                CAST(DENSE_RANK() OVER tie AS BIGINT) AS drnk
         FROM events
         WINDOW tie AS (PARTITION BY event_type ORDER BY value DESC)
         ORDER BY event_type, rnk, event_id""",
    "q_win_first_last" ->
      """SELECT user_id, event_id,
                FIRST_VALUE(event_type) OVER w AS first_type,
                LAST_VALUE(event_type) OVER w AS last_type,
                NTH_VALUE(event_type, 2) OVER w AS second_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY event_id""",
    "q_win_topk_per_group" ->
      """SELECT event_type, rn, event_id, value FROM (
           SELECT event_type, event_id, value,
                  CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY value DESC, event_id) AS BIGINT) AS rn
           FROM events) t
         WHERE rn <= 3 ORDER BY event_type, rn""",

    // ----- scalar function families (§2.H) -----
    "q_str_funcs" ->
      """SELECT p_partkey,
                p_brand || '/' || p_type AS brand_type,
                upper(p_name) AS name_up,
                lower(p_type) AS type_lo,
                substring(p_name, 1, 8) AS name8,
                CAST(length(p_name) AS BIGINT) AS name_len,
                trim('  pad  ') AS trimmed,
                replace(p_type, ' ', '_') AS type_us,
                lpad(p_brand, 12, '#') AS brand_pad,
                CAST(instr(p_type, 'O') AS BIGINT) AS o_at,
                printf('%s:%04d', p_brand, p_size) AS fmt
         FROM part ORDER BY p_partkey""",
    "q_regex_funcs" ->
      """SELECT doc_id,
                regexp_extract(text, '^(\w+)', 1) AS first_word,
                regexp_replace(text, '\s+', '|', 'g') AS piped,
                CAST(CAST(regexp_matches(text, 'data') AS INT) AS BIGINT) AS has_data
         FROM documents ORDER BY doc_id""",
    "q_date_funcs" ->
      """SELECT o_orderkey,
                strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
                CAST(year(o_orderdate) AS BIGINT) AS y,
                CAST(month(o_orderdate) AS BIGINT) AS m,
                CAST(day(o_orderdate) AS BIGINT) AS dom,
                strftime(o_orderdate, '%Y-%m-%d') AS day_str,
                strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_str,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_end,
                CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
         FROM orders ORDER BY o_orderkey""",
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(round(l_extendedprice, 0) AS DOUBLE) AS price_r0,
                abs(l_quantity - 25) AS qty_dev,
                CAST(ceil(l_discount * 100) AS BIGINT) AS disc_ceil,
                CAST(floor(l_tax * 100) AS BIGINT) AS tax_floor,
                l_partkey % 7 AS pk_mod7,
                greatest(l_quantity, l_tax * 100) AS gr,
                least(l_orderkey, l_partkey) AS le,
                CAST(sign(l_quantity - 25) AS BIGINT) AS sgn
         FROM lineitem ORDER BY l_orderkey, l_linenumber, price_r0, qty_dev, disc_ceil,
           tax_floor, pk_mod7, gr, le, sgn""",
    "q_json_funcs" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_get,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed,
                printf('{"id":%d,"t":"%s"}', event_id, event_type) AS packed
         FROM events ORDER BY event_id""",
    "q_array_funcs" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                CAST(CAST(list_contains(string_split(text, ' '), 'data') AS INT) AS BIGINT) AS has_data,
                array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 5), ',') AS first5,
                CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS BIGINT) AS n_long,
                CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS total_chars,
                array_to_string(list_transform(list_slice(string_split(text, ' '), 1, 3), t -> upper(t)), ',') AS head3_up
         FROM documents ORDER BY doc_id""",
    "q_map_funcs" ->
      """SELECT event_id,
                array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
                CAST(len(json_keys(props)) AS BIGINT) AS n_entries
         FROM events ORDER BY event_id""",
    "q_hash_funcs" ->
      "SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id",
    "q_bit_funcs" ->
      """SELECT event_id,
                event_id & 255 AS lo_byte,
                event_id | 16 AS with_flag,
                xor(event_id, user_id) AS mixed,
                user_id << 4 AS shl,
                event_id >> 2 AS shr,
                CAST(bit_count(event_id) AS BIGINT) AS popcnt
         FROM events ORDER BY event_id""",
    "q_url_escape" ->
      """SELECT p_partkey,
                replace(replace(replace(
                  'entity:"' || p_name || '" -#' || p_brand || ' lang:en',
                  '%', '%25'), ' ', '%20'), '#', '%23') AS escaped
         FROM part ORDER BY p_partkey""",
    "q_gen_posexplode" ->
      """SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok FROM (
           SELECT doc_id, unnest(list_transform(string_split(text, ' '),
             (x, i) -> {'pos': i - 1, 'tok': x}), recursive := true)
           FROM documents) t
         ORDER BY doc_id, pos""",
    "q_try_funcs" ->
      """SELECT event_id,
                round(CAST(FLOOR(value*1000000) AS BIGINT) / NULLIF(event_id % 3, 0), 6) AS div3,
                TRY_CAST(event_type AS BIGINT) AS as_num,
                COALESCE(NULLIF(event_type, 'click'), 'none') AS not_click
         FROM events ORDER BY event_id""",
    "q_array_setops" ->
      """WITH x AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                    FROM documents)
         SELECT doc_id,
                COALESCE(array_to_string(list_sort(list_filter(toks,
                  t -> list_contains(['query','data','spark'], t))), ','), '') AS inter_csv,
                COALESCE(array_to_string(list_sort(list_filter(['query','data','spark'],
                  p -> NOT list_contains(toks, p))), ','), '') AS missing_csv,
                CAST(len(list_distinct(list_concat(toks, ['query','data','spark']))) AS BIGINT) AS n_union
         FROM x ORDER BY doc_id""",

    // ----- streaming batch-equivalents (§2.I) -----
    // merge-of-partials == full recompute: the oracle IS the rescan
    "q_agg_incremental" ->
      """SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) AS BIGINT) AS value_micros
         FROM events GROUP BY 1 ORDER BY event_type""",
    "q_stream_tumbling" ->
      """SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
                event_type, COUNT(*) AS n,
                CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) AS BIGINT) AS value_c
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    // Sliding 1h/30min: an event at t falls in the two windows starting at
    // 1800*floor(t/1800) and 1800*(floor(t/1800)-1) (epoch-aligned, as Spark).
    "q_stream_sliding" ->
      """SELECT strftime(make_timestamp(1000000 * 1800 *
                  (CAST(floor(epoch(CAST(ts AS TIMESTAMP))/1800) AS BIGINT) - k)),
                  '%Y-%m-%d %H:%M:%S') AS w_start,
                event_type, COUNT(*) AS n
         FROM events CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) ks
         GROUP BY 1, 2 ORDER BY w_start, event_type""",
    "q_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                    FROM events),
         c AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY 1)
         SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
                CAST(day - cohort_day AS BIGINT) AS day_offset,
                COUNT(*) AS n_users
         FROM a JOIN c USING (user_id)
         GROUP BY c.cohort_day, day - cohort_day
         ORDER BY cohort_day, day_offset""",
    "q_transitions" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
                    FROM events),
         x AS (SELECT event_type AS from_type,
                      lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        AS to_type
               FROM e),
         m AS (SELECT from_type, to_type, COUNT(*) AS n FROM x
               WHERE to_type IS NOT NULL GROUP BY 1, 2),
         o AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS outflow FROM m GROUP BY 1)
         SELECT m.from_type, m.to_type, m.n,
                CAST(m.n * 1000000 // o.outflow AS BIGINT) AS share_ppm
         FROM m JOIN o USING (from_type)
         ORDER BY from_type, to_type""",
    "q_interval_concurrency" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS lo,
                           CAST(o_orderdate AS DATE) + 30 AS hi FROM orders),
         d AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS delta FROM (
                 SELECT lo AS day, 1 AS delta FROM o
                 UNION ALL SELECT hi AS day, -1 AS delta FROM o)
               GROUP BY day)
         SELECT strftime(day, '%Y-%m-%d') AS day, delta,
                CAST(SUM(delta) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_orders
         FROM d ORDER BY day""",
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                           CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
                    FROM events),
         x AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
               FROM e),
         f AS (SELECT *, CASE WHEN prev_ts IS NULL
                    OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                       - CAST(FLOOR(epoch(prev_ts)) AS BIGINT) > 1800
                    THEN 1 ELSE 0 END AS new_s
               FROM x),
         s AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
               FROM f)
         SELECT user_id, session_id,
                strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                COUNT(*) AS n_events, CAST(SUM(vm) AS BIGINT) AS value_micros
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q_resample_gapfill" ->
      """WITH ev AS (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                           CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
                    FROM events),
         b AS (SELECT user_id, h, CAST(SUM(vm) AS BIGINT) AS vm, COUNT(*) AS n
               FROM ev GROUP BY 1, 2),
         g AS (SELECT user_id, unnest(generate_series(MIN(h), MAX(h), INTERVAL 1 HOUR)) AS h
               FROM b GROUP BY user_id),
         j AS (SELECT g.user_id, g.h, COALESCE(b.n, 0) AS n,
                      last_value(b.vm IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vmf
               FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.h = b.h)
         SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
                CAST(n AS BIGINT) AS n, CAST(COALESCE(vmf, 0) AS BIGINT) AS vm_filled
         FROM j ORDER BY user_id, hour""",
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
         u AS (SELECT DISTINCT user_id FROM e),
         s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'click' GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
         SELECT u.user_id,
                CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                          WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
                strftime(t1, '%Y-%m-%d %H:%M:%S') AS t1,
                strftime(t2, '%Y-%m-%d %H:%M:%S') AS t2,
                strftime(t3, '%Y-%m-%d %H:%M:%S') AS t3
         FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                LEFT JOIN s3 USING (user_id)
         ORDER BY user_id""",
    // Gaps-and-islands: new session where ts - prev_ts >= 30 min (Spark
    // session_window treats adjacent = non-overlapping as a new session).
    "q_stream_session_dyn" ->
      """WITH e AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value, event_id,
                  CAST(ts AS TIMESTAMP) +
                    CASE WHEN event_type = 'purchase' THEN INTERVAL 10 MINUTE
                         ELSE INTERVAL 30 MINUTE END AS t_end
           FROM events),
         b AS (
           SELECT *, MAX(t_end) OVER (PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
           FROM e),
         s AS (
           SELECT *, SUM(CASE WHEN prev_end IS NULL OR t >= prev_end THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
           FROM b)
         SELECT user_id, strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS session_start,
                COUNT(*) AS n,
                CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) AS BIGINT) AS value_c
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q_stream_session" ->
      """WITH x AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value, event_id,
                  LAG(CAST(ts AS TIMESTAMP)) OVER
                    (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_t
           FROM events),
         y AS (
           SELECT *, SUM(CASE WHEN prev_t IS NULL OR t - prev_t >= INTERVAL 30 MINUTE
                              THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
           FROM x)
         SELECT user_id, strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS session_start,
                COUNT(*) AS n,
                CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) AS BIGINT) AS value_c
         FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q_stream_dedup" ->
      """SELECT user_id, event_type, first_event_id FROM (
           SELECT user_id, event_type, event_id AS first_event_id,
                  ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
           FROM events) t
         WHERE rn = 1 ORDER BY user_id, event_type""",
    "q_stream_stateful" ->
      """WITH agg AS (
           SELECT user_id, COUNT(*) AS n_events,
                  CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) AS BIGINT) AS value_c
           FROM events GROUP BY 1),
         lastt AS (
           SELECT user_id, event_type AS last_type FROM (
             SELECT user_id, event_type,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
             FROM events) t WHERE rn = 1)
         SELECT agg.user_id, n_events, value_c, last_type
         FROM agg JOIN lastt USING (user_id) ORDER BY user_id""",

    // ----- text / LLM-pipeline core (§2.J) -----
    "q_text_tokens" ->
      """SELECT lang, tok, COUNT(*) AS n
         FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents) t
         GROUP BY 1, 2 ORDER BY lang, tok""",
    "q_text_bigrams" ->
      """WITH b AS (
           SELECT lang, unnest(list_transform(
             list_slice(string_split(text, ' '), 2, len(string_split(text, ' '))),
             (x, i) -> string_split(text, ' ')[i] || ' ' || x)) AS bigram
           FROM documents),
         c AS (SELECT lang, bigram, COUNT(*) AS n FROM b GROUP BY 1, 2),
         r AS (SELECT lang, bigram, n,
                      CAST(ROW_NUMBER() OVER (PARTITION BY lang
                        ORDER BY n DESC, bigram) AS BIGINT) AS rk
               FROM c)
         SELECT lang, rk, bigram, n FROM r WHERE rk <= 5 ORDER BY lang, rk""",
    "q_text_sentiment" ->
      """WITH lex(word, sc) AS (VALUES ('fast', 2), ('spark', 2), ('big', 1),
                                       ('value', 1), ('slow', -2), ('small', -1)),
         t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         s AS (SELECT doc_id, CAST(COALESCE(SUM(sc), 0) AS BIGINT) AS score
               FROM t LEFT JOIN lex ON tok = word GROUP BY 1)
         SELECT doc_id, score,
                CASE WHEN score > 0 THEN 'pos' WHEN score < 0 THEN 'neg'
                     ELSE 'neu' END AS mood
         FROM s ORDER BY doc_id""",
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keeper_id""",
    "q_sim_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(
                  list_slice(tk, 3, len(tk)),
                  (x, i) -> tk[i] || ' ' || tk[i+1] || ' ' || x))) AS s
                FROM toks),
         sh AS (SELECT doc_id, ${h64Sql("s")} AS s FROM sh0),
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_inter
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         j AS (SELECT d1, d2,
                      round(CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter), 6) AS jac
               FROM inter
               JOIN sizes s1 ON s1.doc_id = d1
               JOIN sizes s2 ON s2.doc_id = d2)
         SELECT d1, d2, jac FROM j WHERE jac >= 0.2 ORDER BY d1, d2""",
    "q_sim_cosine" ->
      """WITH n AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM embeddings),
         m AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS norm2 FROM n),
         q AS (SELECT vec_id AS q_id, v AS qv, norm2 AS qn FROM m WHERE vec_id % 50 = 0),
         c AS (SELECT vec_id AS c_id, v AS cv, norm2 AS cn FROM m),
         p AS (SELECT q_id, c_id,
                      CAST(list_sum(list_transform(qv, (x, i) -> x * cv[i])) AS DOUBLE) AS dot,
                      CAST(qn AS DOUBLE) AS qnd, CAST(cn AS DOUBLE) AS cnd
               FROM q JOIN c ON q_id <> c_id),
         r AS (SELECT q_id, c_id, round(dot / (sqrt(qnd) * sqrt(cnd)), 6) AS sim FROM p),
         k AS (SELECT q_id, c_id, sim,
                      CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY sim DESC, c_id) AS BIGINT) AS rk
               FROM r)
         SELECT q_id, rk, c_id, sim FROM k WHERE rk <= 3 ORDER BY q_id, rk""",
    "q_multimodal_struct" ->
      """SELECT doc_id,
                to_json(struct_pack(
                  meta := struct_pack(lang := lang, source := source),
                  stats := struct_pack(n_chars := n_chars,
                                       n_len := CAST(length(text) AS BIGINT)))) AS doc_json,
                lang, n_chars
         FROM documents ORDER BY doc_id""",

    // ----- dedup extensions (MinHash-LSH / SimHash / n-gram / embedding) -----
    // duplicated 8-token-span profile (see ops/Dedup.scala L32)
    "q_dedup_spans" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         sp0 AS (SELECT doc_id,
                   CASE WHEN len(tk) >= 8
                     THEN [array_to_string(tk[i:i+7], ' ') for i in range(1, len(tk) - 6)]
                     ELSE [] END AS sps
                 FROM t),
         u AS (SELECT doc_id, unnest(sps) AS span FROM sp0),
         e AS (SELECT doc_id, ${h64Sql("span")} AS h FROM u),
         dd AS (SELECT h, CAST(1 AS BIGINT) AS isdup
                FROM e GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         m AS (SELECT e.doc_id, COUNT(*) AS n_spans,
                      CAST(SUM(coalesce(dd.isdup, 0)) AS BIGINT) AS n_dup_spans
               FROM e LEFT JOIN dd ON e.h = dd.h GROUP BY 1)
         SELECT doc_id, n_spans, n_dup_spans,
                round(CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE), 6) AS dup_frac
         FROM m WHERE n_dup_spans > 0 ORDER BY doc_id""",
    "q_dedup_minhash" -> minhashSql,
    // L2b incremental near-dup: the daily band-store fold's cumulative
    // pair ledger must equal the full-corpus recompute — the lossless
    // proof, so the oracle IS the q_dedup_minhash SQL verbatim
    "q_dedup_incr" -> minhashSql,
    // L44 retraction: fold + tombstone delete of the takedown set
    // (doc_id % 7 == 3) must land exactly on the reduced-corpus batch
    // recompute — retracted docs vanish from the pair ledger entirely
    "q_dedup_del" ->
      minhashSqlOn("(SELECT * FROM documents WHERE doc_id % 7 <> 3) documents"),
    // L15b fuzzy decontamination: same shared-randomness MinHash bands,
    // restricted to train×eval buckets, exact-Jaccard verified
    "q_decontaminate_fuzzy" ->
      s"""WITH $shingleCtes,
         e0 AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
         e AS (SELECT doc_id, ${h64Sql("sh")} % $permMod AS h FROM e0),
         mins AS (SELECT doc_id, $minCols FROM e GROUP BY 1),
         bands AS (SELECT doc_id, unnest([$bandList]) AS band FROM mins),
         eb AS (SELECT DISTINCT band, doc_id AS eval_id FROM bands WHERE doc_id % 10 = 7),
         tb AS (SELECT band, doc_id FROM bands WHERE doc_id % 10 <> 7),
         cand AS (SELECT DISTINCT doc_id, eval_id FROM tb JOIN eb USING (band)),
         v AS (SELECT cand.doc_id AS doc_id, eval_id,
                      CAST(len(list_filter(sa.shs, x -> list_contains(sb.shs, x))) AS BIGINT) AS ni,
                      len(sa.shs) AS na, len(sb.shs) AS nb
               FROM cand JOIN sh sa ON sa.doc_id = cand.doc_id
                         JOIN sh sb ON sb.doc_id = eval_id),
         j AS (SELECT doc_id, round(CAST(ni AS DOUBLE) / (na + nb - ni), 6) AS jac FROM v)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_matches, MAX(jac) AS max_jac
         FROM j WHERE jac >= 0.2 GROUP BY doc_id ORDER BY doc_id""",
    "q_dedup_cluster" -> dedupClusterSql,
    "q_dedup_survivors" -> dedupSurvivorsSql,
    "q_dedup_simhash" -> simhashSql,
    "q_dedup_embed" -> embedLshSql,
    "q_dedup_ngram" ->
      s"""WITH g AS (SELECT doc_id,
                  list_distinct([substring(text, i, 5) for i in range(1, length(text) - 3)]) AS gs
               FROM documents),
         e0 AS (SELECT doc_id, unnest(gs) AS gr FROM g),
         e AS (SELECT doc_id, ${h64Sql("gr")} % $permMod AS h FROM e0),
         mins AS (SELECT doc_id, $minCols FROM e GROUP BY 1),
         bands AS (SELECT doc_id, unnest([$bandList4]) AS band FROM mins),
         cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id <> b.doc_id
                  WHERE a.doc_id % 25 = 0),
         v AS (SELECT d1, d2,
                      CAST(len(list_filter(ga.gs, x -> list_contains(gb.gs, x))) AS BIGINT) AS ni,
                      len(ga.gs) AS na, len(gb.gs) AS nb
               FROM cand JOIN g ga ON ga.doc_id = d1 JOIN g gb ON gb.doc_id = d2),
         j AS (SELECT d1, d2, round(CAST(ni AS DOUBLE) / (na + nb - ni), 6) AS jac FROM v)
         SELECT d1, d2, jac FROM j WHERE jac >= 0.3 ORDER BY d1, d2""",

    // ----- similarity search / vector agg -----
    "q_ann_lsh" -> annLshSqlOn("embeddings"),
    // L45 retraction: fold + tombstone delete of the takedown set
    // (vec_id % 7 == 3) must land exactly on the reduced-corpus batch
    // recompute — retracted vectors leave query AND answer sets
    "q_ann_del" ->
      annLshSqlOn("(SELECT * FROM embeddings WHERE vec_id % 7 <> 3) embeddings"),
    // L45 incremental ANN: bucket codes are pure functions of the
    // vectors, so the daily-folded index answers IDENTICALLY to the
    // full-corpus recompute — the oracle is q_ann_lsh's SQL verbatim
    "q_ann_incr" -> annLshSqlOn("embeddings"),
    "q_ann_ivf" ->
      """WITH n AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM embeddings),
         m AS (SELECT vec_id, label, v, list_sum(list_transform(v, x -> x * x)) AS norm2 FROM n),
         e AS (SELECT label, i, v[i] AS c
               FROM n CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix),
         cs AS (SELECT label, i, CAST(FLOOR(CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cc
                FROM e GROUP BY 1, 2),
         cn AS (SELECT label, CAST(SUM(cc * cc) AS BIGINT) AS cn2 FROM cs GROUP BY 1),
         q AS (SELECT vec_id AS q_id, v AS qv, CAST(norm2 AS DOUBLE) AS qn
               FROM m WHERE vec_id % 50 = 0),
         qc AS (SELECT q_id, qn, cs.label AS c_label, CAST(SUM(qv[i] * cc) AS DOUBLE) AS cdot
                FROM q, cs GROUP BY 1, 2, 3),
         sc AS (SELECT q_id, c_label,
                       cdot / (sqrt(qn) * sqrt(CAST(cn2 AS DOUBLE))) AS simc
                FROM qc JOIN cn ON cn.label = qc.c_label),
         pr AS (SELECT q_id, c_label FROM (
                  SELECT q_id, c_label,
                         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY simc DESC, c_label) AS crk
                  FROM sc) t WHERE crk <= 2),
         cand AS (SELECT q_id, m.vec_id AS c_id
                  FROM pr JOIN m ON m.label = pr.c_label
                  WHERE m.vec_id <> q_id),
         p AS (SELECT q_id, c_id,
                      CAST(list_sum(list_transform(ma.v, (x, i) -> x * mb.v[i])) AS DOUBLE) AS dot,
                      CAST(ma.norm2 AS DOUBLE) AS qn2, CAST(mb.norm2 AS DOUBLE) AS cn3
               FROM cand JOIN m ma ON ma.vec_id = q_id JOIN m mb ON mb.vec_id = c_id),
         r AS (SELECT q_id, c_id, round(dot / (sqrt(qn2) * sqrt(cn3)), 6) AS sim FROM p),
         k AS (SELECT q_id, c_id, sim,
                      CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rk
               FROM r)
         SELECT q_id, rk, c_id, sim FROM k WHERE rk <= 3 ORDER BY q_id, rk""",
    // k-means: seeded assign + one Lloyd step (see ops/Similarity.scala L33)
    "q_cluster_kmeans" ->
      """WITH n AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM embeddings),
         m AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM n),
         seeds AS (SELECT vec_id AS sid, v AS sv, n2 AS sn2 FROM m WHERE vec_id < 8),
         a1 AS (SELECT vec_id, sid,
                       CAST(list_sum(list_transform(v, (x, i) -> x * sv[i])) AS DOUBLE)
                         / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(sn2 AS DOUBLE))) AS sim
                FROM m, seeds),
         as1 AS (SELECT vec_id, sid AS cl FROM (
                   SELECT vec_id, sid,
                          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, sid) AS rk
                   FROM a1) t WHERE rk = 1),
         e AS (SELECT as1.cl, i, m.v[i] AS c
               FROM as1 JOIN m USING (vec_id)
               CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix),
         cs AS (SELECT cl, i, CAST(FLOOR(CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cc
                FROM e GROUP BY 1, 2),
         cv AS (SELECT cl, list(cc ORDER BY i) AS cvec FROM cs GROUP BY 1),
         cn AS (SELECT cl AS cl2, cvec, list_sum(list_transform(cvec, x -> x * x)) AS cn2 FROM cv),
         a2 AS (SELECT vec_id, cl2,
                       CAST(list_sum(list_transform(v, (x, i) -> x * cvec[i])) AS DOUBLE)
                         / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS sim
                FROM m, cn),
         as2 AS (SELECT vec_id, cl2, sim FROM (
                   SELECT vec_id, cl2, sim,
                          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cl2) AS rk
                   FROM a2) t WHERE rk = 1),
         f AS (SELECT cl2 AS cluster, CAST(FLOOR(sim * 1000000) AS BIGINT) AS sim_i FROM as2)
         SELECT cluster, COUNT(*) AS n,
                CAST(SUM(sim_i) AS BIGINT) AS sim_sum,
                round(CAST(CAST(SUM(sim_i) AS BIGINT) AS DOUBLE)
                      / (1000000.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS mean_sim
         FROM f GROUP BY 1 ORDER BY cluster""",
    // L51 incremental k-means: the batch recompute with the
    // DETERMINISTIC seed directions inlined as literals (the fold's
    // seed-assignment partials merge to exactly these centroids under
    // any slicing, and the final re-assign epoch reconciles the
    // assignments — so the batch IS the oracle, like its siblings)
    "q_cluster_incr" -> clusterIncrSqlOn("embeddings"),
    // L51 retraction: fold + signed-partial delete of the takedown set
    // (vec_id % 7 == 3) must land exactly on the reduced-corpus batch
    // recompute — negated centroid partials + vec/assignment tombstones
    "q_cluster_del" ->
      clusterIncrSqlOn("(SELECT * FROM embeddings WHERE vec_id % 7 <> 3) embeddings"),
    // cluster keyword labeling: seeded assignment (same CTE as SemDeDup)
    // + integer-ppm token lift (see ops/Similarity.scala L41)
    "q_cluster_terms" ->
      """WITH n AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM embeddings),
         m AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM n),
         seeds AS (SELECT vec_id AS sid, v AS sv, n2 AS sn2 FROM m WHERE vec_id < 8),
         a1 AS (SELECT vec_id, sid,
                       CAST(list_sum(list_transform(v, (x, i) -> x * sv[i])) AS DOUBLE)
                         / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(sn2 AS DOUBLE))) AS sim
                FROM m, seeds),
         asg AS (SELECT vec_id, sid AS cl FROM (
                   SELECT vec_id, sid,
                          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, sid) AS rk
                   FROM a1) t WHERE rk = 1),
         t AS (SELECT asg.cl, unnest(string_split(d.text, ' ')) AS tok
               FROM documents d JOIN asg ON d.doc_id = asg.vec_id),
         ct AS (SELECT cl, tok, COUNT(*) AS tf_c FROM t GROUP BY 1, 2),
         cc AS (SELECT cl, CAST(SUM(tf_c) AS BIGINT) AS tot_c FROM ct GROUP BY 1),
         gt AS (SELECT tok, CAST(SUM(tf_c) AS BIGINT) AS tf_g FROM ct GROUP BY 1),
         gg AS (SELECT CAST(SUM(tf_g) AS BIGINT) AS tot_g FROM gt),
         sc AS (SELECT ct.cl, ct.tok, ct.tf_c,
                       (ct.tf_c * 1000000) // cc.tot_c - (gt.tf_g * 1000000) // gg.tot_g AS lift_ppm
                FROM ct JOIN cc USING (cl) JOIN gt USING (tok) CROSS JOIN gg),
         r AS (SELECT cl, tok, tf_c, lift_ppm,
                      ROW_NUMBER() OVER (PARTITION BY cl ORDER BY lift_ppm DESC, tok) AS rk
               FROM sc)
         SELECT cl AS cluster, CAST(rk AS BIGINT) AS rk, tok, lift_ppm, tf_c
         FROM r WHERE rk <= 3 ORDER BY cluster, rk""",
    // SemDeDup: within-cluster exact cosine dedup (see ops/Similarity.scala L34)
    "q_dedup_semantic" ->
      """WITH n AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM embeddings),
         m AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM n),
         seeds AS (SELECT vec_id AS sid, v AS sv, n2 AS sn2 FROM m WHERE vec_id < 8),
         a1 AS (SELECT vec_id, sid,
                       CAST(list_sum(list_transform(v, (x, i) -> x * sv[i])) AS DOUBLE)
                         / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(sn2 AS DOUBLE))) AS sim
                FROM m, seeds),
         asg AS (SELECT a1.vec_id, sid AS cl, m.v, m.n2 FROM (
                   SELECT vec_id, sid,
                          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, sid) AS rk
                   FROM a1) a1 JOIN m USING (vec_id) WHERE rk = 1),
         p AS (SELECT a.cl, b.vec_id AS ib,
                      CAST(list_sum(list_transform(a.v, (x, i) -> x * b.v[i])) AS DOUBLE)
                        / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS ps
               FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id),
         dr AS (SELECT cl, COUNT(DISTINCT ib) AS n_dropped FROM p WHERE ps >= 0.4 GROUP BY 1),
         mem AS (SELECT cl, COUNT(*) AS n_members FROM asg GROUP BY 1)
         SELECT mem.cl AS cluster, n_members,
                CAST(coalesce(dr.n_dropped, 0) AS BIGINT) AS n_dropped,
                CAST(n_members - coalesce(dr.n_dropped, 0) AS BIGINT) AS n_kept
         FROM mem LEFT JOIN dr ON mem.cl = dr.cl ORDER BY cluster""",
    "q_embed_centroid" ->
      """WITH n AS (SELECT CAST(label AS BIGINT) AS label,
                  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM embeddings),
         e AS (SELECT label, i, v[i] AS c
               FROM n CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ix),
         g AS (SELECT label, CAST(i AS BIGINT) AS comp, COUNT(*) AS n,
                      CAST(SUM(c) AS DOUBLE) AS sc
               FROM e GROUP BY 1, 2)
         SELECT label, comp, n, round(sc / n, 6) AS mean_c
         FROM g ORDER BY label, comp""",
    "q_embed_quantize" ->
      """WITH n AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM embeddings),
         m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM n),
         r AS (SELECT vec_id, v, mn, mx, greatest(mx - mn, 1) AS rng FROM m),
         q AS (SELECT vec_id, v, mn, mx, rng,
                      list_transform(v, x -> (x - mn) * 255 // rng) AS qv FROM r),
         dq AS (SELECT vec_id, v, mn, mx,
                       list_transform(qv, c -> mn + (c * rng) // 255) AS dv FROM q),
         e AS (SELECT vec_id, mn, mx,
                      list_transform(v, (x, i) -> abs(x - dv[i])) AS errs FROM dq)
         SELECT vec_id, mn, mx, list_max(errs) AS max_err,
                CAST(list_sum(errs) AS BIGINT) AS sum_err
         FROM e ORDER BY vec_id""",
    // signs baked from the shared portable hash (same matrix as
    // ops.Similarity.projectionSigns) — each p_j is a ±-signed sum of
    // the int64-scaled components, so the compare is bit-exact
    "q_embed_project" -> {
      val terms = graft.ops.Similarity.projectionSigns.zipWithIndex.map {
        case (row, j) =>
          val sum = row.zipWithIndex.map { case (sg, i) =>
            s"${if (sg > 0) "+" else "-"} v[${i + 1}]"
          }.mkString(" ")
          s"CAST(($sum) AS BIGINT) AS p$j"
      }.mkString(", ")
      s"""WITH n AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
               FROM embeddings)
         SELECT vec_id, $terms FROM n ORDER BY vec_id"""
    },

    // ----- text analysis extensions -----
    "q_text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang AS labeled, unnest(string_split(text, ' ')) AS tok
                FROM documents),
         v AS (SELECT doc_id, labeled, ${h64Sql("tok")} % 5 AS lang_idx, COUNT(*) AS votes
               FROM t GROUP BY 1, 2, 3),
         r AS (SELECT doc_id, labeled, lang_idx, votes,
                      ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY votes DESC, lang_idx) AS rn
               FROM v),
         p AS (SELECT doc_id, (['de','en','es','fr','zh'])[CAST(lang_idx + 1 AS INT)] AS pred_lang,
                      votes, labeled
               FROM r WHERE rn = 1)
         SELECT doc_id, pred_lang, votes,
                CAST(CAST(labeled = pred_lang AS INT) AS BIGINT) AS is_match
         FROM p ORDER BY doc_id""",
    "q_text_quality" ->
      """WITH x AS (SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents),
         y AS (SELECT doc_id,
                      CAST(len(toks) AS BIGINT) AS n_toks,
                      CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
                      CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop,
                      n_chars
               FROM x),
         z AS (SELECT doc_id, n_toks, n_distinct,
                      CAST(floor(CAST(n_distinct AS DOUBLE) * 1000000 / n_toks) AS BIGINT) AS ttr_micros,
                      CAST(floor(CAST(n_stop AS DOUBLE) * 1000000 / n_toks) AS BIGINT) AS stop_micros,
                      CAST(floor(CAST(n_chars AS DOUBLE) * 1000000 / n_toks) AS BIGINT) AS avg_len_micros
               FROM y)
         SELECT doc_id, n_toks, n_distinct, ttr_micros, stop_micros, avg_len_micros,
                CASE WHEN n_toks >= 40 AND ttr_micros >= 350000 THEN 'high'
                     WHEN n_toks >= 20 THEN 'medium' ELSE 'low' END AS quality
         FROM z ORDER BY doc_id""",
    "q_text_bpe" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT) AS n_words,
                CAST(list_sum(list_transform(regexp_extract_all(text, '[a-z0-9]+', 0),
                  t -> (length(t) + 3) // 4)) AS BIGINT) AS n_pieces
         FROM documents ORDER BY doc_id""",
    "q_sample_hash" ->
      s"""WITH b AS (SELECT doc_id, lang,
                   ${h64Sql("'sample:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
                FROM documents),
         s AS (SELECT doc_id, lang FROM b
               WHERE CASE WHEN lang = 'en' THEN bucket < 50 ELSE bucket < 10 END)
         SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         FROM s GROUP BY 1 ORDER BY lang""",
    "q_sample_mixture" ->
      s"""WITH w(lang, w_ppm) AS (SELECT * FROM (VALUES
           ('de', 150000), ('en', 400000), ('es', 80000),
           ('fr', 120000), ('zh', 250000))),
         d AS (SELECT doc_id, lang FROM documents),
         n AS (SELECT lang, COUNT(*) AS n_obs FROM d GROUP BY 1),
         t AS (SELECT MIN(n_obs * 1000000 // w_ppm) AS t_max
               FROM n JOIN w USING (lang)),
         k AS (SELECT lang, t_max * w_ppm // 1000000 AS k_target
               FROM w CROSS JOIN t),
         r AS (SELECT doc_id, lang,
                      CAST(ROW_NUMBER() OVER (PARTITION BY lang
                        ORDER BY ${h64Sql("'mix:' || CAST(doc_id AS VARCHAR)")}, doc_id)
                        AS BIGINT) AS rk
               FROM d)
         SELECT doc_id, lang FROM r JOIN k USING (lang)
         WHERE rk <= k_target ORDER BY doc_id""",
    // A-ES weighted sampling: key = ln(u)/w floored to int64 micros,
    // u from the shared portable h64 (see ops/TextAnalysis.scala L42)
    "q_sample_weighted" ->
      s"""WITH d0 AS (SELECT doc_id, lang,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
                  ${h64Sql("'wsamp:' || CAST(doc_id AS VARCHAR)")} AS h
               FROM documents),
         kq AS (SELECT doc_id, lang, w,
                  CAST(FLOOR(ln((CAST(h AS DOUBLE) + 1) / 1152921504606846976.0)
                             / w * 1000000 + 0.000001) AS BIGINT) AS key_micros
                FROM d0),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY key_micros DESC, doc_id) AS BIGINT) AS rk
               FROM kq)
         SELECT lang, rk, doc_id, w, key_micros
         FROM r WHERE rk <= 5 ORDER BY lang, rk""",
    "q_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         g AS (SELECT doc_id,
                      unnest(list_distinct([array_to_string(list_slice(tk, i - 4, i), ' ')
                                            for i in range(5, len(tk) + 1)])) AS gram
               FROM t),
         h AS (SELECT doc_id, ${h64Sql("gram")} AS gh FROM g)
         SELECT tr.doc_id,
                CAST(COUNT(DISTINCT tr.gh) AS BIGINT) AS n_shared,
                CAST(COUNT(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs
         FROM h tr JOIN h ev ON tr.gh = ev.gh
         WHERE tr.doc_id % 10 <> 7 AND ev.doc_id % 10 = 7
         GROUP BY tr.doc_id ORDER BY tr.doc_id""",
    "q_text_scrub" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         k AS (SELECT doc_id, tk,
                      list_filter(tk, x -> x <> 'the' AND x <> 'a') AS kept
               FROM t)
         SELECT doc_id, array_to_string(kept, ' ') AS scrubbed,
                CAST(len(tk) - len(kept) AS BIGINT) AS n_removed
         FROM k ORDER BY doc_id""",
    "q_text_fingerprint" ->
      s"""WITH x AS (SELECT doc_id,
                  list_transform(string_split(text, ' '), t -> ${h64Sql("t")}) AS hs
               FROM documents),
         r AS (SELECT doc_id,
                      [list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hs, i - 7, i)),
                         (a, h) -> (a * 257 + h) % 1000000007)
                       for i in range(8, len(hs) + 1)] AS rolls
               FROM x)
         SELECT doc_id, list_min(rolls) AS fingerprint,
                CAST(len(rolls) AS BIGINT) AS n_windows
         FROM r ORDER BY doc_id""",
    "q_text_repetition" ->
      """WITH x AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         y AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_toks,
                      ['2:' || tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))] AS g2,
                      ['3:' || tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk) - 1)] AS g3
               FROM x WHERE len(tk) >= 3),
         e AS (SELECT doc_id, n_toks, unnest(list_concat(g2, g3)) AS g FROM y),
         c AS (SELECT doc_id, n_toks, g, COUNT(*) AS c FROM e GROUP BY 1, 2, 3),
         m AS (SELECT doc_id, n_toks,
                      MAX(CASE WHEN g LIKE '2:%' THEN c END) AS c2,
                      MAX(CASE WHEN g LIKE '3:%' THEN c END) AS c3
               FROM c GROUP BY 1, 2),
         f AS (SELECT doc_id,
                      CAST(floor(CAST(c2 AS DOUBLE) * 1000000 / (n_toks - 1)) AS BIGINT) AS top2_ppm,
                      CAST(floor(CAST(c3 AS DOUBLE) * 1000000 / (n_toks - 2)) AS BIGINT) AS top3_ppm
               FROM m)
         SELECT doc_id, top2_ppm, top3_ppm,
                CASE WHEN top2_ppm > 200000 OR top3_ppm > 180000
                     THEN 'drop' ELSE 'keep' END AS verdict
         FROM f ORDER BY doc_id""",
    "q_text_keyphrases" ->
      """WITH t AS (SELECT doc_id, unnest(list_transform(string_split(text, ' '),
                      (x, i) -> {'pos': i, 'tok': x}), recursive := true)
                    FROM documents),
         s AS (SELECT doc_id, pos, tok,
                      CASE WHEN tok IN ('a','the','is','of','and','to','in')
                           THEN 1 ELSE 0 END AS is_stop
               FROM t),
         r AS (SELECT *, SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
               FROM s),
         c AS (SELECT doc_id, run_id, pos, tok,
                      (ROW_NUMBER() OVER (PARTITION BY doc_id, run_id ORDER BY pos) - 1) // 3 AS chunk
               FROM r WHERE is_stop = 0),
         p AS (SELECT doc_id, run_id, chunk,
                      string_agg(tok, ' ' ORDER BY pos) AS phrase, COUNT(*) AS plen
               FROM c GROUP BY 1, 2, 3),
         tf AS (SELECT doc_id, phrase, COUNT(*) AS tf FROM p WHERE plen >= 2 GROUP BY 1, 2),
         df AS (SELECT phrase, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         sc AS (SELECT doc_id, tf.phrase AS phrase,
                       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score
                FROM tf JOIN df USING (phrase) CROSS JOIN n),
         rk AS (SELECT doc_id, phrase, score,
                       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, phrase) AS BIGINT) AS rk
                FROM sc)
         SELECT doc_id, rk, phrase, score FROM rk WHERE rk <= 3
         ORDER BY doc_id, rk""",
    "q_text_tfidf" -> tfidfSql,
    // L46 retraction: fold + signed-partial delete of the takedown set
    // (doc_id % 7 == 3) must land exactly on the reduced-corpus batch
    // recompute
    "q_tfidf_del" ->
      tfidfSqlOn("(SELECT * FROM documents WHERE doc_id % 7 <> 3) documents"),
    // the incremental fold is LOSSLESS (summed per-day df partials ==
    // full-corpus df because doc sets are disjoint across days), so the
    // oracle is the batch recompute verbatim — same contract as
    // q_dedup_incr/q_ann_incr
    "q_tfidf_incr" -> tfidfSql,
    "q_domains_incr" -> urlDomainsSql,
    // L47 retraction: fold + negative-partial delete of the takedown
    // set (doc_id % 7 == 3) must land exactly on the reduced-corpus
    // batch recompute
    "q_domains_del" ->
      urlDomainsSqlOn("(SELECT * FROM documents WHERE doc_id % 7 <> 3) documents"),

    // ----- composed curation pipeline -----
    "q_pipeline_curate" ->
      s"""WITH docs AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
                        FROM documents),
         t AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
         v AS (SELECT doc_id, ${h64Sql("tok")} % 5 AS lang_idx, COUNT(*) AS votes
               FROM t GROUP BY 1, 2),
         pred AS (SELECT doc_id,
                         (['de','en','es','fr','zh'])[CAST(lang_idx + 1 AS INT)] AS pred_lang
                  FROM (SELECT doc_id, lang_idx,
                               ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY votes DESC, lang_idx) AS rn
                        FROM v) x WHERE rn = 1),
         keepers AS (SELECT MIN(doc_id) AS keeper_id FROM docs GROUP BY md5(text)),
         q AS (SELECT doc_id, toks,
                      CAST(len(toks) AS BIGINT) AS n_toks,
                      CAST(FLOOR(CAST(len(list_distinct(toks)) AS DOUBLE) * 1000000
                        / len(toks)) AS BIGINT) AS ttr_micros,
                      lang
               FROM docs),
         qq AS (SELECT doc_id, toks, n_toks,
                       CASE WHEN n_toks >= 40 AND ttr_micros >= 350000 THEN 'high'
                            WHEN n_toks >= 20 THEN 'medium' ELSE 'low' END AS quality
                FROM q WHERE lang = 'en'),
         f AS (SELECT qq.doc_id, quality, n_toks,
                      list_transform(toks, t0 -> ${h64Sql("t0")}) AS hs
               FROM qq
               JOIN pred ON pred.doc_id = qq.doc_id AND pred.pred_lang = 'en'
               JOIN keepers ON keepers.keeper_id = qq.doc_id
               WHERE quality <> 'low')
         SELECT doc_id, quality, n_toks,
                list_min([list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hs, i - 7, i)),
                   (a, h) -> (a * 257 + h) % 1000000007)
                  for i in range(8, len(hs) + 1)]) AS fingerprint
         FROM f ORDER BY doc_id""",

    // ----- multimodal binary plumbing -----
    "q_multimodal_binary" ->
      """WITH x AS (SELECT doc_id, md5(text) AS payload_md5,
                  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                  lower(hex(encode(text))) AS hx
               FROM documents)
         SELECT doc_id, n_bytes, payload_md5,
                substring(hx, 1, 16) AS head_hex,
                substring(hx, 2 * (0 * (n_bytes // 4)) + 1, 2) ||
                substring(hx, 2 * (1 * (n_bytes // 4)) + 1, 2) ||
                substring(hx, 2 * (2 * (n_bytes // 4)) + 1, 2) ||
                substring(hx, 2 * (3 * (n_bytes // 4)) + 1, 2) AS stride_hex
         FROM x ORDER BY doc_id""",

    // ----- stream-stream interval join (batch-equivalent form) -----
    "q_stream_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS cts
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS pts
                    FROM events WHERE event_type = 'purchase')
         SELECT p.user_id, purchase_id, COUNT(*) AS n_clicks_1h,
                MIN(click_id) AS first_click_id
         FROM p JOIN c ON c.user_id = p.user_id
                      AND cts <= pts AND cts >= pts - INTERVAL 1 HOUR
         GROUP BY p.user_id, purchase_id
         ORDER BY p.user_id, purchase_id""",

    // ----- null-safe join + ordered string agg -----
    "q_join_nullsafe" ->
      """WITH f AS (SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS prio
                    FROM orders),
              d AS (SELECT prio, COALESCE(prio, '(urgent-as-null)') AS prio_tag
                    FROM (SELECT DISTINCT prio FROM f))
         SELECT prio_tag, COUNT(*) AS n, MIN(o_orderkey) AS first_key
         FROM f JOIN d ON f.prio IS NOT DISTINCT FROM d.prio
         GROUP BY prio_tag ORDER BY prio_tag""",
    // C13 salted join: the salting is semantically invisible, so the
    // oracle is the PLAIN cohort join (ops/Relational.scala saltedJoin)
    "q_join_salted" ->
      """WITH f AS (SELECT event_id, event_type,
                           CASE WHEN user_id % 7 = 0 THEN 0 ELSE user_id END AS uk
                    FROM events),
              d AS (SELECT uk, COUNT(*) AS n_cohort FROM f GROUP BY 1)
         SELECT f.event_type, COUNT(*) AS n,
                CAST(SUM(d.n_cohort) AS BIGINT) AS cohort_weight
         FROM f JOIN d USING (uk)
         GROUP BY 1 ORDER BY event_type""",
    "q_agg_listagg" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS regionkey,
                string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation GROUP BY 1 ORDER BY regionkey""",

    // ----- correlated EXISTS + unpivot -----
    "q_exists_correlated" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT'
                         AND o.o_totalprice > c.c_acctbal)
         ORDER BY c_custkey""",
    "q_unpivot" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, measure, val
         FROM (SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
                 FROM lineitem WHERE l_orderkey <= 100
               UNION ALL
               SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
                 FROM lineitem WHERE l_orderkey <= 100
               UNION ALL
               SELECT l_orderkey, l_linenumber, 'discount', l_discount
                 FROM lineitem WHERE l_orderkey <= 100)
         ORDER BY l_orderkey, l_linenumber, measure""",

    // ----- catalog-name SQL surface (≙ Athena over the Glue db) -----
    "q_catalog_sql" ->
      """SELECT n_name AS nation, r_name AS region, COUNT(*) AS n_cust,
                CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name, r_name
         ORDER BY nation, region""",
    "q_catalog_pruned" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM documents WHERE lang IN ('en', 'fr')
         GROUP BY lang ORDER BY lang""",
    "q_catalog_external" ->
      """SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events
         GROUP BY event_type, day
         ORDER BY event_type, day""",
    "q_split_train" ->
      s"""WITH b AS (SELECT doc_id, lang, n_chars,
                  ${h64Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 1000 AS b
                  FROM documents)
         SELECT CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'valid'
                     ELSE 'test' END AS split,
                lang, COUNT(*) AS n_docs, MIN(doc_id) AS first_id,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM b GROUP BY 1, 2 ORDER BY split, lang""",
    // integer-ppm split drift + total variation row (ops/TextAnalysis
    // L38) — `//` matches Spark's `div` on non-negative int64
    "q_split_drift" ->
      s"""WITH t AS (SELECT ${h64Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 1000 < 800
                       AS is_tr, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
         c AS (SELECT tok,
                      CAST(SUM(CASE WHEN is_tr THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
                      CAST(SUM(CASE WHEN is_tr THEN 0 ELSE 1 END) AS BIGINT) AS n_ho
               FROM t GROUP BY 1),
         tot AS (SELECT SUM(n_tr) AS t_tr, SUM(n_ho) AS t_ho FROM c),
         ppm AS (SELECT tok, n_tr, n_ho,
                        CAST((n_tr * 1000000) // t_tr AS BIGINT) AS p_ppm,
                        CAST((n_ho * 1000000) // t_ho AS BIGINT) AS q_ppm,
                        CAST(ABS((n_tr * 1000000) // t_tr
                                 - (n_ho * 1000000) // t_ho) AS BIGINT) AS drift_ppm
                 FROM c, tot),
         top AS (SELECT * FROM ppm ORDER BY drift_ppm DESC, tok LIMIT 20),
         tv AS (SELECT '__tv_total__' AS tok, CAST(t_tr AS BIGINT) AS n_tr,
                       CAST(t_ho AS BIGINT) AS n_ho, CAST(0 AS BIGINT) AS p_ppm,
                       CAST(0 AS BIGINT) AS q_ppm,
                       CAST((SELECT SUM(drift_ppm) FROM ppm) // 2 AS BIGINT) AS drift_ppm
                FROM tot)
         SELECT * FROM (SELECT * FROM top UNION ALL SELECT * FROM tv)
         ORDER BY drift_ppm DESC, tok""",
    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
                  ${h64Sql("'pack:' || CAST(doc_id AS VARCHAR)")} % 8 AS shard
                  FROM documents),
         o AS (SELECT doc_id, shard, CAST(n_toks AS BIGINT) AS n_toks,
                      COALESCE(CAST(SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                        0) AS off_global
               FROM t)
         SELECT doc_id, shard, off_global // 64 AS pack_id,
                off_global % 64 AS off_in_pack, n_toks,
                CASE WHEN off_global % 64 + n_toks > 64 THEN 'yes' ELSE 'no' END AS split
         FROM o ORDER BY doc_id""",
    "q_text_pii" ->
      """WITH r AS (SELECT doc_id,
                text || ' contact u' || CAST(doc_id AS VARCHAR) || '@mail-' ||
                source || '.com call 555-' ||
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' ||
                CAST(doc_id % 250 + 1 AS VARCHAR) AS raw
              FROM documents)
         SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(raw,
                  '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                  '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted,
                CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(raw, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
                CAST(len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips
         FROM r ORDER BY doc_id""",
    "q_url_domains" -> urlDomainsSql,
    // L40 naive-Bayes quality classifier: same split, same heuristic
    // labels, same smoothed integer log-odds (ops/TextAnalysis.scala)
    "q_quality_classify" ->
      s"""WITH d0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks,
                      (len(toks) >= 40 AND
                       floor(CAST(len(list_distinct(toks)) AS DOUBLE) * 1000000 / len(toks)) >= 350000) AS label_pos,
                      (${h64Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 1000) < 800 AS is_tr
               FROM d0),
         tok AS (SELECT doc_id, label_pos, is_tr, unnest(toks) AS tok FROM d),
         cnt AS (SELECT tok,
                        CAST(SUM(CASE WHEN label_pos THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
                        CAST(SUM(CASE WHEN label_pos THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
                 FROM tok WHERE is_tr GROUP BY 1),
         tot AS (SELECT CAST(SUM(c_pos) AS BIGINT) AS t_pos,
                        CAST(SUM(c_neg) AS BIGINT) AS t_neg,
                        CAST(COUNT(*) AS BIGINT) AS vocab
                 FROM cnt),
         wts AS (SELECT tok,
                        CAST(FLOOR(ln(CAST((c_pos + 1) * (t_neg + vocab) AS DOUBLE)
                                      / ((c_neg + 1) * (t_pos + vocab))) * 1000000 + 0.000001) AS BIGINT) AS w
                 FROM cnt CROSS JOIN tot),
         sc AS (SELECT t.doc_id, t.label_pos, COUNT(*) AS n_toks,
                       CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) AS score_micros
                FROM tok t LEFT JOIN wts w USING (tok)
                GROUP BY 1, 2)
         SELECT doc_id, n_toks, score_micros,
                CASE WHEN score_micros > 0 THEN 'pos' ELSE 'neg' END AS pred,
                CASE WHEN label_pos THEN 'pos' ELSE 'neg' END AS label,
                CAST(CASE WHEN (score_micros > 0) = label_pos THEN 1 ELSE 0 END AS BIGINT) AS correct
         FROM sc ORDER BY doc_id""",
    "q_text_perplexity" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
         tf AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
         tot AS (SELECT SUM(c) AS total FROM tf),
         x AS (SELECT t.doc_id,
                      CAST(FLOOR(ln(CAST(total AS DOUBLE) / c) * 1000000 + 0.000001) AS BIGINT) AS nm
               FROM tok t JOIN tf USING (tok) CROSS JOIN tot),
         d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
                      SUM(nm) // COUNT(*) AS avg_nll
               FROM x GROUP BY doc_id)
         SELECT doc_id, n_toks, CAST(avg_nll AS BIGINT) AS avg_nll_micros,
                CASE WHEN avg_nll > 3450000 THEN 'drop' ELSE 'keep' END AS verdict
         FROM d ORDER BY doc_id""",
    "q_dedup_lines" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         c AS (SELECT doc_id,
                      unnest([{'idx': CAST((i - 1) // 3 AS INT),
                               'line': array_to_string(tk[i:i+2], ' ')}
                              for i in range(1, len(tk) + 1, 3)]) AS u
               FROM t),
         l AS (SELECT doc_id, u.idx AS idx, u.line AS line FROM c),
         r AS (SELECT *, row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
               FROM l)
         SELECT doc_id, COUNT(*) AS n_lines,
                CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, ' ' ORDER BY idx), '') AS kept_text
         FROM r GROUP BY doc_id ORDER BY doc_id""",
    "q_sql_pipe" ->
      """SELECT l_returnflag, COUNT(*) AS n,
                CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
         FROM lineitem WHERE l_quantity > 30
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_join_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.cents
         FROM customer c,
         LATERAL (SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
                  FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY cents DESC, o_orderkey LIMIT 1) t
         ORDER BY c_custkey""",
    "q_xml_funcs" ->
      """SELECT p_partkey, p_name AS name, CAST(p_size AS BIGINT) AS size,
                p_name AS xp_name
         FROM part ORDER BY p_partkey""",
    "q_variant_funcs" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
                json_extract_string(props, '$.k') AS k_str,
                CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing
         FROM events ORDER BY event_id""",
    "q_recursive_cte" ->
      """WITH RECURSIVE up AS (
           SELECT c_custkey AS node, c_custkey AS cur, CAST(0 AS BIGINT) AS depth
           FROM customer
           UNION ALL
           SELECT node, cur // 10, depth + 1 FROM up WHERE cur > 0
         )
         SELECT node, MAX(depth) AS root_depth,
                CAST(COUNT(*) AS BIGINT) AS chain_len
         FROM up GROUP BY node ORDER BY node""",
    "q_agg_bitmap" ->
      """SELECT l_returnflag,
                CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // D14b: the incremental bitmap merge must equal the full recompute —
    // plain COUNT(DISTINCT) over all events IS the losslessness proof
    "q_agg_bitmap_incr" ->
      """SELECT event_type,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_quality_report" -> qualityReportSql,
    // L48 incremental twin: the fold is lossless under ANY slicing (the
    // additive counters sum; the distinct-PK term ORs exact bitmaps),
    // so the batch recompute IS its oracle
    "q_quality_incr" -> qualityReportSql,
    // L48 retraction: additive counters subtract via negated marker
    // lines, the distinct-PK term clears via the tombstone bitmap
    // and-not — the result must equal the batch recompute with the
    // takedown set (event_id % 7 == 3) excluded
    "q_quality_del" ->
      qualityReportSqlOn("(SELECT * FROM events WHERE event_id % 7 <> 3) events"),
    "q_agg_outliers" ->
      """WITH e AS (SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS x
                 FROM events),
         st AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
                       CAST(SUM(x) AS HUGEINT) AS sum_c,
                       CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ssq
                FROM e GROUP BY event_type),
         j AS (SELECT e.event_type, x, (CAST(x AS HUGEINT) * n - sum_c) AS dev,
                      n, sum_c, ssq
               FROM e JOIN st USING (event_type)),
         o AS (SELECT event_type, x,
                      CASE WHEN 4 * dev * dev > 9 * (n * ssq - sum_c * sum_c)
                           THEN 1 ELSE 0 END AS is_out
               FROM j)
         SELECT event_type, COUNT(*) AS n_events,
                CAST(SUM(is_out) AS BIGINT) AS n_outliers,
                MAX(CASE WHEN is_out = 1 THEN x END) AS max_outlier_cents
         FROM o GROUP BY event_type ORDER BY event_type""",
    "q_fuzzy_match" ->
      """WITH n AS (SELECT DISTINCT lower(p_name) AS nm FROM part)
         SELECT a.nm AS n1, b.nm AS n2,
                CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
         FROM n a JOIN n b
           ON a.nm < b.nm AND abs(length(a.nm) - length(b.nm)) <= 2
         WHERE levenshtein(a.nm, b.nm) <= 2
         ORDER BY n1, n2""",
    "q_pipeline_curate2" ->
      s"""WITH docs AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
         tok AS (SELECT doc_id, unnest(tk) AS tok FROM docs),
         tf AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
         tot AS (SELECT SUM(c) AS total FROM tf),
         nm AS (SELECT t.doc_id,
                       CAST(FLOOR(ln(CAST(total AS DOUBLE) / c) * 1000000 + 0.000001) AS BIGINT) AS v
                FROM tok t JOIN tf USING (tok) CROSS JOIN tot),
         pass1 AS (SELECT doc_id FROM nm GROUP BY doc_id
                   HAVING SUM(v) // COUNT(*) <= 3450000),
         y AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS nt,
                      ['2:' || tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))] AS g2,
                      ['3:' || tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk) - 1)] AS g3
               FROM docs WHERE len(tk) >= 3),
         e AS (SELECT doc_id, nt, unnest(list_concat(g2, g3)) AS g FROM y),
         gc AS (SELECT doc_id, nt, g, COUNT(*) AS c FROM e GROUP BY 1, 2, 3),
         m AS (SELECT doc_id, nt,
                      MAX(CASE WHEN g LIKE '2:%' THEN c END) AS c2,
                      MAX(CASE WHEN g LIKE '3:%' THEN c END) AS c3
               FROM gc GROUP BY 1, 2),
         pass2 AS (SELECT doc_id FROM m
                   WHERE CAST(floor(CAST(c2 AS DOUBLE) * 1000000 / (nt - 1)) AS BIGINT) <= 200000
                     AND CAST(floor(CAST(c3 AS DOUBLE) * 1000000 / (nt - 2)) AS BIGINT) <= 180000),
         kept AS (SELECT * FROM docs
                  WHERE doc_id IN (SELECT doc_id FROM pass1)
                    AND doc_id IN (SELECT doc_id FROM pass2)),
         ch AS (SELECT doc_id, lang,
                       unnest([{'idx': CAST((i - 1) // 3 AS INT),
                                'line': array_to_string(tk[i:i+2], ' ')}
                               for i in range(1, len(tk) + 1, 3)]) AS u
                FROM kept),
         l AS (SELECT doc_id, lang, u.idx AS idx, u.line AS line FROM ch),
         r AS (SELECT *, row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
               FROM l),
         sp AS (SELECT *, CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'valid'
                                ELSE 'test' END AS split
                FROM (SELECT *, ${h64Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 1000 AS h
                      FROM r))
         SELECT split, lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                COUNT(*) AS n_lines,
                CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(SUM(CASE WHEN rn = 1 THEN length(line) ELSE 0 END) AS BIGINT) AS kept_chars
         FROM sp GROUP BY split, lang ORDER BY split, lang""",
    // Full recompute over ALL documents at once — the incremental
    // operator must match this exactly, which is the proof its
    // day-over-day min/sum partial merges are lossless.
    "q_pipeline_curate_incr" -> curateIncrSqlOn("documents"),
    // L43 retraction (retractable member-level backend): fold +
    // tombstone delete of the takedown set (doc_id % 7 == 3) must land
    // exactly on the reduced-corpus batch recompute
    "q_curate_del" ->
      curateIncrSqlOn("(SELECT * FROM documents WHERE doc_id % 7 <> 3) documents"),
    "q_layout_zorder" ->
      """WITH k0 AS (SELECT CAST(l_partkey AS BIGINT) AS x,
                  CAST(l_suppkey AS BIGINT) AS y FROM lineitem),
         b AS (SELECT MIN(x) AS xmn, MAX(x) AS xmx, MIN(y) AS ymn, MAX(y) AS ymx FROM k0),
         k AS (SELECT x AS xr, y AS yr,
                      (x - xmn) * 65535 // greatest(xmx - xmn, 1) AS x,
                      (y - ymn) * 65535 // greatest(ymx - ymn, 1) AS y
               FROM k0 CROSS JOIN b),
         a1 AS (SELECT xr, yr, ((x | (x << 8)) & 16711935) AS xa,
                      ((y | (y << 8)) & 16711935) AS ya FROM k),
         a2 AS (SELECT xr, yr, ((xa | (xa << 4)) & 252645135) AS xb,
                      ((ya | (ya << 4)) & 252645135) AS yb FROM a1),
         a3 AS (SELECT xr, yr, ((xb | (xb << 2)) & 858993459) AS xc,
                      ((yb | (yb << 2)) & 858993459) AS yc FROM a2),
         a4 AS (SELECT xr, yr, ((xc | (xc << 1)) & 1431655765) AS xd,
                      ((yc | (yc << 1)) & 1431655765) AS yd FROM a3),
         z AS (SELECT xr, yr, (xd | (yd << 1)) >> 24 AS bucket FROM a4)
         SELECT bucket, COUNT(*) AS n, MIN(xr) AS x_min, MAX(xr) AS x_max,
                MIN(yr) AS y_min, MAX(yr) AS y_max
         FROM z GROUP BY bucket ORDER BY bucket"""
  )
}
