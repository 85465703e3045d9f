package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis extensions for the training-data pipeline — language
  * identification, quality scoring, tokenizer-style piece counting, and
  * document fingerprinting (SURVEY.md §0 L3; the Comprehend text-analysis
  * grant main.tf:100-104 is the reference anchor).
  *
  * All per-document map-side work (explode → group or pure array
  * lambdas) — embarrassingly parallel, no cross-doc shuffle except the
  * final ORDER BY, so each op is flat O(corpus) at 100 TB.
  */
object TextAnalysis {

  /** Integer-ppm distribution drift between the train and holdout arms
    * of a split. `toks` has one row per token occurrence with columns
    * (is_tr: Boolean, tok: String). Returns the top-20 tokens by
    * |p−q| drift plus a '__tv_total__' row carrying the total
    * variation distance Σ|p−q| div 2 — the scalar drift gate. All
    * arithmetic is exact int64 (count·1e6 div total), so the gate is
    * bit-reproducible across runs, partitionings, and engines. See the
    * L38 scaladoc on q_split_drift. */
  def splitDrift(toks: DataFrame): DataFrame = {
    val ss = toks.sparkSession
    import ss.implicits._
    // pin the vocab-sized counts: the totals row, the ppm projection,
    // the top-20 sort, and the TV aggregate all read them — without the
    // pin each consumer re-runs the corpus explode underneath (the
    // corpus must be touched exactly once; the pin itself is
    // Heaps-bounded, so caching is trivial at any scale)
    val counts = toks.groupBy($"tok").agg(
      sum(when($"is_tr", 1L).otherwise(0L)).as("n_tr"),
      sum(when(!$"is_tr", 1L).otherwise(0L)).as("n_ho"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = counts.agg(sum($"n_tr").as("t_tr"), sum($"n_ho").as("t_ho"))
    val ppm = counts.crossJoin(broadcast(tot))
      .select($"tok", $"n_tr", $"n_ho",
        expr("(n_tr * 1000000) div t_tr").as("p_ppm"),
        expr("(n_ho * 1000000) div t_ho").as("q_ppm"))
      .withColumn("drift_ppm", abs($"p_ppm" - $"q_ppm"))
    val top = ppm.orderBy($"drift_ppm".desc, $"tok").limit(20)
    val tv = ppm.agg(sum($"drift_ppm").as("s"))
      .crossJoin(broadcast(tot))
      .select(lit("__tv_total__").as("tok"), $"t_tr".as("n_tr"),
        $"t_ho".as("n_ho"), lit(0L).as("p_ppm"), lit(0L).as("q_ppm"),
        expr("s div 2").as("drift_ppm"))
    top.unionAll(tv).orderBy($"drift_ppm".desc, $"tok")
  }

  /** Candidate languages, alphabetical; a token "votes" for language
    * h64(token) % 5 — a deterministic stand-in for a real char-n-gram
    * profile table (which would be a broadcast dim joined the same way). */
  val langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** The corpus word dictionary that seeds BPE: one Heaps-law-bounded
    * (word, freq, sentinel-repr) aggregate — the ONLY corpus-sized pass
    * in tokenizer training (see q_text_bpe_train). */
  private[graft] def bpeDict0(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .withColumn("repr", concat(lit("|"),
        expr("array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), '|')"),
        lit("|")))
  }

  /** `rounds` BPE learning rounds over the word dict: count adjacent
    * symbol pairs (freq-weighted) → argmax (total tie-break) → merge the
    * winning pair everywhere (sentinel replace, 4-fold to fixpoint ⇒
    * greedy-leftmost). Returns (dict after all merges, per-round winner
    * rows) so training (L36) and encoding (L39) share one recurrence. */
  private[graft] def bpeTrain(dict0: DataFrame, rounds: Int): (DataFrame, Seq[DataFrame]) = {
    import dict0.sparkSession.implicits._
    def bestOf(dict: DataFrame) =
      dict.select($"freq", expr("""filter(split(repr, '\\|'), x -> x != '')""").as("syms"))
        .filter(size($"syms") >= 2)
        .select($"freq", explode(expr(
          """transform(sequence(1, size(syms) - 1),
               i -> named_struct('a', element_at(syms, i), 'b', element_at(syms, i + 1)))""")).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b")).agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b").limit(1)
    def applyMerge(dict: DataFrame, best: DataFrame) =
      dict.crossJoin(broadcast(best.select(
          concat(lit("|"), $"a", lit("|"), $"b", lit("|")).as("pat"),
          concat(lit("|"), $"a", $"b", lit("|")).as("rep"))))
        .withColumn("repr",
          expr("replace(replace(replace(replace(repr, pat, rep), pat, rep), pat, rep), pat, rep)"))
        .select($"w", $"freq", $"repr")
    // pin each round's dict: every round reads its predecessor TWICE
    // (pair argmax + merge application), and without the pin that
    // re-execution compounds through the rounds all the way down to the
    // corpus-sized dict0 explode — the one pass that must run exactly
    // once at 100 TB. The pins are vocab-sized (Heaps-bounded), so the
    // cache cost is trivial; the harness clears cache between queries.
    val pin = (df: DataFrame) =>
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dict = pin(dict0)
    val merges = (1 to rounds).map { r =>
      val best = bestOf(dict)
      dict = pin(applyMerge(dict, best))
      best.select(lit(r.toLong).as("merge_rank"),
        $"a".as("pair_a"), $"b".as("pair_b"), $"cnt")
    }
    (dict, merges)
  }

  /** The L42 A-ES sampling key, shared by the batch query and the
    * streaming sampler (streaming/WeightedSample.scala) so both draw the
    * SAME deterministic sample: u = (h64("wsamp:"+id)+1)/2^60 ∈ (0, 1],
    * key = ln(u)/w floored to int64 micros. A pure function of
    * (doc_id, w), which is what makes the streaming merge trivially
    * correct — union of per-batch keys then top-K ≡ batch top-K. */
  def aesKeyMicros(docId: org.apache.spark.sql.Column,
                   w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(log((U.h64(concat(lit("wsamp:"), docId)).cast("double") + 1.0d) /
      lit(1152921504606846976.0d)) / w * 1000000 + 0.000001).cast("long")

  val qs: Map[String, Q] = Map(
    // Language-ID: argmax of per-language token votes (ties → first lang
    // alphabetically). Shape matches a real n-gram-profile classifier:
    // explode → score per (doc, lang) → top-1 per doc.
    "q_text_langid" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"doc_id").orderBy($"votes".desc, $"lang_idx")
      Tables.documents(s, d)
        .select($"doc_id", $"lang".as("labeled"), explode(split($"text", " ")).as("t"))
        .withColumn("lang_idx", U.h64($"t") % 5)
        .groupBy($"doc_id", $"labeled", $"lang_idx")
        .agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id",
          element_at(lit(langs.toArray), ($"lang_idx" + 1).cast("int")).as("pred_lang"),
          $"votes",
          ($"labeled" === element_at(lit(langs.toArray), ($"lang_idx" + 1).cast("int")))
            .cast("int").cast("long").as("is_match"))
        .orderBy("doc_id")
    }),
    // Quality scoring: length/diversity/stopword signals → micro-scaled
    // ratios (exact int64/IEEE parity) → quality bucket.
    "q_text_quality" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        .withColumn("n_toks", size($"toks").cast("long"))
        .withColumn("n_distinct", size(array_distinct($"toks")).cast("long"))
        .withColumn("n_stop", size(expr("filter(toks, t -> t = 'the' OR t = 'a')")).cast("long"))
        .withColumn("ttr_micros",
          floor($"n_distinct".cast("double") * 1000000 / $"n_toks"))
        .withColumn("stop_micros",
          floor($"n_stop".cast("double") * 1000000 / $"n_toks"))
        .withColumn("avg_len_micros",
          floor($"n_chars".cast("double") * 1000000 / $"n_toks"))
        .withColumn("quality",
          when($"n_toks" >= 40 && $"ttr_micros" >= 350000, "high")
            .when($"n_toks" >= 20, "medium")
            .otherwise("low"))
        .select($"doc_id", $"n_toks", $"n_distinct", $"ttr_micros",
          $"stop_micros", $"avg_len_micros", $"quality")
        .orderBy("doc_id")
    }),
    // Tokenizer-style piece counting: regex word split (the BPE
    // pre-tokenizer shape) + ceil(len/4) subword pieces per word — a
    // deterministic stand-in for a learned BPE vocab (which would be a
    // broadcast trie applied in the same per-row lambda).
    "q_text_bpe" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("words", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
        .select($"doc_id",
          size($"words").cast("long").as("n_words"),
          expr("aggregate(words, 0L, (acc, t) -> acc + (length(t) + 3) div 4)").as("n_pieces"))
        .orderBy("doc_id")
    }),
    // L36: BPE merge TRAINING — learn the tokenizer from the corpus, not
    // just apply one (complements q_text_bpe). Three rounds of the
    // classic recurrence: count adjacent symbol pairs weighted by word
    // frequency → argmax with a total tie-break → merge the winning pair
    // in every word. The 100 TB shape: the corpus contributes ONE
    // vocab-sized (word, freq) aggregate (Heaps-law-bounded — at scale
    // you materialize it once); every learning round then runs on that
    // dict, so merge training costs O(vocab), not O(corpus), per round.
    // The merge application is sentinel-delimited string replace
    // ('|a|b|' → '|ab|', 4-fold to fixpoint so consecutive occurrences
    // merge greedily-leftmost like real BPE) — byte-identical in the
    // oracle, no lambda-fold divergence risk.
    "q_text_bpe_train" -> ((s, d) => {
      val (_, merges) = bpeTrain(bpeDict0(Tables.documents(s, d)), 3)
      merges.reduce(_ union _).orderBy("merge_rank")
    }),
    // L39: BPE ENCODING — apply the learned merges to tokenize the
    // corpus (closing the loop train → encode → pack: L36 learns the
    // merges, this op turns documents into piece counts, L30 packs the
    // result into context windows). The merged dictionary maps each
    // word to its post-merge piece count; documents encode by joining
    // their word stream against that Heaps-bounded table (broadcast at
    // real scale — the same "vocab ≪ corpus" asymmetry every tokenizer
    // service exploits), then one partial-aggregable per-doc sum.
    // pieces-per-word ppm is the compression diagnostic (exact int64
    // div) a tokenizer team tracks when it retrains. Flat O(corpus):
    // the 3 learning rounds run on the vocab only, the corpus is
    // touched by exactly one explode + one map-side join + one agg.
    "q_text_bpe_encode" -> ((s, d) => {
      import s.implicits._
      val (dictF, _) = bpeTrain(bpeDict0(Tables.documents(s, d)), 3)
      val pieces = dictF.select($"w",
        size(expr("""filter(split(repr, '\\|'), x -> x != '')""")).cast("long").as("np"))
      Tables.documents(s, d)
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
        .join(broadcast(pieces), "w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_words"), sum($"np").as("n_pieces"))
        .select($"doc_id", $"n_words", $"n_pieces",
          expr("n_pieces * 1000000 div n_words").as("ppw_ppm"))
        .orderBy("doc_id")
    }),
    // L40: model-based quality classifier (the CCNet/fastText shape:
    // train a cheap token classifier to imitate an expensive quality
    // signal, then apply it corpus-wide — the model-based filtering
    // step in RefinedWeb/CCNet-style pipelines). Supervision comes from
    // the engine's own quality heuristic ('high' bucket of
    // q_text_quality = positive class); the model is multinomial naive
    // Bayes over tokens, fit on the TRAIN arm of the hash split only
    // (the 20% holdout sees weights it never influenced). Per-token
    // log-odds with Laplace smoothing are floored to int64 micros —
    // ln() evaluates once per distinct vocab entry on an exact
    // int64-ratio argument (both engines divide the same exact
    // products, so libm agreement is per-value; the +1e-6 before floor
    // absorbs a last-ulp flip at an exact boundary, as in
    // q_text_perplexity) — so document scores are exact int64 SUMS of
    // those micros: order-free, bit-identical across partitionings and
    // engines. Verdict = sign of the summed score. Scale shape: class
    // counts are ONE vocab-sized partial-aggregable pass, totals ride a
    // 1-row broadcast, and scoring is a map-side join of the token
    // stream against the Heaps-bounded weight table (broadcast at real
    // scale) — flat O(corpus), the reason fastText-style filters run
    // over 100 TB crawls at all.
    "q_quality_classify" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        .withColumn("n_toks", size($"toks").cast("long"))
        .withColumn("label_pos", $"n_toks" >= 40 &&
          floor(size(array_distinct($"toks")).cast("double") * 1000000 / $"n_toks") >= 350000)
        .withColumn("is_tr", U.h64(concat(lit("split:"), $"doc_id")) % 1000 < 800)
      val tok = docs.select($"doc_id", $"label_pos", $"is_tr", explode($"toks").as("tok"))
      // pin the vocab-sized class counts: both the totals row and the
      // weight table read them, and without the pin each reader re-runs
      // the corpus explode underneath — the fit pass must touch the
      // corpus exactly once at 100 TB (the scoring join is the second,
      // inherent pass)
      val counts = tok.filter($"is_tr")
        .groupBy($"tok")
        .agg(sum(when($"label_pos", 1L).otherwise(0L)).as("c_pos"),
          sum(when(!$"label_pos", 1L).otherwise(0L)).as("c_neg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = counts.agg(sum($"c_pos").as("t_pos"), sum($"c_neg").as("t_neg"),
        count(lit(1)).as("vocab"))
      val wts = counts.crossJoin(broadcast(tot))
        .select($"tok", floor(log(
          (($"c_pos" + 1) * ($"t_neg" + $"vocab")).cast("double") /
          (($"c_neg" + 1) * ($"t_pos" + $"vocab")).cast("double")) * 1000000 + 0.000001)
          .cast("long").as("w_micros"))
      tok.join(wts, Seq("tok"), "left")
        .groupBy($"doc_id", $"label_pos")
        .agg(count(lit(1)).as("n_toks"),
          sum(coalesce($"w_micros", lit(0L))).as("score_micros"))
        .select($"doc_id", $"n_toks", $"score_micros",
          when($"score_micros" > 0, "pos").otherwise("neg").as("pred"),
          when($"label_pos", "pos").otherwise("neg").as("label"),
          (($"score_micros" > 0) === $"label_pos").cast("int").cast("long").as("correct"))
        .orderBy("doc_id")
    }),
    // Deterministic stratified sampling: hash-bucket the stable key and
    // keep per-language rates (en 50%, others 10%) — the reproducible
    // downsampling a training-data pipeline needs (TABLESAMPLE is
    // engine/seed-dependent; h64 buckets are portable and rerun-stable).
    "q_sample_hash" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("bucket", U.h64(concat(lit("sample:"), $"doc_id")) % 100)
        .filter(when($"lang" === "en", $"bucket" < 50).otherwise($"bucket" < 10))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_sampled"),
          min($"doc_id").as("first_id"), max($"doc_id").as("last_id"))
        .orderBy("lang")
    }),
    // Benchmark decontamination (the training-data hygiene op): flag
    // train docs sharing any complete 5-token gram with the held-out
    // "benchmark" slice (doc_id % 10 = 7) — the n-gram-overlap decontam
    // check run before pretraining. Scale shape: grams carried as h64
    // hashes (8 B), eval side is a small broadcast, equi-join on the
    // gram hash — work ∝ matches, never corpus².
    "q_decontaminate" -> ((s, d) => {
      import s.implicits._
      val grams = Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        // guard: sequence(5, n) steps DOWNWARD when n < 5, so transform
        // would reach i=4 and slice() would throw on a short doc; a doc
        // with < 5 tokens has no 5-gram by definition (the DuckDB
        // oracle's range(5, len+1) is empty for the same doc)
        .filter(size($"toks") >= 5)
        .select($"doc_id", explode(expr(
          "array_distinct(transform(sequence(5, size(toks)), i -> concat_ws(' ', slice(toks, i-4, 5))))")).as("gram"))
        .select($"doc_id", U.h64($"gram").as("gh"))
      val evalG = grams.filter($"doc_id" % 10 === 7)
        .select($"gh", $"doc_id".as("eval_id")).distinct()
      grams.filter($"doc_id" % 10 =!= 7)
        .join(broadcast(evalG), "gh")
        .groupBy($"doc_id")
        .agg(countDistinct($"gh").as("n_shared"),
          countDistinct($"eval_id").as("n_eval_docs"))
        .orderBy("doc_id")
    }),
    // Text scrub / normalization: deny-list token removal with a removal
    // count — the PII/stopword-scrub shape of a curation pipeline (the
    // deny-list would be a broadcast dim at scale; inline here). Pure
    // map-side work, exact cross-engine string parity.
    "q_text_scrub" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        .withColumn("kept", expr("filter(toks, t -> t <> 'the' AND t <> 'a')"))
        .select($"doc_id",
          array_join($"kept", " ").as("scrubbed"),
          (size($"toks") - size($"kept")).cast("long").as("n_removed"))
        .orderBy("doc_id")
    }),
    // Document fingerprint: min rolling polynomial hash (base 257 mod
    // 1e9+7) over 8-token windows of token hashes — the winnowing-style
    // content signature (robust to boundary shifts, unlike full-text md5).
    // One native O(n) expression (functions.RollFp): per-token h64 +
    // O(1)-per-window rolling update, replacing the interpreted
    // transform∘aggregate∘slice chain (HOFs are CodegenFallback — that
    // chain re-folded 8 hashes per window outside codegen).
    "q_text_fingerprint" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        .select($"doc_id", graft.functions.RollFp.fp($"toks").as("fingerprint"),
          greatest(size($"toks") - 7, lit(0)).cast("long").as("n_windows"))
        .orderBy("doc_id")
    }),
    // Corpus TF-IDF: top-3 salient terms per document — the classic
    // keyword/relevance signal a curation pipeline computes corpus-wide.
    // Two-phase shape at 100 TB: tf is a per-doc map-side group; df is a
    // vocab-sized aggregate (vocab ≪ corpus — Heaps' law), joined back on
    // the token key (both sides already hash-partitioned by tok, one
    // shuffle); N arrives as a broadcast scalar, never a driver value.
    // Ranking uses the ROUNDED score (4 dp) so the window order is
    // identical cross-engine despite ln() being libm-dependent in the
    // last ulp.
    // Keyphrase extraction proper (≙ Comprehend BatchDetectKeyPhrases,
    // main.tf:102 — the RAKE shape): candidate phrases are maximal
    // stopword-delimited runs, chunked to <=3 consecutive tokens
    // (non-overlapping) and kept only when >=2 tokens long; candidates
    // rank by corpus TF-IDF and each doc reports its top 3. Distinct
    // from J3 bigrams (sliding pairs, corpus-global top) — this yields
    // multi-word phrases per document. Run assignment is a per-doc
    // cumulative stopword count (doc-bounded window), chunking a per-run
    // row_number — both partitions bounded by document length, so the
    // op stays flat O(corpus) at 100 TB; the ranking passes are the same
    // partial-aggregable tf/df shuffles as q_text_tfidf.
    "q_text_keyphrases" -> ((s, d) => {
      import s.implicits._
      val stop = Seq("a", "the", "is", "of", "and", "to", "in")
      val docs = Tables.documents(s, d)
      val toks = docs
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
        .withColumn("is_stop", $"tok".isInCollection(stop).cast("long"))
      val wRun = Window.partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(Window.unboundedPreceding, 0)
      val runs = toks
        .withColumn("run_id", sum($"is_stop").over(wRun))
        .filter($"is_stop" === 0)
      val wIn = Window.partitionBy($"doc_id", $"run_id").orderBy($"pos")
      val phrases = runs
        .withColumn("chunk", floor((row_number().over(wIn) - 1) / 3))
        .groupBy($"doc_id", $"run_id", $"chunk")
        .agg(
          array_join(expr(
            "transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
            " ").as("phrase"),
          count(lit(1)).as("plen"))
        .filter($"plen" >= 2)
      val tf = phrases.groupBy($"doc_id", $"phrase").agg(count(lit(1)).as("tf"))
      val pdf = tf.groupBy($"phrase").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val wTop = Window.partitionBy($"doc_id").orderBy($"score".desc, $"phrase")
      tf.join(pdf, "phrase")
        .crossJoin(broadcast(n))
        .withColumn("score",
          round($"tf" * log($"n_docs".cast("double") / $"df"), 4))
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .filter($"rk" <= 3)
        .select($"doc_id", $"rk", $"phrase", $"score")
        .orderBy("doc_id", "rk")
    }),
    "q_text_tfidf" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val tf = docs
        .select($"doc_id", explode(split($"text", " ")).as("tok"))
        .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"tok")
      tf.join(df, "tok")
        .crossJoin(broadcast(n))
        .withColumn("score",
          round($"tf" * log($"n_docs".cast("double") / $"df"), 4))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 3)
        .select($"doc_id", $"rk", $"tok", $"score")
        .orderBy("doc_id", "rk")
    }),
    // Repetition filter (the Gopher/MassiveText quality rule): fraction
    // of n-grams claimed by the single most-repeated 2-gram / 3-gram,
    // micro-scaled; docs over threshold (top-2-gram > 20%, top-3-gram >
    // 18%) are boilerplate/spam-shaped and dropped. Both arities ride ONE
    // explode pass (arity-prefixed gram keys) → count → max, all
    // partial-aggregable, so the shuffle carries one row per distinct
    // (doc, gram) and the op stays flat O(corpus) at 100 TB.
    "q_text_repetition" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        .filter(size($"toks") >= 3)
        .select($"doc_id", size($"toks").cast("long").as("n_toks"),
          explode(concat(
            expr("transform(sequence(2, size(toks)), i -> concat('2:', element_at(toks, i-1), ' ', element_at(toks, i)))"),
            expr("transform(sequence(3, size(toks)), i -> concat('3:', element_at(toks, i-2), ' ', element_at(toks, i-1), ' ', element_at(toks, i)))")
          )).as("g"))
        .groupBy($"doc_id", $"n_toks", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id", $"n_toks").agg(
          max(when($"g".startsWith("2:"), $"c")).as("c2"),
          max(when($"g".startsWith("3:"), $"c")).as("c3"))
        .select($"doc_id",
          floor($"c2".cast("double") * 1000000 / ($"n_toks" - 1)).as("top2_ppm"),
          floor($"c3".cast("double") * 1000000 / ($"n_toks" - 2)).as("top3_ppm"))
        .withColumn("verdict",
          when($"top2_ppm" > 200000 || $"top3_ppm" > 180000, "drop").otherwise("keep"))
        .orderBy("doc_id")
    }),
    // Deterministic train/valid/test split: hash-bucket the stable doc
    // key into 80/10/10 — the reproducible holdout assignment every
    // training pipeline needs (seed-free: same corpus ⇒ same split on
    // any cluster size, unlike randomSplit whose assignment depends on
    // partitioning). Pure map-side classify + one aggregation shuffle.
    "q_split_train" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("b", U.h64(concat(lit("split:"), $"doc_id")) % 1000)
        .withColumn("split",
          when($"b" < 800, "train").when($"b" < 900, "valid").otherwise("test"))
        .groupBy($"split", $"lang")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_id"),
          sum($"n_chars").as("total_chars"))
        .orderBy("split", "lang")
    }),
    // Split-drift monitor (L38): after the hash split, a training
    // pipeline must verify the holdout actually resembles train — a
    // skewed split silently corrupts every eval. Per-token unigram
    // distributions of train vs holdout are compared in integer ppm
    // (count·1e6 div total — exact `div`, never a float ratio), the
    // per-token drift is |p−q|, and total variation distance is
    // Σ|p−q| div 2 (the '__tv_total__' row) — the scalar drift gate.
    // Everything is int64 arithmetic over exact counts, so the gate is
    // bit-reproducible across runs, partitionings, and engines — a
    // flapping drift alarm is worse than none. Shape: one explode →
    // partial-aggregable conditional counts (one row per distinct
    // token, Heaps-bounded), totals ride a 1-row broadcast; flat
    // O(corpus) at 100 TB.
    "q_split_drift" -> ((s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .withColumn("b", U.h64(concat(lit("split:"), $"doc_id")) % 1000)
        .select(($"b" < 800).as("is_tr"), explode(split($"text", " ")).as("tok"))
      splitDrift(toks)
    }),
    // Sequence packing (context-window packing for training batches):
    // docs are laid end-to-end into fixed 64-token context windows, the
    // step between tokenized corpus and training shards. Offset-based
    // layout: docs shard by portable hash (the unit of parallelism —
    // each shard packs independently, so 100 TB packs as S independent
    // window problems), order within shard is deterministic (doc_id),
    // pack_id = cumulative-token offset div window; a doc straddling a
    // window boundary is marked split (a real loader would cut it
    // there). One doc-bounded window per shard + map-side arithmetic —
    // no cross-shard coordination anywhere.
    "q_pack_sequences" -> ((s, d) => {
      import s.implicits._
      val ctx = 64L
      val win = Window.partitionBy($"shard").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select($"doc_id", size(split($"text", " ")).cast("long").as("n_toks"))
        .withColumn("shard", U.h64(concat(lit("pack:"), $"doc_id")) % 8)
        .withColumn("off_global", coalesce(sum($"n_toks").over(win), lit(0L)))
        .select($"doc_id", $"shard",
          expr(s"off_global div $ctx").as("pack_id"),
          ($"off_global" % ctx).as("off_in_pack"),
          $"n_toks",
          when($"off_global" % ctx + $"n_toks" > ctx, "yes").otherwise("no").as("split"))
        .orderBy("doc_id")
    }),
    // PII redaction: email / phone / IPv4 detection counts + masked text
    // (the pre-training privacy scrub). The corpus is synthetic word
    // soup, so deterministic PII is spliced in from the doc's own key
    // columns first — identically in the oracle — then redacted by the
    // same three regexes. Pure map-side (regex per row, no shuffle but
    // the final ORDER BY), flat O(corpus) at 100 TB.
    "q_text_pii" -> ((s, d) => {
      import s.implicits._
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phone = "\\b\\d{3}-\\d{4}\\b"
      Tables.documents(s, d)
        .withColumn("raw", concat($"text",
          lit(" contact u"), $"doc_id".cast("string"),
          lit("@mail-"), $"source", lit(".com call 555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
          lit(" from 10."), ($"doc_id" % 200).cast("string"),
          lit(".0."), (($"doc_id" % 250) + 1).cast("string")))
        .select($"doc_id",
          regexp_replace(regexp_replace(regexp_replace($"raw",
            email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>").as("redacted"),
          size(regexp_extract_all($"raw", lit(email), lit(0))).cast("long").as("n_emails"),
          size(regexp_extract_all($"raw", lit(phone), lit(0))).cast("long").as("n_phones"),
          size(regexp_extract_all($"raw", lit(ip), lit(0))).cast("long").as("n_ips"))
        .orderBy("doc_id")
    }),
    // Per-domain corpus stats + blocklist verdict: extract the host from
    // each doc's (synthesized) source URL, aggregate doc/lang counts per
    // domain, and flag deny-listed domains — the domain-level filtering
    // step of a web-crawl pipeline (the deny-list is a broadcast dim at
    // real scale, inline here). One aggregation shuffle on domain.
    "q_url_domains" -> ((s, d) => {
      import s.implicits._
      val deny = Seq("src1.example.com", "src3.example.com")
        .toDF("domain").withColumn("blocked", lit(1L))
      Tables.documents(s, d)
        .withColumn("url", concat(lit("https://"), $"source",
          lit(".example.com/d/"), $"doc_id".cast("string")))
        .withColumn("domain", regexp_extract($"url", "https?://([^/]+)/", 1))
        .join(broadcast(deny), Seq("domain"), "left")
        .groupBy($"domain")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"lang").as("n_langs"),
          max(coalesce($"blocked", lit(0L))).as("blocked"))
        .orderBy("domain")
    }),
    // Unigram-LM perplexity filter (the CCNet quality-scoring shape): LM
    // = corpus unigram frequencies; per-doc score = mean negative log
    // likelihood, micro-scaled to int64 BEFORE aggregation so the sum is
    // exact and order-free (ln() is evaluated only on the ~vocab-many
    // distinct (c, total) integer pairs, so cross-engine libm agreement
    // is per-value, never per-sum; the +1e-6 before floor absorbs a
    // last-ulp libm disagreement at an exact bucket boundary, which
    // would otherwise flip a doc's keep/drop verdict between engines —
    // mirrored in the oracle). High-NLL docs (rare-token soup) are
    // dropped. Two-phase at 100 TB: tf is a vocab-sized aggregate
    // (Heaps' law), joined back on the token key; total arrives as a
    // broadcast scalar.
    "q_text_perplexity" -> ((s, d) => {
      import s.implicits._
      val tok = Tables.documents(s, d)
        .select($"doc_id", explode(split($"text", " ")).as("tok"))
      // pin the vocab-sized LM: the totals scalar and the scoring join
      // both read it — without the pin each re-runs the corpus explode
      // underneath (vocab-sized cache, Heaps-bounded at any scale; the
      // scoring join's own corpus pass is the second, inherent one)
      val tf = tok.groupBy($"tok").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = tf.agg(sum($"c").as("total"))
      tok.join(tf, "tok")
        .crossJoin(broadcast(tot))
        .withColumn("nm", floor(log($"total".cast("double") / $"c") * 1000000 + 0.000001))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_toks"), sum($"nm").as("sum_nll"))
        .select($"doc_id", $"n_toks",
          expr("sum_nll div n_toks").as("avg_nll_micros"),
          when(expr("sum_nll div n_toks") > 3450000, "drop")
            .otherwise("keep").as("verdict"))
        .orderBy("doc_id")
    }),
    // Domain-mixture resampling: the largest subsample whose language
    // mix EXACTLY matches target ppm weights (no upsampling) — the
    // mixture-rebalancing step before pretraining. T = max total s.t.
    // T·wᵢ ≤ nᵢ ∀i; per-stratum quota kᵢ = ⌊T·wᵢ/1e6⌋; membership = the
    // kᵢ docs with smallest portable hash — deterministic and
    // rerun-stable (same corpus ⇒ same sample). Scale note: the
    // rank-within-stratum window sorts each language partition — exact,
    // but a hot stratum is one sort at 100 TB; the streaming-scale
    // variant replaces rank ≤ kᵢ with hash < tᵢ where tᵢ is the kᵢ-th
    // smallest hash from an approx-quantile pass (same plan minus the
    // full sort, ± a few docs at the boundary).
    "q_sample_mixture" -> ((s, d) => {
      import s.implicits._
      val w = Seq(("de", 150000L), ("en", 400000L), ("es", 80000L),
        ("fr", 120000L), ("zh", 250000L)).toDF("lang", "w_ppm")
      val docs = Tables.documents(s, d).select($"doc_id", $"lang")
      val nObs = docs.groupBy($"lang").agg(count(lit(1)).as("n_obs"))
      val tMax = nObs.join(w, "lang")
        .agg(min(expr("n_obs * 1000000 div w_ppm")).as("t_max"))
      val quota = w.crossJoin(broadcast(tMax))
        .select($"lang", expr("t_max * w_ppm div 1000000").as("k_target"))
      val win = Window.partitionBy($"lang").orderBy($"hk", $"doc_id")
      docs
        .withColumn("hk", U.h64(concat(lit("mix:"), $"doc_id")))
        .withColumn("rk", row_number().over(win).cast("long"))
        .join(broadcast(quota), "lang")
        .filter($"rk" <= $"k_target")
        .select($"doc_id", $"lang")
        .orderBy("doc_id")
    }),
    // L42: deterministic weighted sampling WITHOUT replacement per
    // group (Efraimidis–Spirakis A-ES, Inf. Process. Lett. 2006) — the
    // quality-weighted subsample step of corpus curation ("keep the K
    // best-weighted docs per language, where heavier docs are
    // proportionally likelier", e.g. length- or quality-score-weighted
    // retention). Each doc draws u ∈ (0, 1] from the shared portable
    // h64 (so the "randomness" is identical in Spark, DuckDB and any
    // retry — no RNG state, no seed plumbing) and scores
    // key = ln(u)/w: taking the K LARGEST keys per group is exactly a
    // weight-proportional draw of K without replacement. The key is
    // floored to int64 micros (the q_text_perplexity ln-quantization
    // scheme) so ordering is bit-stable across engines and libm
    // implementations. Scale shape: one map-side key computation, one
    // rank per group optimized to WindowGroupLimit (partial per-
    // partition top-K BEFORE the group shuffle — pinned in PlanSuite),
    // so the shuffle carries ≤ K·partitions rows per group, never the
    // corpus. Weight here = token count (any positive int64 works).
    "q_sample_weighted" -> ((s, d) => {
      import s.implicits._
      val K = 5
      val win = Window.partitionBy($"lang").orderBy($"key_micros".desc, $"doc_id")
      Tables.documents(s, d)
        .select($"doc_id", $"lang", size(split($"text", " ")).cast("long").as("w"))
        .withColumn("key_micros", aesKeyMicros($"doc_id", $"w"))
        .withColumn("rk", row_number().over(win).cast("long"))
        .filter($"rk" <= K)
        .select($"lang", $"rk", $"doc_id", $"w", $"key_micros")
        .orderBy("lang", "rk")
    })
  )
}
