package graft.ops

import graft.{Q, Tables, U}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — what the engine is FOR
  * at 100 TB: one declarative plan chaining language confidence →
  * quality floor → exact dedup → content fingerprinting, so Catalyst
  * sees the whole flow (filters push past each other, the dedup shuffle
  * carries md5 keys only, everything else is map-side).
  */
object Curate {

  val qs: Map[String, Q] = Map(
    "q_pipeline_curate" -> ((s, d) => {
      import s.implicits._
      graft.functions.H64.register(s)
      val docs = Tables.documents(s, d).withColumn("toks", split($"text", " "))
      // language confidence: labeled 'en' AND the token-vote classifier
      // agrees (ops.TextAnalysis logic)
      val wVote = Window.partitionBy($"doc_id").orderBy($"votes".desc, $"lang_idx")
      val pred = docs
        .select($"doc_id", explode($"toks").as("t"))
        .withColumn("lang_idx", U.h64($"t") % 5)
        .groupBy($"doc_id", $"lang_idx").agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(wVote))
        .filter($"rn" === 1)
        .select($"doc_id",
          element_at(lit(TextAnalysis.langs.toArray), ($"lang_idx" + 1).cast("int")).as("pred_lang"))
      // exact-dedup keepers (min doc_id per identical text)
      val keepers = docs.groupBy(md5($"text").as("k"))
        .agg(min($"doc_id").as("keeper_id"))
        .select($"keeper_id")
      docs
        .withColumn("n_toks", size($"toks").cast("long"))
        .withColumn("n_distinct", size(array_distinct($"toks")).cast("long"))
        .withColumn("ttr_micros", floor($"n_distinct".cast("double") * 1000000 / $"n_toks"))
        .withColumn("quality",
          when($"n_toks" >= 40 && $"ttr_micros" >= 350000, "high")
            .when($"n_toks" >= 20, "medium").otherwise("low"))
        .filter($"lang" === "en" && $"quality" =!= "low")
        .join(pred, "doc_id")
        .filter($"pred_lang" === "en")
        .join(keepers, $"doc_id" === $"keeper_id", "left_semi")
        .withColumn("hs", expr("transform(toks, t -> h64(t))"))
        .withColumn("fingerprint", array_min(expr(
          """transform(sequence(8, size(hs)),
               i -> aggregate(slice(hs, i-7, 8), 0L, (a, h) -> (a * 257 + h) % 1000000007))""")))
        .select($"doc_id", $"quality", $"n_toks", $"fingerprint")
        .orderBy("doc_id")
    }),
    // Curation pipeline v2 — the round-5 operators composed into the
    // full pre-training prep flow: unigram-LM perplexity gate +
    // Gopher-repetition gate → C4 line-level dedup over the SURVIVORS →
    // deterministic train/valid/test split → per-(split, lang) corpus
    // accounting. Still one declarative plan: the two gates are
    // corpus-sized aggregates joined back semi-style, the line window is
    // the only corpus-wide shuffle, and the split is a map-side hash.
    "q_pipeline_curate2" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).withColumn("toks", split($"text", " "))
      // gate 1: unigram-LM mean NLL (micro-int, exact) under threshold
      val tok = docs.select($"doc_id", explode($"toks").as("tok"))
      val tf = tok.groupBy($"tok").agg(count(lit(1)).as("c"))
      val tot = tf.agg(sum($"c").as("total"))
      val passNll = tok.join(tf, "tok").crossJoin(broadcast(tot))
        .withColumn("nm", floor(log($"total".cast("double") / $"c") * 1000000 + 0.000001))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_toks"), sum($"nm").as("sum_nll"))
        .filter(expr("sum_nll div n_toks") <= 3450000)
        .select($"doc_id")
      // gate 2: Gopher top-gram repetition under thresholds (needs >= 3 toks)
      val passRep = docs.filter(size($"toks") >= 3)
        .select($"doc_id", size($"toks").cast("long").as("nt"), explode(concat(
          expr("transform(sequence(2, size(toks)), i -> concat('2:', element_at(toks, i-1), ' ', element_at(toks, i)))"),
          expr("transform(sequence(3, size(toks)), i -> concat('3:', element_at(toks, i-2), ' ', element_at(toks, i-1), ' ', element_at(toks, i)))")
        )).as("g"))
        .groupBy($"doc_id", $"nt", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id", $"nt").agg(
          max(when($"g".startsWith("2:"), $"c")).as("c2"),
          max(when($"g".startsWith("3:"), $"c")).as("c3"))
        .filter(floor($"c2".cast("double") * 1000000 / ($"nt" - 1)) <= 200000 &&
          floor($"c3".cast("double") * 1000000 / ($"nt" - 2)) <= 180000)
        .select($"doc_id")
      val kept = docs
        .join(passNll, Seq("doc_id"), "left_semi")
        .join(passRep, Seq("doc_id"), "left_semi")
      // C4 line dedup across the surviving corpus (partial-aggregable
      // min-struct keeper, whale-line-safe — see q_dedup_lines), then
      // split + account
      val lines = kept.select($"doc_id", $"lang", posexplode(expr(
        "transform(sequence(1, size(toks), 3), i -> concat_ws(' ', slice(toks, i, 3)))"))
        .as(Seq("idx", "line")))
      val keeper = lines.groupBy($"line")
        .agg(min(struct($"doc_id", $"idx")).as("k"))
      lines.join(keeper, "line")
        .withColumn("first", $"doc_id" === $"k.doc_id" && $"idx" === $"k.idx")
        .withColumn("b", U.h64(concat(lit("split:"), $"doc_id")) % 1000)
        .withColumn("split",
          when($"b" < 800, "train").when($"b" < 900, "valid").otherwise("test"))
        .groupBy($"split", $"lang")
        .agg(countDistinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_lines"),
          sum(when($"first", 1L).otherwise(0L)).as("n_kept"),
          sum(when($"first", length($"line")).otherwise(0)).cast("long").as("kept_chars"))
        .orderBy("split", "lang")
    })
  )
}
