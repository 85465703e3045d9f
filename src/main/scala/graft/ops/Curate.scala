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
    })
  )
}
