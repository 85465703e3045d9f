package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Binary-column (multimodal) relational surface — SURVEY.md §2.J8.
  * Payloads are opaque BinaryType all the way through the plan; only
  * cheap byte-level ops (length, hash, stride sampling) happen inside
  * the engine — codec work belongs to graft.multimodal.Media's batched
  * pipeline. */
object Multimodal {

  val qs: Map[String, Q] = Map(
    // Binary payload plumbing: byte length, content hash, head bytes and
    // an evenly-strided 4-point byte sample (keyframe shape), rendered
    // as hex strings for the cross-engine compare.
    "q_multimodal_binary" -> ((s, d) => {
      import s.implicits._
      val stride = (0 until 4)
        .map(k => expr(s"substring(hx, 2 * ($k * (n_bytes div 4)) + 1, 2)"))
        .reduce(concat(_, _))
      Tables.documents(s, d)
        .withColumn("payload", encode($"text", "utf-8"))
        .withColumn("n_bytes", expr("octet_length(payload)").cast("long"))
        .withColumn("hx", lower(hex($"payload")))
        .select($"doc_id", $"n_bytes",
          md5($"payload").as("payload_md5"),
          substring($"hx", 1, 16).as("head_hex"),
          stride.as("stride_hex"))
        .orderBy("doc_id")
    })
  )
}
