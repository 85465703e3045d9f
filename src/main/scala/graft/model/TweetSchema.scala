package graft.model

import org.apache.spark.sql.types._

/** The pinned record schema of the reference's landed data — the fields it
  * projects server-side (`tweet.fields=created_at,context_annotations,
  * entities,public_metrics`, reference src/main.py:90) plus the
  * always-returned id/text, per the public Twitter API v2 object model.
  * The reference leaves this implicit (Glue infers it, main.tf:304-314);
  * we pin it for the production path (SURVEY.md §1.3).
  */
object TweetSchema {

  private def span(extra: StructField*): StructType =
    StructType(Seq(
      StructField("start", IntegerType),
      StructField("end", IntegerType)) ++ extra)

  private val idNameDesc = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("description", StringType)))

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("text", StringType),
    StructField("created_at", TimestampType),
    StructField("public_metrics", StructType(Seq(
      StructField("retweet_count", IntegerType),
      StructField("reply_count", IntegerType),
      StructField("like_count", IntegerType),
      StructField("quote_count", IntegerType)))),
    StructField("context_annotations", ArrayType(StructType(Seq(
      StructField("domain", idNameDesc),
      StructField("entity", idNameDesc))))),
    StructField("entities", StructType(Seq(
      StructField("hashtags", ArrayType(span(StructField("tag", StringType)))),
      StructField("mentions", ArrayType(span(StructField("username", StringType)))),
      StructField("annotations", ArrayType(span(
        StructField("probability", DoubleType),
        StructField("type", StringType),
        StructField("normalized_text", StringType)))),
      StructField("urls", ArrayType(span(
        StructField("url", StringType),
        StructField("expanded_url", StringType)))))))))
}
