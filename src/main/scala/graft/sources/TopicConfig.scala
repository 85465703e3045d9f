package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned configuration source — SURVEY.md §2.A4 / §1.3.
  *
  * The reference's only *declared* schemas are its YAML config files:
  * each is a 2-document stream where doc 0 carries `{version: N}` and
  * doc 1 the payload (reference src/main.py:49-61, src/nba.yaml:1-7,
  * src/platforms.yaml:1-5), and the code dispatches on the version,
  * failing fast on unknown ones (src/main.py:170,195-200,233,241 —
  * modulo the reference's raise-a-string bug, which we do NOT replicate,
  * SURVEY.md §5).
  *
  * Config is driver-side dimension data: parsed locally (the files are
  * bytes, not a distributed dataset), then exposed as a broadcast-sized
  * DataFrame for enrichment joins — the Spark-native role of the topic
  * template (src/main.py:171-186). The parser covers exactly the
  * reference's config subset (scalars, string lists, `---` document
  * separators) with no YAML library dependency.
  */
object TopicConfig {

  /** One topic template: {topic, type, aliases[]} (src/nba.yaml:4-7). */
  case class Topic(version: Double, topic: String, `type`: String, aliases: Seq[String])
  /** Platform list: {platforms[]} (src/platforms.yaml:4-5). */
  case class Platforms(version: Double, platforms: Seq[String])

  val SupportedVersions: Set[Double] = Set(1.0)

  /** Split a multi-doc YAML stream on `---` lines (doc 0 = version). */
  private def docs(text: String): Seq[Map[String, Any]] =
    text.split("(?m)^---\\s*$").map(_.trim).filter(_.nonEmpty).toSeq.map(parseDoc)

  /** Parse the reference's config subset: `key: scalar` and
    * `key:\n  - item` lists. */
  private def parseDoc(doc: String): Map[String, Any] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    var listKey: Option[String] = None
    doc.linesIterator.map(_.stripLineEnd).filter(_.trim.nonEmpty).foreach { line =>
      val t = line.trim
      if (t.startsWith("- ") && listKey.isDefined) {
        val k = listKey.get
        out(k) = out(k).asInstanceOf[Seq[String]] :+ unquote(t.drop(2).trim)
      } else if (t.endsWith(":")) {
        val k = t.dropRight(1).trim
        listKey = Some(k); out(k) = Seq.empty[String]
      } else if (t.contains(":")) {
        val Array(k, v) = t.split(":", 2)
        listKey = None; out(k.trim) = unquote(v.trim)
      }
    }
    out.toMap
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  private def versionOf(ds: Seq[Map[String, Any]], what: String): Double = {
    require(ds.size >= 2, s"$what: expected version doc + payload doc, got ${ds.size}")
    val v = ds.head.getOrElse("version",
      throw new IllegalArgumentException(s"$what: missing version document"))
      .toString.toDouble
    // fail fast on unknown versions — a real exception, not the
    // reference's raise("string") TypeError (src/main.py:195-200)
    if (!SupportedVersions.contains(v))
      throw new IllegalArgumentException(s"$what: unsupported config version $v")
    v
  }

  /** Parse a topic template (≙ load_data_file + v1.0 dispatch). */
  def parseTopic(text: String): Topic = {
    val ds = docs(text)
    val v = versionOf(ds, "topic config")
    val p = ds(1)
    Topic(v,
      p.getOrElse("topic", "").toString,
      p.getOrElse("type", "").toString,
      p.getOrElse("aliases", Seq.empty[String]).asInstanceOf[Seq[String]])
  }

  /** Parse the platform list (≙ load_platforms). */
  def parsePlatforms(text: String): Platforms = {
    val ds = docs(text)
    val v = versionOf(ds, "platforms config")
    Platforms(v, ds(1).getOrElse("platforms", Seq.empty[String]).asInstanceOf[Seq[String]])
  }

  /** Resolve a config value the reference's way (load_environment_variables,
    * src/main.py:42-47): the environment wins; absent there, fall back to
    * a flat `key: value` config file (the reference's `config.yaml` TODO
    * fallback, src/main.py:44-46); fail fast when neither has the key.
    * `env` is injectable because a JVM cannot mutate its own environment
    * — tests pass the three branches explicitly. */
  def resolve(key: String, configFile: Option[java.nio.file.Path] = None,
              env: Map[String, String] = sys.env): String =
    env.get(key)
      .orElse(configFile
        .filter(java.nio.file.Files.exists(_))
        .flatMap { p =>
          val text = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          parseDoc(text).get(key).map(_.toString)
        })
      .getOrElse(throw new IllegalArgumentException(
        s"config key '$key' absent from environment" +
          configFile.fold(" (no fallback file given)")(p => s" and from $p")))

  /** Bundled example topic config — the same 2-document stream shape as
    * the reference's topic template (src/nba.yaml:1-7), with topic/alias
    * terms drawn from the synthetic documents vocabulary so the
    * enrichment join (q_topic_alias) matches real rows. */
  val ExampleTopicYaml: String =
    """version: 1.0
      |---
      |topic: "spark"
      |type: "engine"
      |aliases:
      |  - "stream"
      |  - "vector"
      |""".stripMargin

  /** Bundled example platforms config — the 2-document stream shape of
    * the reference's platform list (src/platforms.yaml:1-5). */
  val ExamplePlatformsYaml: String =
    """version: 1.0
      |---
      |platforms:
      |  - "Twitter"
      |  - "Mastodon"
      |""".stripMargin

  /** Topic + alias expansion as a broadcast-sized dimension DataFrame
    * (one row per alias incl. the topic itself) — the enrichment-join
    * shape of src/main.py:171-186. */
  def topicDim(spark: SparkSession, t: Topic): DataFrame = {
    import spark.implicits._
    (t.topic +: t.aliases).distinct
      .map(a => (a, t.topic, t.`type`))
      .toDF("alias", "topic", "type")
  }
}
