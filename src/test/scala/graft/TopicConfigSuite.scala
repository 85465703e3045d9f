package graft

import graft.sources.TopicConfig

/** Golden config-source tests (§2.A4): the reference's 2-doc versioned
  * YAML shape, alias expansion, and fail-fast version dispatch. */
class TopicConfigSuite extends SparkSpec {

  private val nbaYaml =
    """---
      |version: 1.0
      |---
      |topic: "NBA"
      |type: "League"
      |aliases:
      |  - "National Basketball Association"
      |  - "basketball"
      |""".stripMargin

  private val platformsYaml =
    """---
      |version: 1.0
      |---
      |platforms:
      |  - "Twitter"
      |""".stripMargin

  test("parses the reference's topic template shape") {
    val t = TopicConfig.parseTopic(nbaYaml)
    assert(t.version == 1.0)
    assert(t.topic == "NBA" && t.`type` == "League")
    assert(t.aliases == Seq("National Basketball Association", "basketball"))
  }

  test("parses the platform list") {
    assert(TopicConfig.parsePlatforms(platformsYaml).platforms == Seq("Twitter"))
  }

  test("unknown version fails fast with a real exception") {
    val bad = nbaYaml.replace("version: 1.0", "version: 9.9")
    val e = intercept[IllegalArgumentException](TopicConfig.parseTopic(bad))
    assert(e.getMessage.contains("9.9"))
  }

  test("topicDim expands aliases into a broadcast-sized dimension") {
    val dim = TopicConfig.topicDim(spark, TopicConfig.parseTopic(nbaYaml))
    val rows = dim.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length == 3)
    assert(rows.contains(("NBA", "NBA", "League")))
    assert(rows.contains(("basketball", "NBA", "League")))
  }

  test("resolve: environment wins, file is the fallback, absent-both fails fast") {
    // ≙ load_environment_variables + its config.yaml TODO fallback
    // (reference src/main.py:42-47)
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".yaml")
    java.nio.file.Files.write(f,
      "bearer_token: \"from-file\"\nleague: NBA\n".getBytes("UTF-8"))
    // 1. env present: wins even when the file also has the key
    assert(TopicConfig.resolve("bearer_token", Some(f),
      env = Map("bearer_token" -> "from-env")) == "from-env")
    // 2. env absent: the file's key: value entry answers
    assert(TopicConfig.resolve("bearer_token", Some(f), env = Map.empty) == "from-file")
    assert(TopicConfig.resolve("league", Some(f), env = Map.empty) == "NBA")
    // 3. absent both: fail fast, naming the key and the file searched
    val e = intercept[IllegalArgumentException] {
      TopicConfig.resolve("missing_key", Some(f), env = Map.empty)
    }
    assert(e.getMessage.contains("missing_key") && e.getMessage.contains(f.toString))
    // no fallback file at all: same fail-fast
    intercept[IllegalArgumentException] {
      TopicConfig.resolve("missing_key", None, env = Map.empty)
    }
  }

  test("A7 CloudConf: s3a committer confs chain onto a session builder") {
    // the sandbox has no object store; what we can pin is that the knob
    // set is the magic-committer wiring and that it applies cleanly to a
    // builder (on a cluster: CloudConf(builder).getOrCreate())
    import graft.sources.CloudConf
    assert(CloudConf.s3aCommitter("spark.hadoop.fs.s3a.committer.name") == "magic")
    assert(CloudConf.s3aCommitter.keySet.exists(_.contains("commitProtocolClass")))
    val b = CloudConf(org.apache.spark.sql.SparkSession.builder())
    assert(b != null) // chaining is side-effect-free until getOrCreate
    // …and the confs actually LAND on a built session (all are
    // modifiable, none static). One caveat this sandbox can't avoid:
    // both spark.sql.* committer confs VALIDATE their class is loadable
    // at set time, and both classes ship in spark-hadoop-cloud, which
    // (like the object store itself) isn't in this sandbox. So: the 3
    // spark.hadoop.* knobs must land verbatim, and the 2 spark.sql.*
    // knobs must fail ONLY with the missing-cloud-jar class signature —
    // proving the wiring is correct and merely endpoint-less here.
    val s = SparkSpec.session
    val (needsCloudJar, settable) =
      CloudConf.s3aCommitter.partition(_._1.startsWith("spark.sql."))
    assert(settable.size == 3 && needsCloudJar.size == 2)
    settable.foreach { case (k, v) =>
      s.conf.set(k, v)
      assert(s.conf.get(k) == v, s"conf $k did not land on the built session")
    }
    needsCloudJar.foreach { case (k, v) =>
      val e = intercept[Exception] { s.conf.set(k, v) }
      assert(e.getMessage.contains("org.apache.spark.internal.io.cloud."),
        s"$k must fail only because spark-hadoop-cloud isn't shipped here, got: ${e.getMessage}")
    }
  }
}
