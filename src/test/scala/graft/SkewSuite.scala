package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: at 100 TB a hot key turns one shuffle
  * partition into a straggler that runs for hours; Spark's adaptive
  * skew-join split detects the oversized partition at runtime and fans
  * it out across tasks. This suite pins that the feature actually
  * engages on a skewed join under thresholds scaled to the test data —
  * the complement of BucketingSuite's manual salting path. */
class SkewSuite extends SparkSpec {

  test("AQE splits the skewed partition of a hot-key shuffle join") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // keep it a shuffle join
      // scale the skew thresholds down to test-data sizes: a partition
      // is "skewed" past 64KB and 2x the median, split to ~16KB targets
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 200k-row fact where 95% of rows share ONE join key (the whale),
      // joined to a 1k-row build side with matching keys
      val fact = spark.range(200000)
        .select((when($"id" % 20 =!= 0, lit(0L)).otherwise($"id" % 1000)).as("k"),
          concat(lit("payload-padding-padding-padding-"), $"id").as("pad"))
      val dim = spark.range(1000).select($"id".as("k"), ($"id" * 7).as("w"))
      // keep the wide payload column flowing through the shuffle so the
      // hot key's partition is genuinely oversized, not pruned to longs
      val joined = fact.join(dim, "k")
        .groupBy(($"k" % 10).as("g"))
        .agg(count(lit(1)).as("n"), sum(length($"pad")).as("chars"), sum($"w").as("ws"))
      joined.collect() // finalize the adaptive plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"AQE did not mark/split the skewed join partition in:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
