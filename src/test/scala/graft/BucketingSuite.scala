package graft

import org.apache.spark.sql.functions._

/** Scale-infrastructure checks: bucketed co-located joins (no shuffle)
  * and salted skew joins — the two levers SURVEY.md §0 L2 calls out for
  * 100 TB fact⋈fact work. */
class BucketingSuite extends SparkSpec {

  test("bucketBy co-located join: no Exchange between bucketed scans") {
    // explicit table paths → external tables; the static warehouse dir is untouched
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    Tables.orders(spark, sfDir)
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.lineitem(spark, sfDir)
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey")).count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key: the join itself needs no
    // shuffle (the only Exchange allowed is the final aggregation's)
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").last
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey") &&
           !joinPart.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles:\n$plan")
    // and it is correct
    assert(joined.agg(sum("count")).first().getLong(0) ==
      Tables.lineitem(spark, sfDir).join(Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey")).count())
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("salted join spreads a skewed key across salt partitions, same result") {
    import spark.implicits._
    // skewed fact: 10k rows of one key + scattered tail
    val fact = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong, i.toLong))).toDF("k", "payload")
    val dim = (1 to 100).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    val nSalt = 8
    // salt the fact side; replicate the dim side ×nSalt
    val saltedFact = fact.withColumn("salt", (rand(42) * nSalt).cast("int"))
    val saltedDim = dim.crossJoin(
      spark.range(nSalt).select($"id".cast("int").as("salt")))
    val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
      .groupBy($"k").agg(count(lit(1)).as("n"), first($"name").as("name"))
    val plain = fact.join(dim, Seq("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"), first($"name").as("name"))
    val a = salted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // the hot key's rows really are spread across several salt values
    val spread = saltedFact.filter($"k" === 1L).select("salt").distinct().count()
    assert(spread >= nSalt / 2, s"salting did not spread the hot key (got $spread salts)")
  }
}
