package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

// throwaway diagnostic — delete before commit
object DebugJac {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    val tmp = java.nio.file.Files.createTempDirectory("jacprobe_").toString
    ScaleProbe.generate(spark, "/root/testdata/sf0.01", tmp, k, Seq("documents"))
    val df = SparkEntry.queries("q_sim_jaccard")(spark, tmp)
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"ELAPSED ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def walk(p: SparkPlan): Unit = {
      p match {
        case s: ShuffleExchangeExec =>
          val written = s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(-1L)
          val ds = s.metrics.get("dataSize").map(_.value).getOrElse(-1L)
          val rows = s.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
          println(f"EXCHANGE written=${written / 1048576.0}%.1f MB dataSize=${ds / 1048576.0}%.1f MB child=${s.child.nodeName} / ${s.child.simpleStringWithNodeId().take(150)}")
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    spark.stop()
  }
}
