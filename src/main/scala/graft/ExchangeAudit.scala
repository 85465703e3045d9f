package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}

/** Exchange audit: run one query from SparkEntry at an optional K×
  * derived corpus (ScaleProbe.generate) and print every shuffle
  * exchange in the EXECUTED plan with its written bytes / data size /
  * row count — including exchanges hidden inside InMemoryRelation
  * cached plans and AQE query stages, which a naive plan walk misses.
  * This is the tool that localizes "which exchange is the fat one"
  * when scale_probe.json flags a query's shuffle volume.
  *
  * Usage: tools/run.sh graft.ExchangeAudit <query> [srcDir] [k]
  *   query   name from SparkEntry.queries (e.g. q_sim_jaccard)
  *   srcDir  driver SF dir (default /root/testdata/sf0.01)
  *   k       scale multiple; 1 = run srcDir as-is (default 10)
  */
object ExchangeAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExchangeAudit <query> [srcDir] [k]")
    val name = args(0)
    val srcDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir =
      if (k <= 1) srcDir
      else {
        val tmp = java.nio.file.Files.createTempDirectory("xaudit_").toString
        val subset = ScaleProbe.rung2Queries.get(name).map(Seq(_))
        ScaleProbe.generate(spark, srcDir, tmp, k, subset.getOrElse(Seq(
          "region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")))
        tmp
      }
    // Task-level totals (same metric ScaleProbe reports): shuffle READ
    // can exceed the sum of exchange writes when an exchange's output
    // is fetched more than once — that disagreement is itself the clue.
    val readB = new java.util.concurrent.atomic.AtomicLong()
    val writeB = new java.util.concurrent.atomic.AtomicLong()
    val spillB = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          readB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          writeB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillB.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        }
      }
    })
    val df = SparkEntry.queries(name)(spark, dir)
    // The noop write runs its OWN QueryExecution — df.queryExecution's
    // plan instance never executes, so its metrics stay zero. Capture
    // the executed instance from the listener instead.
    @volatile var executed: Option[SparkPlan] = None
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        executed = Some(qe.executedPlan)
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    // SPARK_GRAFT_AUDIT_RUNS=n replays the query n times (fresh DataFrame
    // each time, like ScaleProbe.measure) and prints per-run task totals —
    // the tool for localizing repeat-run inflation (cache interactions)
    // as opposed to single-run plan cost.
    val runs = sys.env.get("SPARK_GRAFT_AUDIT_RUNS").map(_.toInt).getOrElse(1)
    var prevR = 0L; var prevW = 0L
    (1 to runs).foreach { r =>
      val dfR = if (r == 1) df else SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      dfR.write.mode("overwrite").format("noop").save()
      val el = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftshim.GraftShim.drainListenerBus(spark)
      println(f"RUN $r%d elapsed=$el%.1f s read=${(readB.get - prevR) / 1048576.0}%.1f MB written=${(writeB.get - prevW) / 1048576.0}%.1f MB")
      prevR = readB.get; prevW = writeB.get
    }
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    var total = 0.0
    def walk(p: SparkPlan): Unit = {
      if (!seen.add(p)) return
      p match {
        case s: ShuffleExchangeExec =>
          val written = s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(-1L)
          val ds = s.metrics.get("dataSize").map(_.value).getOrElse(-1L)
          val rows = s.metrics.get("numOutputRows")
            .orElse(s.metrics.get("shuffleRecordsWritten")).map(_.value).getOrElse(-1L)
          total += math.max(written, 0L) / 1048576.0
          println(f"EXCHANGE written=${written / 1048576.0}%9.1f MB dataSize=${ds / 1048576.0}%9.1f MB rows=$rows%12d  <- ${s.child.nodeName} / ${s.child.simpleStringWithNodeId().take(160)}")
        case r: ReusedExchangeExec =>
          println(s"REUSED-EXCHANGE (bytes counted at original)  <- ${r.child.nodeName}")
        case _ =>
      }
      val extra: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
        case _                        => Nil
      }
      (p.children ++ extra).foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(executed.getOrElse(df.queryExecution.executedPlan))
    println(f"TOTAL shuffle written (one traversal, reuse uncounted): $total%.1f MB")
    println(f"TASK TOTALS read=${readB.get / 1048576.0}%.1f MB written=${writeB.get / 1048576.0}%.1f MB spill=${spillB.get / 1048576.0}%.1f MB")
    if (sys.env.contains("SPARK_GRAFT_AUDIT_TREE")) {
      def tree(p: SparkPlan, d: Int): Unit = {
        println("  " * d + p.nodeName)
        val extra: Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec        => Seq(q.plan)
          case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
          case _                        => Nil
        }
        (p.children ++ extra).foreach(tree(_, d + 1))
      }
      tree(executed.getOrElse(df.queryExecution.executedPlan), 0)
    }
    spark.stop()
  }
}
