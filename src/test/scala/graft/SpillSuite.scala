package graft

import scala.sys.process._

/** Results must be bit-identical when operators spill to disk — the
  * execution condition a 100 TB cluster actually runs under, which the
  * tiny local datasets never trigger on their own (every bench capture
  * shows 0 spill). `spark.shuffle.spill.numElementsForceSpillThreshold`
  * is a static SparkEnv conf, so each mode runs in its own JVM via
  * tools/run.sh and we compare the printed canonical hashes. */
class SpillSuite extends org.scalatest.funsuite.AnyFunSuite {

  private def run(mode: String*): (Map[String, String], Long) = {
    val cmd = Seq("bash", "tools/run.sh", "graft.SpillCheck", "/root/testdata/sf0.001") ++ mode
    val out = new StringBuilder
    val code = Process(cmd, new java.io.File("/root/repo"))
      .!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(code == 0, s"SpillCheck ${mode.mkString(" ")} exited $code:\n$out")
    val lines = out.toString.linesIterator.toSeq
    val hashes = lines.collect {
      case l if l.startsWith("HASH ") =>
        val Array(_, name, n, h) = l.split(" "); name -> s"$n:$h"
    }.toMap
    val spill = lines.collectFirst {
      case l if l.startsWith("SPILL_BYTES ") => l.split(" ")(1).toLong
    }.getOrElse(-1L)
    (hashes, spill)
  }

  test("forced disk spill leaves every query's result bit-identical") {
    val (normal, spillNormal) = run()
    val (forced, spillForced) = run("force")
    assert(normal.keySet == SpillCheck.checkQueries.toSet)
    // the forced mode must actually have exercised the spill path,
    // otherwise this test proves nothing
    assert(spillForced > 0, s"forced mode never spilled (conf ignored?)")
    assert(spillNormal == 0, s"normal mode spilled ${spillNormal}B on tiny data")
    SpillCheck.checkQueries.foreach { q =>
      assert(normal(q) == forced(q),
        s"$q diverged under spill: ${normal(q)} vs ${forced(q)}")
    }
  }
}
