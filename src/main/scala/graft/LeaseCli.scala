package graft

/** Tiny cross-JVM probe for the IncrState writer lease (VERDICT r15 #1):
  * a bare `java -cp … graft.LeaseCli acquire-release <warehouse> <scope>`
  * attempts one lease acquire+release THROUGH the same filesystem
  * protocol the member fold/delete/compact ops use — no SparkSession, so
  * a second process can exercise the contract in ~a second instead of a
  * full Spark boot. Exit codes: 0 = acquired+released, 3 = contended
  * (the loud-failure path), anything else = unexpected error.
  *
  * Driven by LeaseSuite's cross-JVM test; also a deployment operator's
  * probe ("is someone folding this prefix right now?").
  */
object LeaseCli {
  def main(args: Array[String]): Unit = args match {
    case Array("acquire-release", warehouse, scope) =>
      val conf = new org.apache.hadoop.conf.Configuration()
      try {
        val token = ops.IncrState.acquireLease(conf, warehouse, scope)
        ops.IncrState.releaseLease(conf, warehouse, scope, token)
        println("ACQUIRED")
      } catch {
        case e: ops.IncrState.LeaseContendedException =>
          println(s"CONTENDED: ${e.getMessage}")
          sys.exit(3)
      }
    case _ =>
      System.err.println("usage: LeaseCli acquire-release <warehouse> <scope>")
      sys.exit(2)
  }
}
