package graft.util

/** Tiny Spark-free main for the CROSS-PROCESS lease exercises: acquire
  * the [[IndexMaint.withLease]] fcntl lock on `args(0)`, print `HELD`,
  * hold it for `args(1)` ms, release, exit 0. Spawned as a real child
  * JVM by IndexMaintSpec and ScaleProbe so the OS file-lock path — not
  * the in-JVM monitor or `OverlappingFileLockException` fallback — is
  * what a contending parent-mutation actually hits.
  */
object LeaseHold {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val holdMs = args(1).toLong
    IndexMaint.withLease(root, op = "child-hold") {
      // flush so the parent can synchronize on lock acquisition
      System.out.println("HELD")
      System.out.flush()
      Thread.sleep(holdMs)
    }
    System.out.println("RELEASED")
  }
}
