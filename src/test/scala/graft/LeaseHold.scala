package graft

/** Test helper MAIN run as a SEPARATE JVM by TablesSpec's cross-process
  * lease test: acquire the writer lease on args(0), touch a ready-marker
  * file (args(2)) so the parent knows the lease is held, hold it for
  * args(1) ms, release, exit 0. Needs no Spark — the lease is pure
  * Hadoop-filesystem arbitration, which is exactly the property the
  * cross-process test exists to prove.
  */
object LeaseHold {

  /** Hold the writer lease on `dir` from ANOTHER THREAD for the duration
    * of `body` — the in-process way to present a FOREIGN (non-re-entrant)
    * lease to the code under test (the lease is thread-re-entrant, so
    * holding it on the test's own thread wouldn't contend).
    */
  def whileHeld[T](fs: org.apache.hadoop.fs.FileSystem,
                   dir: org.apache.hadoop.fs.Path, op: String)(body: => T): T = {
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      graft.io.Tables.withWriterLease(fs, dir, op) {
        started.countDown()
        release.await()
      }
    }, "lease-hold-test")
    holder.setDaemon(true)
    holder.start()
    started.await()
    try body finally { release.countDown(); holder.join() }
  }

  def main(args: Array[String]): Unit = {
    val dir = new org.apache.hadoop.fs.Path(args(0))
    val holdMs = args(1).toLong
    val ready = java.nio.file.Paths.get(args(2))
    val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    graft.io.Tables.withWriterLease(fs, dir, "cross-process-probe") {
      java.nio.file.Files.write(ready, "held".getBytes("UTF-8"))
      Thread.sleep(holdMs)
    }
  }
}
