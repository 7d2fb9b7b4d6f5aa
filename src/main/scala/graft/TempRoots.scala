package graft

/** Per-run unique temp directories that self-delete at JVM exit
  * (round 19): operators and queries that materialize an index or
  * store the RETURNED frame keeps reading (c11's COW chain, the
  * recall evals' temp graph index) cannot clean up inline — but
  * repeated bench/verify sweeps must not steadily leak trees into
  * /tmp. One shutdown hook per created root; the per-JVM count is
  * bounded by the number of query (re)executions in that run.
  */
private[graft] object TempRoots {

  def forRun(prefix: String): String = {
    val root = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => try java.nio.file.Files.deleteIfExists(p)
            catch { case _: java.io.IOException => () })
      } catch { case _: Throwable => () }))
    root.toString
  }
}
