package graft.io

/** Registry for session-keyed /tmp scratch roots (landed fixtures,
  * streaming checkpoints, bucket-table files). The session-identity
  * suffix keeps concurrent processes from clobbering each other's
  * landings — but it also means every session mints FRESH paths, and a
  * box that runs many bench/verify sessions accumulates hundreds of
  * orphaned copies (observed: 89 stale landings filling /tmp mid-run).
  * Every minted root registers here and is deleted by one JVM shutdown
  * hook; the paths are caches/landings derived from the source tables,
  * never artifacts of record, so deleting them at exit loses nothing.
  */
object TmpRoots {

  private val registered =
    java.util.Collections.synchronizedSet(new java.util.LinkedHashSet[String]())

  @volatile private var hooked = false

  /** Register `path` for deletion at JVM exit; returns it unchanged so
    * creation sites can wrap their existing path expression. */
  def cleanupOnExit(path: String): String = {
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          // Collections.synchronizedSet guards individual ops only —
          // iteration (the ArrayList copy) must hold the SET's monitor,
          // not this object's, or a concurrent cleanupOnExit during
          // shutdown throws ConcurrentModificationException outside the
          // try/catch below and aborts all cleanup.
          val snap = registered.synchronized(new java.util.ArrayList(registered))
          snap.forEach { p =>
            try deleteRec(new java.io.File(p))
            catch { case _: Throwable => () }
          }
        }, "graft-tmproot-cleanup"))
        hooked = true
      }
    }
    registered.add(path)
    path
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }
}
