package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-process root for query-scoped temp tables (sink/lifecycle queries
  * write here and read their own output back), deleted by a JVM shutdown
  * hook. Two reasons beyond tidiness:
  *
  *  - A full Bench/Verify pass writes hundreds of MB of temp DeltaLite
  *    tables; left behind, the accumulated litter (measured 8.6 GB /
  *    5000 dirs after a day of runs) both fills /tmp and — worse —
  *    leaves a dirty-page writeback backlog that stalls the NEXT run's
  *    IO in D-state. Deleting before exit lets the kernel drop dirty
  *    pages that were never flushed instead of writing them out.
  *  - One root per process means concurrent Bench/Verify/test JVMs can
  *    never tread on each other's files.
  */
object TempDirs {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_run_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the process root (same contract as
    * `Files.createTempDirectory`, plus exit-time cleanup). */
  def fresh(tag: String): String =
    Files.createTempDirectory(root, s"graft_$tag").toString

  private def deleteRecursively(p: Path): Unit =
    try {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder())
        .forEach(f => { val _ = Files.deleteIfExists(f) })
      finally s.close()
    } catch { case _: Throwable => () } // best-effort: exit proceeds anyway
}
