package graft.core

/** Shared /tmp hygiene (r13 review: three parallel recursive-delete
  * implementations and two copies of the dead-pid sweep had already
  * drifted — the warehouse sweep left pre-pid legacy dirs forever).
  * One definition of each, used by Tables (warehouse), the zorder/
  * compact/bloom layout token, and the fixture writers.
  */
object Fs {

  /** Recursive delete; directory streams closed eagerly. */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val st = java.nio.file.Files.list(p)
      try {
        val it = st.iterator()
        while (it.hasNext) deleteRecursively(it.next())
      } finally st.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  /** Sweep `root`'s children owned by DEAD processes: names whose
    * `pidPattern` group 1 is a dead pid and — when `sweepLegacy` — names
    * not matching the pattern at all (pre-pid formats; the JVMs that
    * wrote them ran an older binary and are gone). Live processes'
    * entries and this process's own entries are never touched; IO errors
    * on individual entries are swallowed (another sweeper may be racing).
    */
  def sweepDeadPidDirs(root: String, pidPattern: scala.util.matching.Regex,
      sweepLegacy: Boolean): Unit = {
    val d = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.isDirectory(d)) {
      val self = ProcessHandle.current().pid()
      val st = java.nio.file.Files.list(d)
      try {
        val it = st.iterator()
        while (it.hasNext) {
          val p = it.next()
          val dead = p.getFileName.toString match {
            case pidPattern(pid) => pid.toLong != self &&
              !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false)
            case _ => sweepLegacy
          }
          if (dead)
            try deleteRecursively(p) catch { case _: java.io.IOException => () }
        }
      } finally st.close()
    }
  }
}
