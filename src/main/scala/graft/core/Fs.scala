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

  /** Age-bounded stale sweep (VERDICT r13 item 8): the pid-keyed roots
    * already self-sweep via [[sweepDeadPidDirs]], but the random-suffix
    * fixture/stream dirs (`graft-csv<rand>`, `graft_stream<rand>`,
    * `graft-restart-agg<rand>`, ...) carry no owner token and accumulate
    * across rounds. Deletes DIRECTORIES under `root` whose name starts
    * with a `prefixes` entry, is not excluded by `keep`, and whose
    * last-modified time is older than `maxAgeMillis` — age is the
    * concurrency guard (any live run's dirs are hours fresher than the
    * bound). Regular files (e.g. the driver's own /tmp notes) are never
    * touched. Returns the number of entries removed.
    */
  def cleanupStale(root: String = "/tmp",
      prefixes: Seq[String] = Seq("graft-", "graft_"),
      keep: String => Boolean = _.startsWith("graft_sf"),
      maxAgeMillis: Long = 6L * 3600 * 1000): Int = {
    val d = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(d)) return 0
    val cutoff = System.currentTimeMillis() - maxAgeMillis
    var removed = 0
    val st = java.nio.file.Files.list(d)
    try {
      val it = st.iterator()
      while (it.hasNext) {
        val p = it.next()
        val name = p.getFileName.toString
        val eligible = prefixes.exists(name.startsWith) && !keep(name) &&
          java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)
        if (eligible) {
          val stale = try newestMtime(p) < cutoff
          catch { case _: java.io.IOException => false }
          if (stale) {
            try { deleteRecursively(p); removed += 1 }
            catch { case _: java.io.IOException => () }
          }
        }
      }
    } finally st.close()
    removed
  }

  /** Newest last-modified time across `p` and its DESCENDANTS (full walk;
    * these dirs are small). A directory's own mtime only updates when a
    * direct child is created/deleted, so a live run >6h old whose writes
    * land in nested subdirs (e.g. a stream dir's out/ checkpoint) would
    * look stale from the root mtime alone (ADVICE r14) — recency anywhere
    * inside counts.
    */
  private def newestMtime(p: java.nio.file.Path): Long = {
    var newest = java.nio.file.Files.getLastModifiedTime(p).toMillis
    if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val st = java.nio.file.Files.list(p)
      try {
        val it = st.iterator()
        while (it.hasNext) {
          val m = try newestMtime(it.next())
          catch { case _: java.io.IOException => 0L }
          if (m > newest) newest = m
        }
      } finally st.close()
    }
    newest
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
