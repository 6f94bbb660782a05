package graft

/** Shared scratch-directory machinery for bench-gate fixtures: a
  * tmpfs-preferred temp dir (so gates price the persistence MACHINERY —
  * Spark jobs, manifest commits — not /tmp's disk and page-cache state)
  * with a shutdown hook that reclaims it at JVM exit. One implementation
  * for what used to be three copies (ivfGateRoot, replayGateRoot, the
  * maintained-store fixture).
  */
object GateScratch {

  /** Recursive delete, snapshot-then-close: a bare `Files.list(...)
    * .forEach` leaks the directory stream's fd AND mutates the directory
    * while its stream is open.
    */
  def rmTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val ls = java.nio.file.Files.list(p)
      val kids = try {
        val b = List.newBuilder[java.nio.file.Path]
        ls.forEach(b += _); b.result()
      } finally ls.close()
      kids.foreach(rmTree)
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  /** A fresh tmpfs-preferred temp dir (no cleanup hook — callers that
    * delete inline, e.g. streaming checkpoints, use this).
    */
  def tempDir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }

  /** A fresh tmpfs-preferred scratch root reclaimed at JVM exit. */
  def root(prefix: String): String = {
    val rootPath = tempDir(prefix)
    sys.addShutdownHook {
      try rmTree(rootPath) catch { case _: java.io.IOException => () }
    }
    rootPath.toString
  }
}
