package graft.io

/** Temp directories that actually get cleaned up. `File.deleteOnExit` is a
  * silent no-op on non-empty directories, so every demo query that stages
  * an index or sink under /tmp would leak a corpus-sized tree per
  * invocation; this registers ONE shutdown hook that deletes the
  * registered trees recursively at JVM exit (bench/verify runs are
  * one-JVM-per-pass, so exit is the natural scope). */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(deleteRecursively)
    }))

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** A fresh temp dir, recursively deleted at JVM exit. */
  def createDeletedOnExit(prefix: String): java.io.File = {
    hookInstalled
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    registered.add(dir)
    dir
  }
}
