package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}

/** Table-root commit lock shared by [[SnapshotTable]] and
  * [[BucketedSnapshotTable]]: `create(overwrite = false)` on `_lock` is
  * the claim — exactly one concurrent caller wins. LocalFileSystem
  * implements the no-overwrite check as check-then-act, so in-process
  * threads additionally serialize on a per-root JVM monitor; across
  * JVMs/object stores the file claim is the same best-effort Delta has
  * without a lock service. A lock older than [[StaleMs]] is presumed
  * abandoned (crashed holder) and stolen. */
private[tables] object CommitLock {

  /** How long a `_lock` may sit before another writer presumes its holder
    * dead and steals it (a crashed driver must not wedge the table). */
  val StaleMs = 60000L

  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def monitor(root: String): Object =
    monitors.computeIfAbsent(root, _ => new Object)

  def withLock[T](f: FileSystem, root: String)(body: => T): T = {
    val lock = new Path(root, "_lock")
    f.mkdirs(new Path(root))
    val deadline = System.currentTimeMillis() + 2 * StaleMs
    var held = false
    while (!held) {
      try { monitor(root).synchronized { f.create(lock, false).close() }; held = true }
      catch {
        case _: java.io.IOException =>
          val stale = try {
            f.exists(lock) &&
              System.currentTimeMillis() - f.getFileStatus(lock).getModificationTime > StaleMs
          } catch { case _: java.io.FileNotFoundException => false }
          if (stale) f.delete(lock, false)
          else if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"table $root: could not acquire commit lock within ${2 * StaleMs} ms")
          else Thread.sleep(25)
      }
    }
    try body finally f.delete(lock, false)
  }
}
