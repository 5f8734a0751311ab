package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tiny-metadata-file reads that ride out a concurrent writer's pointer
  * flip. The flip is `delete(pointer)` → `rename(tmp, pointer)`, and on
  * checksummed filesystems (Hadoop LocalFileSystem wraps every file with
  * a `.crc` sidecar) the rename moves the data file and its sidecar in
  * TWO steps — a cross-process reader can observe new data against the
  * old checksum and get a ChecksumException, or hit the missing-file
  * window between the delete and the rename. Both are transient by
  * construction (the data file itself is renamed atomically), so the
  * correct behavior is a short bounded retry, not an error. Found by the
  * two-JVM contention spec: a worker reading `_current` mid-flip died
  * with `ChecksumException ... at 0`.
  */
private[tables] object MetaIO {

  /** Read a small file as UTF-8, retrying transient mid-flip states.
    * Returns None if the file stays absent through the retries (the
    * caller decides what a missing pointer means — e.g. tmp adoption).
    * A persistent ChecksumException (real corruption) still surfaces. */
  def readSmall(f: FileSystem, p: Path, attempts: Int = 12): Option[String] = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      if (!f.exists(p)) {
        // missing can be the mid-flip window — only conclude "absent"
        // after it stays missing across two spaced checks
        Thread.sleep(2L + i * 3)
        if (!f.exists(p)) return None
      }
      try {
        val in = f.open(p)
        return Some(
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close())
      } catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.FileNotFoundException |
                  _: java.io.EOFException) =>
          last = e
          Thread.sleep(5L + i * 10)
      }
      i += 1
    }
    throw new IllegalStateException(
      s"MetaIO: $p unreadable after $attempts attempts (not a transient flip)", last)
  }
}
