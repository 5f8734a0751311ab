package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}

/** Table-root commit lock shared by [[SnapshotTable]] and
  * [[BucketedSnapshotTable]]: `create(overwrite = false)` on `_lock` is
  * the claim — exactly one concurrent caller wins. LocalFileSystem
  * implements the no-overwrite check as check-then-act, so in-process
  * threads additionally serialize on a per-root JVM monitor; across
  * JVMs/object stores the file claim is the same best-effort Delta has
  * without a lock service. A lock older than [[StaleMs]] is presumed
  * abandoned (crashed holder) and stolen.
  *
  * Steal discipline (two independent guards, because a filesystem has no
  * compare-and-swap):
  *
  *   - every lock file carries its holder's unique TOKEN; after creating
  *     the file the claimant reads it back and holds only if its own
  *     token survived — a racing stealer that clobbered the file wins,
  *     the clobbered claimant retries. The release path likewise deletes
  *     only a lock that still carries the caller's token, so a stale
  *     holder's `finally` can never free a stealer's fresh lock.
  *   - a steal deletes the stale file only if its modification time still
  *     equals the one observed when staleness was decided — a fresh lock
  *     created in between (new mtime) is left alone.
  *
  * A PAUSED (not dead) holder that resumes after being stolen from still
  * believes it owns the section; [[Handle.check]] lets commit sites
  * re-verify token ownership immediately before their irreversible
  * mutation (the pointer flip) and abort with
  * `ConcurrentModificationException` instead of double-committing.
  */
private[tables] object CommitLock {

  /** How long a `_lock` may sit before another writer presumes its holder
    * dead and steals it (a crashed driver must not wedge the table). */
  val StaleMs = 60000L

  /** How many DISTINCT lock holders a waiter serializes behind before
    * failing loudly. The progress-aware deadline alone would let a
    * continuous stream of short-lived committers starve a waiter forever
    * (every fresh lock advances the mtime and resets the deadline); a
    * SINGLE long-running heartbeating holder is one distinct token no
    * matter how long it runs, so the legitimate serialize-behind-a-live-
    * refresh case is never capped — only unbounded holder churn is. */
  val MaxWaitHolders = 64

  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def monitor(root: String): Object =
    monitors.computeIfAbsent(root, _ => new Object)

  /** Proof of lock ownership, re-checkable mid-critical-section. */
  final class Handle private[CommitLock] (f: FileSystem, lock: Path,
      private[CommitLock] val token: String) {
    def stillHeld: Boolean = readToken(f, lock).contains(token)
    /** Abort (rather than double-commit) if the lock was stolen while the
      * holder was paused — call immediately before the pointer flip. */
    def check(): Unit =
      if (!stillHeld) throw new java.util.ConcurrentModificationException(
        s"commit lock $lock was stolen (holder presumed dead after ${StaleMs} ms) — " +
          "aborting to avoid double-commit; re-read and retry")
  }

  private def readToken(f: FileSystem, lock: Path): Option[String] =
    try {
      val in = f.open(lock)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  def withLock[T](f: FileSystem, root: String)(body: => T): T =
    withLockHandle(f, root)(_ => body)

  /** Like [[withLockHandle]], but a daemon HEARTBEAT touches the lock's
    * mtime every staleMs/3 while the body runs — for critical sections
    * whose legitimate duration can exceed the staleness bound (a view
    * refresh folding a large window). Staleness then means "holder
    * stopped heartbeating" (crashed/paused), not "held too long": a live
    * long-running holder is never stolen, a dead one still is within
    * ~staleMs. The touch is mtime-only (`setTimes`), so a racing stealer's
    * fresh lock file is never clobbered — at worst its lease is extended
    * by one beat. */
  def withHeartbeatLock[T](f: FileSystem, root: String,
      staleMs: Long = StaleMs)(body: Handle => T): T =
    withLockHandle(f, root, staleMs) { h =>
      val lock = new Path(root, "_lock")
      @volatile var running = true
      val beat = new Thread(() => {
        while (running) {
          try Thread.sleep(math.max(1L, staleMs / 3))
          catch { case _: InterruptedException => () }
          if (running)
            try f.setTimes(lock, System.currentTimeMillis(), -1)
            catch {
              // deleted/stolen lock, or an FS that rejects setTimes
              // (UnsupportedOperationException on some connectors): the
              // BEAT must survive any per-touch failure — a dead beat
              // thread silently reverts to held-too-long stealing, the
              // exact failure this lock exists to prevent. A stolen lock
              // still aborts the holder at its next h.check().
              case scala.util.control.NonFatal(_) => ()
            }
        }
      }, s"graft-lock-heartbeat:$root")
      beat.setDaemon(true)
      beat.start()
      try body(h)
      finally { running = false; beat.interrupt() }
    }

  def withLockHandle[T](f: FileSystem, root: String, staleMs: Long = StaleMs)
      (body: Handle => T): T = {
    val lock = new Path(root, "_lock")
    val token = java.util.UUID.randomUUID().toString
    f.mkdirs(new Path(root))
    // PROGRESS-AWARE deadline: "no progress for 2×staleMs", not "waited
    // 2×staleMs total". A holder under [[withHeartbeatLock]] legitimately
    // runs past any fixed bound while touching the lock's mtime; each
    // observed mtime advance resets the waiter's deadline, so concurrent
    // refreshers SERIALIZE behind a live long refresh (and then fold only
    // the remainder, per the refresh docs) instead of throwing. A holder
    // that stops beating goes stale within staleMs and is stolen; a waiter
    // seeing neither progress nor staleness for 2×staleMs still fails
    // loudly (defensive: that state should be unreachable).
    var deadline = System.currentTimeMillis() + 2 * staleMs
    var lastSeen: Option[Option[Long]] = None
    var holdersSeen = Set.empty[String]
    var held = false
    while (!held) {
      val created =
        try {
          monitor(root).synchronized {
            val out = f.create(lock, false)
            try out.write(token.getBytes("UTF-8")) finally out.close()
          }
          true
        } catch { case _: java.io.IOException => false }
      if (created) {
        // read-back: a stealer may have deleted-and-replaced our file
        // between create and now — only our surviving token means we hold
        held = readToken(f, lock).contains(token)
        if (!held) Thread.sleep(25)
      } else {
        val observed =
          try Option(f.getFileStatus(lock)).map(_.getModificationTime)
          catch { case _: java.io.IOException => None }
        if (!lastSeen.contains(observed)) {
          lastSeen = Some(observed)
          deadline = System.currentTimeMillis() + 2 * staleMs
          // starvation bound on the reset: an mtime advance is either the
          // SAME holder's heartbeat (token unchanged — free) or a NEW
          // short-lived committer; a waiter that has serialized behind
          // [[MaxWaitHolders]] distinct holders without ever winning the
          // claim race fails loudly instead of waiting forever
          readToken(f, lock).foreach(holdersSeen += _)
          if (holdersSeen.size > MaxWaitHolders)
            throw new IllegalStateException(
              s"table $root: commit-lock waiter starved — " +
                s"${holdersSeen.size} distinct holders came and went without " +
                "this waiter ever acquiring; reduce commit contention or retry")
        }
        val stale = observed.exists(System.currentTimeMillis() - _ > staleMs)
        if (stale) {
          // conditional steal: gone or touched since we judged it stale
          // means someone else acted — leave it and re-loop
          monitor(root).synchronized {
            val still =
              try Option(f.getFileStatus(lock)).map(_.getModificationTime) == observed
              catch { case _: java.io.IOException => false }
            if (still) f.delete(lock, false)
          }
        } else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"table $root: commit lock made no progress (no mtime advance, " +
              s"not stale) for ${2 * staleMs} ms — cannot acquire")
        else Thread.sleep(25)
      }
    }
    val h = new Handle(f, lock, token)
    try body(h)
    finally monitor(root).synchronized {
      if (h.stillHeld) f.delete(lock, false)
    }
  }
}
