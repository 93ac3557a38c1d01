package graft

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

/** Cross-JVM mutual exclusion for the measurement harness.
  *
  * Round-5 adjudication: the driver's 493 s bench (3.1× the same
  * commit's local runs) was near-uniformly slowed across untouched
  * queries — almost certainly its own Verify run co-scheduled on the
  * same 32 CPUs. Bench numbers are only meaningful when the box is
  * ours, so Bench and Verify both take this exclusive OS file lock;
  * whoever arrives second blocks until the first finishes, and Bench
  * reports how long it waited (a non-zero wait is itself evidence of
  * attempted co-running).
  */
object HarnessLock {
  private val LockPath = "/tmp/graft_harness.lock"

  /** Run `f` holding the lock; returns (result, seconds spent waiting). */
  def exclusive[T](f: => T): (T, Double) = {
    val r = exclusiveWithWait(w => (f, w))
    r
  }

  /** Run `f(waitedSeconds)` holding the lock — the wait is handed INTO
    * the block, so a caller that must emit artifacts before its block
    * ends (Bench: the driver line goes out before the untimed gates
    * run) can include it. */
  def exclusiveWithWait[T](f: Double => T): T = {
    val ch = FileChannel.open(Paths.get(LockPath),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val t0 = System.nanoTime()
    val lock = ch.lock() // blocks until any other harness JVM releases
    val waited = (System.nanoTime() - t0) / 1e9
    if (waited > 1.0)
      System.err.println(f"[harness-lock] waited $waited%.1f s for a " +
        "concurrent Bench/Verify to finish")
    try f(waited)
    finally { lock.release(); ch.close() }
  }
}
