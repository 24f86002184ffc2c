package graft.index

/** Generation catalog for swapped at-rest index layouts — the missing
  * half of the recluster/swap lifecycle (r15 verdict, Next #2).
  *
  * [[IvfIndexStore.recluster]] correctly REFUSES in-place overwrites:
  * live readers hold the old directory's file listing, and deleting
  * (or overwriting) under a cached FileIndex is a mid-scan
  * FileNotFoundException on an unrelated query — the exact failure
  * family the bench fork's temp-cwd isolation closed in r14. But that
  * left the cleanup MANUAL: old generations leak until someone deletes
  * them blind, and "blind" is precisely the unsafe part.
  *
  * This catalog makes deletion deferred-safe with a read-lease
  * protocol:
  *
  *  - readers wrap their use of a generation in [[lease]] (the scan,
  *    or the whole serve call) — a refcount, nothing heavier;
  *  - [[retire]] requests deletion: it REFUSES while the path is
  *    still registered for serving ([[graft.plans.LshProbeRewrite]]
  *    would keep rewriting queries onto a doomed directory), deletes
  *    immediately when no lease is live, and otherwise marks the
  *    generation retire-pending — the LAST lease release performs the
  *    deferred deletion;
  *  - a retired generation refuses new leases loudly (the directory
  *    is gone or about to be; a quiet empty scan would be the silent
  *    version of the same bug).
  *
  * Scope, stated honestly: the refcount is per-JVM — the right scope
  * for the failure it prevents, because the cached FileIndex a
  * deletion races with is also per-JVM (cross-JVM coordination would
  * need a manifest in the layout itself; the `_registration` sidecar
  * precedent makes that a natural extension, not a rewrite). A reader
  * that bypasses the lease protocol keeps exactly today's behavior:
  * a premature manual delete fails its scan loudly mid-flight —
  * the catalog narrows the hazard, it cannot retroactively protect
  * readers that never announced themselves.
  */
object IndexGenerations {

  private final class Gen {
    var leases: Int = 0
    var retirePending: Boolean = false
    var retired: Boolean = false
  }

  private val gens = new java.util.concurrent.ConcurrentHashMap[String, Gen]

  private def key(p: String): String =
    new java.io.File(p).getAbsolutePath.stripSuffix("/")

  private def rmTree(p: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(p))
  }

  /** On-disk twin of the in-memory retire-pending flag (r16, roadmap
    * thread #4): a crash between "retire deferred" and "last lease
    * released" used to leak the directory with nothing recording the
    * intent. The `_retire_pending` marker (underscore-prefixed —
    * FileIndex listings ignore it, so a still-leased reader's scan is
    * untouched) is written when a retire defers and vanishes with the
    * directory; a FRESH JVM refuses new leases on a marker-carrying
    * generation and [[sweep]] finishes the interrupted cleanup. */
  private def markerFile(k: String): java.io.File =
    new java.io.File(k, "_retire_pending")

  /** Finish cleanups a previous JVM left pending: delete every child
    * directory of `parentDir` carrying the `_retire_pending` marker,
    * SKIPPING any that is currently registered for serving or holds a
    * live lease in THIS JVM (the skip list comes back alongside the
    * deletions — a skipped path is a live registration someone made
    * without clearing the marker, worth a look, not a crash). */
  def sweep(parentDir: String): (Seq[String], Seq[String]) = {
    val kids = Option(new java.io.File(parentDir).listFiles())
      .getOrElse(Array.empty).filter(f => f.isDirectory && markerFile(f.getPath).exists())
    val results = kids.map { f =>
      val k = key(f.getPath)
      val g = gens.computeIfAbsent(k, _ => new Gen)
      // the lease-count check and the retired flip happen in ONE
      // critical section (r16 ADVICE: a check-then-act partition let a
      // concurrent lease() land between the liveLeases read and the
      // rmTree — deleting the directory under an active reader); a
      // lease that raced in wins, and the marker stays for a later
      // sweep. lease() itself synchronizes on the same Gen and refuses
      // once retired, so no new reader can slip in after the flip.
      val deleteNow = g.synchronized {
        if (graft.plans.LshProbeRewrite.isRegistered(f.getPath) || g.leases > 0)
          false
        else { g.retirePending = false; g.retired = true; true }
      }
      if (deleteNow) rmTree(k)
      (f.getPath, deleteNow)
    }
    (results.collect { case (p, true) => p }.toSeq,
      results.collect { case (p, false) => p }.toSeq)
  }

  /** Run `f` holding a read lease on the generation at `path`: retire
    * requested while `f` runs is DEFERRED until the last lease
    * releases; a generation already retired refuses the lease loudly.
    */
  def lease[A](path: String)(f: => A): A = {
    // a fresh JVM first hears of a generation here — a marker left by
    // a crashed predecessor makes it retire-pending from the start, so
    // the lease refuses instead of reading a directory scheduled to die
    val g = gens.computeIfAbsent(key(path), k => {
      val ng = new Gen
      if (markerFile(k).exists()) ng.retirePending = true
      ng
    })
    g.synchronized {
      require(!g.retired && !g.retirePending,
        s"index generation $path is retired — re-register and serve a live generation")
      g.leases += 1
    }
    try f
    finally {
      val deleteNow = g.synchronized {
        g.leases -= 1
        if (g.retirePending && g.leases == 0) {
          g.retirePending = false; g.retired = true; true
        } else false
      }
      if (deleteNow) rmTree(key(path))
    }
  }

  /** Request deletion of the generation at `path`. Returns true when
    * the directory was deleted NOW (no live leases), false when
    * deletion was deferred to the last lease's release. Refuses while
    * the path is registered for serving — unregister first
    * ([[graft.plans.LshProbeRewrite.unregister]]); the swap order is
    * register(new) → unregister(old) → retire(old). Idempotent on an
    * already-retired generation. */
  def retire(path: String): Boolean = {
    val k = key(path)
    require(!graft.plans.LshProbeRewrite.isRegistered(k),
      s"$k is still registered for serving — a retire now would delete the " +
        "directory the optimizer rule is rewriting queries onto")
    val g = gens.computeIfAbsent(k, _ => new Gen)
    val deleteNow = g.synchronized {
      if (g.retired) false
      else if (g.leases == 0) { g.retired = true; true }
      else { g.retirePending = true; false }
    }
    if (deleteNow) rmTree(k)
    else if (!isRetired(k))
      // deferred: persist the intent so a crash before the last lease
      // release cannot leak the directory silently (sweep() finishes
      // the job in the next JVM; best-effort — a read-only FS keeps
      // today's in-memory behavior)
      try { markerFile(k).createNewFile(): Unit }
      catch { case scala.util.control.NonFatal(_) => () }
    deleteNow
  }

  /** True when the generation is fully retired (directory deleted). */
  def isRetired(path: String): Boolean =
    Option(gens.get(key(path))).exists(g => g.synchronized(g.retired))

  /** Live lease count (spec/diagnostic surface). */
  def liveLeases(path: String): Int =
    Option(gens.get(key(path))).map(g => g.synchronized(g.leases)).getOrElse(0)

  /** Forget all generation records (spec isolation). Never deletes. */
  def clear(): Unit = gens.clear()
}
