package graft.sources

/** Per-process scratch directories for registered queries that must
  * materialize a data-sized artifact mid-query (q121's encoded index, the
  * q128–q131 interchange round trips).
  *
  * The two failure modes this balances, both hit in review:
  *   - a FRESH temp dir per invocation leaks one corpus-sized artifact per
  *     bench sample (q121 writes ~5 B/vector each of ~9 samples per run);
  *   - one FIXED well-known path collides across concurrent processes
  *     (overwrite deletes the other run's files mid-read) and across
  *     users (overwrite cannot delete a foreign-owned dir).
  *
  * So: one root per (user, pid) — isolated across processes, overwritten
  * in place across invocations within one JVM (residue bounded at a
  * single copy per name), and removed by a shutdown hook when the JVM
  * exits. A SIGKILLed process never runs its hook, so root init also
  * SWEEPS siblings whose pid is dead ([[sweepStale]]) — the leak is then
  * bounded at one root per concurrently-live process instead of growing
  * with every hard-killed bench.
  */
object Scratch {
  /** Host tag in the root name: pid liveness is only decidable for THIS
    * host's pids, so the sweep must never consider another machine's
    * roots — on a tmpdir shared across hosts (NFS scratch) a local-pid
    * test would reap a remote machine's LIVE root mid-run.
    */
  private[graft] val hostTag: String =
    try java.net.InetAddress.getLocalHost.getHostName
      .replaceAll("[^A-Za-z0-9._]", "-").take(32)
    catch { case _: Throwable => "h" }

  private def prefix(user: String): String =
    s"graft-scratch-$user-$hostTag-"

  /** Delete sibling scratch roots left behind by DEAD processes of the
    * same user (same naming scheme, pid no longer alive). Only same-user
    * roots are candidates — a foreign user's root is both undeletable and
    * not ours to reap. Best-effort: a root that vanishes mid-sweep or a
    * non-numeric suffix is skipped, never fatal.
    */
  private[graft] def sweepStale(tmp: java.io.File, user: String): Unit =
    try {
      val pre = prefix(user)
      val self = ProcessHandle.current().pid()
      Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith(pre))
        .foreach { f =>
          f.getName.stripPrefix(pre).toLongOption.foreach { pid =>
            val alive = ProcessHandle.of(pid)
              .map[java.lang.Boolean](_.isAlive)
              .orElse(java.lang.Boolean.FALSE)
            if (pid != self && !alive) {
              new scala.reflect.io.Directory(f).deleteRecursively(); ()
            }
          }
        }
    } catch { case _: Throwable => () }

  private lazy val root: java.io.File = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val user = System.getProperty("user.name", "u")
    sweepStale(tmp, user)
    val d = new java.io.File(tmp, prefix(user) + ProcessHandle.current().pid())
    // a root already on disk under OUR pid is a dead predecessor's (pids
    // recycle; sweepStale skips pid == self) — adopting its contents would
    // serve stale artifacts (e.g. a canary binary built from old sources
    // that the !canExecute rebuild check would then trust). Start clean.
    if (d.exists()) { new scala.reflect.io.Directory(d).deleteRecursively(); () }
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      new scala.reflect.io.Directory(d).deleteRecursively(); ()
    }))
    d
  }

  /** A stable per-(process, name) path. */
  def dir(name: String): String = new java.io.File(root, name).toString
}
