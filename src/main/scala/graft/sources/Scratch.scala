package graft.sources

/** Per-process scratch directories for registered queries that must
  * materialize a data-sized artifact mid-query (q121's encoded index, the
  * q128–q130 interchange round trips).
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
  * exits.
  */
object Scratch {
  private lazy val root: java.io.File = {
    val d = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft-scratch-${System.getProperty("user.name", "u")}-" +
        s"${ProcessHandle.current().pid()}")
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      new scala.reflect.io.Directory(d).deleteRecursively(); ()
    }))
    d
  }

  /** A stable per-(process, name) path. */
  def dir(name: String): String = new java.io.File(root, name).toString
}
