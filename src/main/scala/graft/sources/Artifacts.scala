package graft.sources

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Run-level atomic commit protocol for chained artifact directories
  * (CurationRun's `verdicts/`, `index/`, `model/` — anything a later
  * `--incremental` / `--prev-run` / `--reuse-*` run reads as truth).
  *
  * The hazard this closes: every artifact used to be a plain
  * `mode=overwrite` parquet directory write straight under `outDir`. A
  * writer killed mid-overwrite leaves a half-written `verdicts/` or
  * `index/` — Spark's commit protocol is atomic per DIRECTORY, but a run
  * writes a dozen directories, and a crash between them leaves a torn SET
  * (new fates, old index) that the next chained run silently reads as a
  * consistent snapshot. At 100 TB with nightly incremental chains that is
  * a data-loss mode, not a hypothetical.
  *
  * Protocol (the classic versioned-write + pointer-swap):
  *
  *   - [[stage]] allocates `outDir/_versions/vNNNNN` (monotonic counter);
  *     the run writes EVERY artifact under that staging root;
  *   - [[commit]] publishes it by atomically swapping the single pointer
  *     file `outDir/_COMMITTED` (write temp + `FileContext.rename` with
  *     `Options.Rename.OVERWRITE` — atomic on the local FS and HDFS) to
  *     name the new version, then garbage-collects all versions except
  *     the new one and its predecessor (kept for readers that resolved
  *     the old pointer and are still scanning);
  *   - [[resolve]] maps a run root to its last COMMITTED version: a crash
  *     anywhere before the pointer swap leaves the pointer naming the
  *     prior complete version, so chained readers keep reading the old
  *     snapshot and never see a torn one. A directory with no pointer
  *     resolves to itself (legacy flat layouts and plain fixture dirs
  *     keep working unchanged).
  *
  * Consistency is ALL-artifacts-per-run by construction: one pointer
  * covers the whole version directory, so readers see either the complete
  * old run or the complete new one, never a mix. Concurrent writers to
  * one outDir are out of scope (exactly as they were under plain
  * overwrite); the counter + last-two GC makes the common crash/retry
  * loop safe, which is the operational case that matters.
  */
object Artifacts {
  private val VersionsDir = "_versions"
  private val PointerName = "_COMMITTED"

  /** Test-only crash injection: when set, [[commit]] throws AFTER all data
    * writes and BEFORE the pointer swap — the exact window the protocol
    * must survive. Never set outside specs.
    */
  private[graft] var crashBeforeCommit: Boolean = false

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Filesystems whose `FileContext.rename(OVERWRITE)` is a real atomic
    * metadata operation — the temp-in-same-dir + rename publish applies.
    */
  private val AtomicRenameSchemes = Set("file", "hdfs", "viewfs", null: String)

  /** Object stores, where rename is emulated as copy+delete (or has no
    * AbstractFileSystem binding at all) but a single-object write IS the
    * atomic publish: the pointer object becomes visible as a whole at
    * `close()` (one PUT — S3/GCS/ABFS never expose a torn object body, and
    * S3 is read-after-write consistent since 2020). So [[commit]] publishes
    * the pointer here by writing it DIRECTLY with overwrite, no temp, no
    * rename — the rename-emulation hazard the old guard refused on simply
    * never enters the path. Readers see the old pointer or the new one.
    *
    * Last-writer-wins on the pointer is sufficient under the protocol's
    * stated single-writer-per-outDir contract (scaladoc above). A real
    * deployment hardening that contract against split-brain writers would
    * use the store's conditional PUT (S3 If-None-Match / GCS generation
    * preconditions) via the vendor SDK — deliberately out of scope for a
    * Hadoop-FileSystem-portable engine; documented, not emulated.
    */
  private val ObjectStoreSchemes =
    Set("s3a", "s3", "gs", "abfs", "abfss", "oss", "cosn", "wasb", "wasbs",
      "mocks3" /* test scheme: ArtifactsObjectStoreSpec's RawLocal shim */)

  private[sources] def isObjectStore(p: Path): Boolean =
    ObjectStoreSchemes.contains(p.toUri.getScheme)

  private def requireSupportedFs(p: Path): Unit = {
    val scheme = p.toUri.getScheme
    require(AtomicRenameSchemes.contains(scheme) || isObjectStore(p),
      s"Artifacts commit protocol needs either an atomic-rename filesystem " +
        s"(local/HDFS/viewfs) or a known object store (${ObjectStoreSchemes
          .filter(_ != "mocks3").toSeq.sorted.mkString("/")}); '$p' uses " +
        s"scheme '$scheme' — refusing at stage() time so no work is wasted.")
  }

  /** Pointer temps younger than this survive stage()'s straggler sweep.
    * The whole protocol assumes ONE writer per outDir (scaladoc above:
    * concurrent writers are out of scope, as under plain overwrite) — but
    * a sweep that deletes EVERY `_COMMITTED.tmp.*` would turn a violation
    * of that assumption into a silent failed rename in the OTHER writer's
    * commit (ADVICE r17). The age threshold keeps the sweep's real target
    * (temps orphaned by a long-dead writer, which a crash/retry loop
    * otherwise accumulates forever) while a temp created seconds ago by a
    * live commit is left alone.
    */
  private val TempSweepAgeMs: Long = 10 * 60 * 1000L

  /** Allocate the next staging root under `outDir` and create it. Also
    * sweeps `_COMMITTED.tmp.*` stragglers OLDER than [[TempSweepAgeMs]] —
    * temps a writer left by dying between pointer-temp creation and the
    * rename; commit's GC only covers `_versions/`, so without this a
    * crash/retry loop accumulates stray pointer temps at the artifact
    * root forever. Single-writer-per-outDir is the protocol's stated
    * contract; the age threshold merely keeps an accidental violation
    * from failing another writer's in-flight rename.
    */
  def stage(spark: SparkSession, outDir: String): String = {
    val versions = new Path(outDir, VersionsDir)
    requireSupportedFs(versions) // before getFileSystem: the message
    // must be this protocol's, not a ClassNotFound for a store connector
    val f = fs(spark, versions)
    val root = new Path(outDir)
    if (f.exists(root)) {
      val cutoff = System.currentTimeMillis() - TempSweepAgeMs
      f.listStatus(root).foreach { s =>
        if (s.getPath.getName.startsWith(s"$PointerName.tmp.") &&
            s.getModificationTime < cutoff) {
          f.delete(s.getPath, false); ()
        }
      }
    }
    val next =
      if (!f.exists(versions)) 1L
      else f.listStatus(versions).iterator.flatMap(s =>
        s.getPath.getName.stripPrefix("v").toLongOption).foldLeft(0L)(
        math.max) + 1L
    val staged = new Path(versions, f"v$next%05d")
    f.mkdirs(staged)
    staged.toString
  }

  /** Atomically publish `stagedPath` as `outDir`'s committed version, then
    * GC every version except the newest `keepVersions` (the new one plus
    * `keepVersions - 1` predecessors, kept for readers that resolved an
    * old pointer and are still scanning).
    *
    * `keepVersions` comes from `graft.artifacts.keepVersions` (default 2).
    * The reader window is therefore `keepVersions - 1` COMMITS: a chained
    * reader that resolved version N keeps its files until commit N+keep
    * lands on the same outDir. Multi-hour readers under frequent commits
    * should raise the knob on the WRITER's session — documented at the
    * CLI flags that chain runs (`--prev-run` / `--reuse-index`).
    */
  def commit(spark: SparkSession, outDir: String, stagedPath: String): Unit = {
    if (crashBeforeCommit)
      throw new IllegalStateException(
        "injected crash between artifact writes and pointer swap (test)")
    val version = new Path(stagedPath).getName
    val pointer = new Path(outDir, PointerName)
    val f = fs(spark, pointer)
    val previous = readPointer(f, pointer)
    val keepVersions = math.max(2,
      spark.conf.getOption("graft.artifacts.keepVersions")
        .flatMap(_.toIntOption).getOrElse(2))
    if (isObjectStore(pointer)) {
      // object store: the single-object PUT is the atomic publish — the
      // pointer becomes visible as a whole at close(); writing a temp and
      // renaming would REINTRODUCE the copy+delete torn window the old
      // scheme guard refused on (see ObjectStoreSchemes)
      val out = f.create(pointer, true)
      try out.write(version.getBytes("UTF-8")) finally out.close()
    } else {
      // atomic-rename FS: temp-in-same-dir + rename-with-overwrite = the
      // atomic publish (create+write+close is NOT atomic for HDFS readers,
      // which can see a partial pointer body — the exact inverse of the
      // object-store case); a reader of _COMMITTED sees the old content or
      // the new, never a torn write
      val tmp = new Path(outDir,
        s"$PointerName.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
      val out = f.create(tmp, true)
      try out.write(version.getBytes("UTF-8")) finally out.close()
      FileContext.getFileContext(pointer.toUri,
          spark.sparkContext.hadoopConfiguration)
        .rename(tmp, pointer, Options.Rename.OVERWRITE)
    }
    // GC: crashed stages and superseded versions. Crashed stages are
    // exactly the dirs numbered strictly between the previous committed
    // version and the new one (stage() allocates max+1, so every number a
    // retry loop burned sits in that gap) — always deleted. Among the
    // committed survivors (numbers <= previous), keep the newest
    // `keepVersions - 1` for in-flight readers; the new version completes
    // the window.
    def num(n: String): Long = n.stripPrefix("v").toLongOption.getOrElse(-1L)
    val prevNum = previous.map(num).getOrElse(Long.MinValue)
    val versions = new Path(outDir, VersionsDir)
    val names = f.listStatus(versions).map(_.getPath.getName)
    val keptCommitted = names.filter(n => num(n) <= prevNum)
      .sortBy(n => -num(n)).take(keepVersions - 1).toSet
    val keep = keptCommitted ++ Set(version) ++ previous
    names.foreach { n =>
      if (!keep(n)) { f.delete(new Path(versions, n), true); () }
    }
  }

  /** Read the pointer file FULLY (loop to EOF): a single `read()` may
    * legally return a short read on remote filesystems, truncating the
    * version name — resolve() would then fail (or match a wrong shorter
    * name) on a perfectly committed pointer.
    */
  private def readPointer(f: FileSystem, pointer: Path): Option[String] =
    if (!f.exists(pointer)) None
    else {
      val in = f.open(pointer)
      try {
        val bytes = new Array[Byte](256)
        var total = 0
        var n = 0
        while (n >= 0 && total < bytes.length) {
          n = in.read(bytes, total, bytes.length - total)
          if (n > 0) total += n
        }
        Some(new String(bytes, 0, total, "UTF-8").trim).filter(_.nonEmpty)
      } finally in.close()
    }

  /** The directory a READER of `dir`'s artifacts should scan: the last
    * committed version when the pointer exists, `dir` itself otherwise
    * (legacy flat layout / plain fixture dirs). Fails loudly when the
    * pointer names a version that is gone — truth, not a guess.
    */
  def resolve(spark: SparkSession, dir: String): String = {
    val pointer = new Path(dir, PointerName)
    val f = fs(spark, pointer)
    readPointer(f, pointer) match {
      case None => dir
      case Some(v) =>
        val resolved = new Path(new Path(dir, VersionsDir), v)
        require(f.exists(resolved),
          s"$dir/$PointerName names version $v but $resolved is missing — " +
            "the artifact chain is broken; re-run the producing job")
        resolved.toString
    }
  }
}
