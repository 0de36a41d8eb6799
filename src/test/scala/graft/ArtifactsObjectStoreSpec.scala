package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** Test stand-in for an object store: local storage, object-store scheme,
  * and a rename() that THROWS — on S3/GCS rename is copy+delete (or has no
  * AbstractFileSystem binding at all), so the spec's contract is that the
  * artifact publish path never calls it. Registered under `mocks3` (listed
  * in Artifacts.ObjectStoreSchemes for exactly this spec).
  */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException(
      "object-store rename is copy+delete — the publish path must not call it")
}

/** The object-store leg of the Artifacts commit protocol (VERDICT r17
  * missing #3): on object-store schemes the pointer publishes via a single
  * direct write (one PUT, atomic-visible at close) instead of temp+rename.
  * Exercised end-to-end against [[MockS3FileSystem]] — stage → write →
  * commit → resolve, crash-window survival, GC — with rename booby-trapped.
  */
class ArtifactsObjectStoreSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.mocks3.impl", classOf[MockS3FileSystem].getName)
    s
  }

  private def mkRoot(): String =
    "mocks3://" + java.nio.file.Files
      .createTempDirectory("art_objstore").toString

  private def readTag(out: String): String = {
    val resolved = graft.sources.Artifacts.resolve(spark, out)
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(resolved).getPath, "tag.txt")),
      "UTF-8")
  }

  private def publish(out: String, tag: String): Unit = {
    val staged = graft.sources.Artifacts.stage(spark, out)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(new java.net.URI(staged).getPath, "tag.txt"),
      tag.getBytes("UTF-8"))
    graft.sources.Artifacts.commit(spark, out, staged)
  }

  test("object-store publish: single-object pointer PUT, no rename, crash-safe") {
    val out = mkRoot()
    // first commit publishes v1 through the PUT path (rename would throw)
    publish(out, "one")
    assert(readTag(out) === "one")

    // crash BETWEEN artifact writes and the pointer swap: readers keep v1
    graft.sources.Artifacts.crashBeforeCommit = true
    try {
      intercept[IllegalStateException] { publish(out, "torn") }
    } finally graft.sources.Artifacts.crashBeforeCommit = false
    assert(readTag(out) === "one",
      "a crash before the pointer PUT must leave readers on the old version")

    // next successful commit supersedes and GCs the crashed staging dir
    publish(out, "two")
    assert(readTag(out) === "two")
    val versions = new java.io.File(
      new java.net.URI(out + "/_versions").getPath)
    assert(versions.listFiles().map(_.getName).sorted.toSeq ===
      Seq("v00001", "v00003"),
      "GC must keep exactly {committed, prior committed} on the store too")

    new scala.reflect.io.Directory(
      new java.io.File(new java.net.URI(out).getPath)).deleteRecursively()
  }

  test("unknown schemes still fail fast at stage()") {
    val e = intercept[IllegalArgumentException] {
      graft.sources.Artifacts.stage(spark, "ftp://host/run")
    }
    assert(e.getMessage.contains("refusing at stage() time"),
      s"stage() on an unsupported scheme must refuse with the protocol's message, got: $e")
  }
}
