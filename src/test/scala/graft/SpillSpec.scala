package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forces the two documented memory-pressure paths (A1 mega-key
  * aggregation fallback, window buffer disk spill) and certifies both
  * answers bit-identical to the in-memory paths — see [[SpillCheck]].
  * The forced run needs static confs (the sorter force-spill threshold),
  * so it executes in a forked JVM assembled from THIS test JVM's
  * classpath; the reference checksums come from the shared (normal,
  * non-spilling) session running the same queries.
  */
class SpillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("forced fallback + window disk spill keep the exact result checksums") {
    val wantAgg = SpillCheck.checksum(
      operators.InvertedIndex.documentsIndexSalted(spark, sfDir))
    val wantWin = SpillCheck.checksum(
      operators.Relational.q09(spark, sfDir))
    assert(wantAgg._1 > 0 && wantWin._1 > 0, "fixture produced no rows")

    // same add-opens set build.sbt injects (JavaModuleOptions.default)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(java, "-Xmx6g", "-cp", System.getProperty("java.class.path")) ++
      addOpens ++ Seq("-Dspark.ui.enabled=false", "graft.SpillCheck", sfDir)
    val out = new StringBuilder
    val code = scala.sys.process.Process(cmd)
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    val json = out.toString.linesIterator
      .find(_.startsWith("{\"q01b_rows\""))
      .getOrElse(fail(s"no JSON line from SpillCheck (exit $code):\n$out"))
    assert(code === 0,
      s"SpillCheck failed, fell back nowhere, or spilled nothing (exit $code): $json")
    def field(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1).toLong).getOrElse(fail(s"no $k in $json"))
    // the forced paths actually ran…
    assert(field("fallback_tasks") > 0, s"agg never fell back: $json")
    assert(field("disk_spill") > 0, s"nothing reached disk: $json")
    // …and changed nothing
    assert((field("q01b_rows"), field("q01b_checksum")) === wantAgg,
      s"sort-based fallback drifted q01b: $json vs $wantAgg")
    assert((field("q09_rows"), field("q09_checksum")) === wantWin,
      s"window spill drifted q09: $json vs $wantWin")
  }
}
