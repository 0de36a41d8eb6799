package graft

import graft.plans.Djb2Partitioner
import org.scalatest.funsuite.AnyFunSuite

/** X1 parity (SURVEY §2.3): the golden output was produced with 10 reducers,
  * so its lines must form exactly 10 contiguous blocks, each one a single
  * djb2(word) % 10 class — asserting our Scala djb2 routes identically to
  * the C binary without running it.
  */
class Djb2Spec extends AnyFunSuite {

  test("golden output is 10 contiguous djb2 % 10 blocks") {
    val words = GoldenOutput.wordsInOrder("/root/reference/output.txt")
    assert(words.nonEmpty)
    val parts = words.map(w => Djb2Partitioner.hashPartition(w, 10))
    // run-length encode the partition sequence
    val runs = parts.foldLeft(List.empty[Int]) {
      case (acc, p) if acc.headOption.contains(p) => acc
      case (acc, p) => p :: acc
    }.reverse
    assert(runs.size === 10, s"expected 10 blocks, got runs $runs")
    assert(runs.distinct.size === 10, "each reducer id appears exactly once")
  }

  test("partitioner maps keys into [0, n)") {
    val p = Djb2Partitioner(7)
    for (k <- Seq("", "a", "the", "0", "zzz", "café"))
      assert(p.getPartition(k) >= 0 && p.getPartition(k) < 7)
  }
}
