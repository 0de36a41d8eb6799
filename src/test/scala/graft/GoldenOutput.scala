package graft

import scala.io.Source

/** Parser for the reference's golden output
  * (/root/reference/output.txt: `word: (file: line), (file: line), ...`).
  * Order of lines and of cross-file postings is nondeterministic in the
  * reference (SURVEY §1.4), so consumers compare multisets / per-file order
  * only.
  */
object GoldenOutput {
  private val posting = """\(([^:()]+): (\d+)\)""".r

  /** All (word, filename, linenum) postings, in file order. */
  def postings(path: String): Seq[(String, String, Int)] = {
    val src = Source.fromFile(path, "UTF-8")
    try {
      src.getLines().flatMap { line =>
        val i = line.indexOf(": ")
        if (i <= 0) Iterator.empty
        else {
          val word = line.substring(0, i)
          posting.findAllMatchIn(line.substring(i + 2)).map { m =>
            (word, m.group(1), m.group(2).toInt)
          }
        }
      }.toVector
    } finally src.close()
  }

  /** Distinct words in golden output order (reference emission order). */
  def wordsInOrder(path: String): Seq[String] = {
    val src = Source.fromFile(path, "UTF-8")
    try src.getLines().flatMap { line =>
      val i = line.indexOf(": ")
      if (i <= 0) None else Some(line.substring(0, i))
    }.toVector
    finally src.close()
  }
}
