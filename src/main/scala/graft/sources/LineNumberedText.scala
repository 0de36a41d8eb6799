package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** A line of input with file + 1-based line-number provenance — the
  * reference's S1 scan (mapreduce.c:97-109: fgets loop with a per-file
  * `linenum` counter).
  */
case class RawLine(filename: String, linenum: Int, line: String)

/** Line-numbered text source (SURVEY §2.1 S1).
  *
  * Spark's splittable text source cannot expose intra-file line numbers (a
  * split doesn't know how many newlines precede it), so this source trades
  * intra-file parallelism for provenance: one task per file, exactly the
  * reference's parallelism model (one producer thread per file,
  * mapreduce.c:307-313). At 100 TB this holds as long as the *file count*
  * provides the parallelism (it does for corpus-style inputs: many files,
  * bounded file size) — `read` streams each file, never materializing it.
  */
object LineNumberedText {

  /** Streaming reader: one input partition per file, lines streamed through
    * a BufferedReader with a running counter — constant memory per task
    * regardless of file size. Line terminators (\n, \r\n) are stripped like
    * BufferedReader does; the reference's fgets keeps the bare \r but its
    * normalizer truncates it away (mapreduce.c:56-61), so the postings
    * semantics are identical (verified by the golden spec).
    */
  def read(spark: SparkSession, files: Seq[String]): Dataset[RawLine] = {
    import spark.implicits._
    // Ship the session's Hadoop config to executors (a bare `new
    // Configuration()` there would drop any non-default filesystem setup).
    val conf = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
    spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { file =>
        val path = new Path(file)
        val fs = path.getFileSystem(conf.value.value)
        val br = new BufferedReader(
          new InputStreamReader(fs.open(path), StandardCharsets.UTF_8))
        // Close on task completion too — a limit() or failure leaves the
        // iterator unexhausted, which would otherwise leak the handle.
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => br.close()))
        var n = 0
        Iterator
          .continually(br.readLine())
          .takeWhile { l => if (l == null) { br.close(); false } else true }
          .map { l => n += 1; RawLine(file, n, l) }
      }
      .toDS()
  }

  /** List `*.txt` files under a directory (driver-side metadata op only). */
  def listTextFiles(dir: String): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(new Configuration())
    fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".txt"))
      .map(_.getPath.toUri.getPath)
      .sorted
      .toSeq
  }
}
