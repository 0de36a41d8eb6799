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
  def read(spark: SparkSession, files: Seq[String],
      slices: Option[Int] = None): Dataset[RawLine] = {
    import spark.implicits._
    // Ship the session's Hadoop config to executors (a bare `new
    // Configuration()` there would drop any non-default filesystem setup).
    val conf = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
    spark.sparkContext
      // `slices` caps the task count below one-per-file (several small
      // files stream through one task back-to-back) — pure scheduling
      // economy; per-file provenance is per-element, so semantics are
      // unchanged at any slicing
      .parallelize(files, slices.getOrElse(math.max(files.size, 1)))
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

  /** Split-aware line-numbered reader — the 100 TB path for S1 (SURVEY
    * §7.3): intra-file parallelism for huge files, where `read`'s
    * task-per-file model would serialize. Two passes over Hadoop text
    * splits:
    *
    *  1. count lines per (file, splitStart) — O(#splits) longs to the
    *     driver (split METADATA, not data, same class of state as a parquet
    *     footer index);
    *  2. per-file prefix-sum those counts, broadcast the (file, splitStart)
    *     -> firstLineOffset map, and stream each split assigning global
    *     line numbers from its offset.
    *
    * The same RDD object is used for both passes, so the split layout is
    * identical by construction. `maxSplitBytes` forces small splits in
    * tests (and is the knob real deployments size to HDFS-block scale).
    */
  def readSplitAware(spark: SparkSession, files: Seq[String],
      maxSplitBytes: Option[Long] = None): Dataset[RawLine] = {
    import spark.implicits._
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    maxSplitBytes.foreach { b =>
      conf.setLong("mapreduce.input.fileinputformat.split.maxsize", b)
    }
    val rdd = spark.sparkContext.newAPIHadoopFile(
      files.mkString(","), classOf[TextInputFormat],
      classOf[LongWritable], classOf[Text], conf)
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[LongWritable, Text]]
    // pass 1: lines per split
    val counts = rdd.mapPartitionsWithInputSplit { (split, it) =>
      val fs = split.asInstanceOf[FileSplit]
      Iterator(((fs.getPath.toUri.getPath, fs.getStart), {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      }))
    }.collect().toMap
    // per-file prefix sums -> first-line offset of each split
    val offsets: Map[(String, Long), Long] =
      counts.keys.groupBy(_._1).flatMap { case (_, ks) =>
        val sorted = ks.toSeq.sortBy(_._2)
        sorted.zip(sorted.scanLeft(0L)((acc, k) => acc + counts(k)))
          .map { case (k, off) => k -> off }
      }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: stream each split, numbering from its offset
    rdd.mapPartitionsWithInputSplit { (split, it) =>
      val fs = split.asInstanceOf[FileSplit]
      val file = fs.getPath.toUri.getPath
      var n = bc.value((file, fs.getStart))
      it.map { case (_, t) =>
        n += 1
        // fail loudly instead of wrapping negative past 2^31 lines — RawLine
        // keeps the reference's int linenum (mapreduce.c postings are int)
        require(n <= Int.MaxValue,
          s"$file exceeds Int.MaxValue lines; widen RawLine.linenum to Long")
        RawLine(file, n.toInt,
          new String(t.getBytes, 0, t.getLength, StandardCharsets.UTF_8))
      }
    }.toDS()
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
