package graft

import graft.operators.{MediaRow, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Plumbing checks for the multimodal tier: binary round-trip fidelity,
  * feature shape, resize bound, frame sampling — everything real except the
  * decode math, which is an explicit stub.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("media table: binary payload round-trips byte-exact") {
    val rows = Multimodal.mediaTable(spark, dir).collect()
    assert(rows.length === 500)
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { m =>
      assert(new String(m.media, "UTF-8") === docs(m.media_id))
    }
  }

  test("feature extraction: 16-dim normalized histogram per asset") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
      .collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.features.length === 16)
      val sum = f.features.sum
      assert(math.abs(sum - 1.0f) < 1e-3, s"histogram should normalize, got $sum")
    }
  }

  test("real PNG decode through the mapPartitions path (javax.imageio)") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // two real PNGs: solid black (luminance 0 -> bin 0) and solid white
    // (luminance 255 -> bin 15)
    def png(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, rgb)
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    import spark.implicits._
    val media = Seq(
      MediaRow(0L, png(0x000000), 8, 4, "png"),
      MediaRow(1L, png(0xffffff), 8, 4, "png")).toDS()
    val feats = Multimodal.extractFeatures(media, Multimodal.decodeImage)
      .collect().sortBy(_.media_id)
    assert(feats.length === 2)
    assert(feats(0).features(0) === 1.0f)   // all-black pixels in bin 0
    assert(feats(1).features(15) === 1.0f)  // all-white pixels in bin 15
    feats.foreach(f => assert(math.abs(f.features.sum - 1.0f) < 1e-3))
  }

  test("resize bounds payload and is deterministic") {
    val resized = Multimodal.resize(Multimodal.mediaTable(spark, dir), 64)
    val a = resized.collect().map(r => r.media_id -> r.media.toSeq).toMap
    val b = resized.collect().map(r => r.media_id -> r.media.toSeq).toMap
    assert(a === b)
    a.values.foreach(bytes => assert(bytes.length <= 64))
  }

  test("frame sampling yields n frames of bounded size per asset") {
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaTable(spark, dir), frameBytes = 32, nFrames = 4)
    val counts = frames.groupBy("media_id").count().collect()
    assert(counts.forall(_.getLong(1) === 4))
    frames.collect().foreach { r =>
      assert(r.getAs[Array[Byte]]("frame").length <= 32)
    }
  }
}
