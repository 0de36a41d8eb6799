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
