package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MultiModal

class MultiModalSpec extends AnyFunSuite with SparkSpec {

  test("media table synthesizes typed binary records") {
    val m = MultiModal.mediaTable(spark, sf)
    assert(m.count() === 500)
    val r = m.head()
    assert(r.payload.nonEmpty)
    assert(Set("image", "audio", "video")(r.format))
  }

  test("feature extraction is deterministic and complete") {
    val f1 = MultiModal.extractFeatures(MultiModal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f).toMap
    val f2 = MultiModal.extractFeatures(MultiModal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f).toMap
    assert(f1.size === 500)
    assert(f1.keySet === f2.keySet)
    for ((id, f) <- f1) {
      assert(f.n_bytes > 0)
      assert(f.mean_byte > 0.0)
      assert(f.head_hex === f2(id).head_hex)
    }
  }

  test("frame sampling emits every 4th 64-byte chunk of video payloads") {
    val media = MultiModal.mediaTable(spark, sf)
    val videos = media.filter(_.format == "video").collect()
    val frames = MultiModal.sampleFrames(media).collect()
    val perMedia = frames.groupBy(_.media_id)
    assert(perMedia.keySet === videos.map(_.media_id).toSet)
    for (v <- videos) {
      val nChunks = (v.payload.length + 63) / 64
      val expected = (0 until nChunks).count(_ % 4 == 0)
      assert(perMedia(v.media_id).length === expected)
    }
  }
}
