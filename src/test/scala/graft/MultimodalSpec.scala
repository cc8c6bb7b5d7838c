package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.ingest(spark, TestSpark.Sf0001).cache()

  test("byte histogram partitions the payload: 16 bins summing to n_bytes") {
    val bad = Multimodal.features(media)
      .map(f => if (f.histogram.sum == f.n_bytes && f.histogram.size == 16) 0 else 1)
      .reduce(_ + _)
    assert(bad == 0)
  }

  test("frame sampling: every 4th 256-byte frame, correct count and tail-frame size") {
    val byMedia = Multimodal.sampleFrames(media)
      .as[(Long, Int, Int)].collect().groupBy(_._1)
    val lens = media.map(r => (r.media_id, r.payload.length)).collect().toMap
    assert(byMedia.nonEmpty)
    byMedia.foreach { case (id, frames) =>
      val l = lens(id)
      val nFrames = (l + 255) / 256
      assert(frames.map(_._2).sorted.toSeq == (0 until nFrames by 4).toSeq)
      frames.foreach { case (_, idx, nb) =>
        val expected = if (idx == nFrames - 1 && l % 256 != 0) l % 256 else 256
        assert(nb == expected, s"media $id frame $idx: $nb != $expected")
      }
    }
  }

  test("decode stub is deterministic and preserves byte length in metadata") {
    val bad = media.map(r => if (r.meta.n_bytes == r.payload.length) 0 else 1).reduce(_ + _)
    assert(bad == 0)
  }
}
