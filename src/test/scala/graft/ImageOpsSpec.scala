package graft

import graft.functions.ImageOps
import graft.functions.ImageOps.Gray
import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks (seeded random instances) for the pure image
  * kernels U1/U2 — the reference's core per-image math
  * (/root/reference/src/preprocessing_pipeline.py:33-100).
  */
class ImageOpsSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(7)

  private def randomImg(w: Int = 16, h: Int = 16): Gray = {
    val px = new Array[Byte](w * h); rnd.nextBytes(px); Gray(w, h, px)
  }

  test("equalizeHist maps full range: min level -> 0, max level -> 255 (100 random images)") {
    for (_ <- 1 to 100) {
      val img = randomImg()
      val out = ImageOps.equalizeHist(img)
      assert(out.px.length == img.px.length)
      val levels = img.px.map(_ & 0xff).distinct
      if (levels.length >= 2) {
        val outLevels = out.px.map(_ & 0xff)
        assert(outLevels.min == 0, "lowest occupied level must map to 0")
        assert(outLevels.max == 255, "highest occupied level must map to 255")
      }
    }
  }

  test("equalizeHist is monotone in pixel level") {
    val img = randomImg(32, 32)
    val out = ImageOps.equalizeHist(img)
    val mapping = img.px.zip(out.px).map { case (i, o) => (i & 0xff, o & 0xff) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    assert(mapping.values.forall(_.length == 1), "each input level maps to one output level")
    val lut = mapping.mapValues(_.head).toSeq.sortBy(_._1)
    assert(lut.sliding(2).forall { case Seq((_, a), (_, b)) => a <= b; case _ => true })
  }

  test("augmentVariants is deterministic: same seed => identical bytes, 9 variants") {
    val img = randomImg(32, 32)
    val a = ImageOps.augmentVariants(img, rowSeed = 12345L)
    val b = ImageOps.augmentVariants(img, rowSeed = 12345L)
    assert(a.size == 9 && b.size == 9)
    assert(a.map(_._1) == (0 until 9))
    a.zip(b).foreach { case ((i, ga), (_, gb)) =>
      assert(java.util.Arrays.equals(ga.px, gb.px), s"variant $i not deterministic")
    }
  }

  test("augmentVariants with different seeds differ (noise variants)") {
    val img = randomImg(32, 32)
    val a = ImageOps.augmentVariants(img, 1L)
    val b = ImageOps.augmentVariants(img, 2L)
    val anyDiff = a.zip(b).exists { case ((_, ga), (_, gb)) =>
      !java.util.Arrays.equals(ga.px, gb.px)
    }
    assert(anyDiff)
  }

  test("warpAffine identity transform preserves interior pixels") {
    val img = randomImg(16, 16)
    val out = ImageOps.warpAffine(img, deg = 0, scale = 1.0, tx = 0, ty = 0)
    for (y <- 1 until 15; x <- 1 until 15) {
      assert(out.px(y * 16 + x) == img.px(y * 16 + x), s"pixel ($x,$y) changed")
    }
  }

  test("flattenName matches the reference's /-to-_ flattening") {
    assert(ImageOps.flattenName("corpus/web/42.img", "aug3") == "aug3_corpus_web_42.img")
  }
}
