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

  /** A real JPEG, generated in-memory with the same stdlib encoder a user
    * would have produced files with: a 64×48 gradient image. */
  private def realJpeg(w: Int = 64, h: Int = 48): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255) / (w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    out.toByteArray
  }

  test("real JPEG decode: true dims in metadata, stub only for unrecognized payloads") {
    val jpeg = realJpeg()
    assert(Multimodal.sniffFormat(jpeg) == "jpeg")
    val meta = Multimodal.decodeMeta("image", jpeg)
    assert(meta == Multimodal.MediaMeta(jpeg.length.toLong, "jpeg", 64, 48))
    // text bytes (the fixture payload shape) keep the declared stub route
    val textPayload = "plain fixture text".getBytes("UTF-8")
    assert(Multimodal.sniffFormat(textPayload).isEmpty)
    assert(Multimodal.decodeMeta("image", textPayload) ==
      Multimodal.decodeStub("image", textPayload))
    // corrupt stream: signature ok, body truncated -> None, stub fallback
    val truncated = jpeg.take(8)
    assert(Multimodal.decodeImage(truncated).isEmpty)
  }

  test("decode→gray→resize runs distributed and feeds the ImageOps kernels") {
    val jpeg = realJpeg()
    // the gradient survives decode: left column darker than right
    val g = Multimodal.decodeToGray(jpeg).get
    assert(g.w == 64 && g.h == 48)
    def px(gr: graft.functions.ImageOps.Gray, x: Int, y: Int): Int =
      gr.px(y * gr.w + x) & 0xff
    assert(px(g, 0, 24) < px(g, 63, 24),
      s"gradient lost: ${px(g, 0, 24)} !< ${px(g, 63, 24)}")
    // the typed-Dataset tensor map: real rows decode+resize to 224x224,
    // non-media rows drop (the reference's None-filter semantics)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", jpeg, Multimodal.decodeMeta("image", jpeg)),
      Multimodal.MediaRow(2L, "image", "not an image".getBytes("UTF-8"),
        Multimodal.decodeStub("image", Array[Byte](1, 2, 3))))
    val decoded = Multimodal.decodeResize(rows.toDS()).collect()
    assert(decoded.map(_.media_id).toSeq == Seq(1L))
    assert(decoded.head.width == 224 && decoded.head.height == 224)
    assert(decoded.head.pixels.length == 224 * 224)
    // and the plane composes with the U1 kernel (equalize keeps dims)
    val eq = graft.functions.ImageOps.equalizeHist(
      graft.functions.ImageOps.Gray(224, 224, decoded.head.pixels))
    assert(eq.w == 224 && eq.h == 224 && eq.px.length == 224 * 224)
  }

  test("U7 dHash: re-encoding invariant, brightness robust, distinct images far, banding exact") {
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out); out.toByteArray
    }
    def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out); out.toByteArray
    }
    def img(id: Long): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticImage(id)))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // PNG is lossless: same pixels, same hash, byte-different payloads
    val h0 = Multimodal.dHash64(Multimodal.syntheticImage(7L)).get
    assert(Multimodal.dHash64(png(img(7L))).get == h0)
    // JPEG round-trip is LOSSY: the perceptual claim is a small radius
    val hj = Multimodal.dHash64(jpeg(img(7L))).get
    assert(ham(h0, hj) <= 6, s"jpeg re-encode drifted ${ham(h0, hj)} bits")
    // brightness shift flips (almost) no gradient signs
    val hb = Multimodal.dHash64(Multimodal.syntheticImage(7L, brighten = 12)).get
    assert(ham(h0, hb) <= 6, s"brightness shift drifted ${ham(h0, hb)} bits")
    // distinct ids: id-seeded blocks are independent coin flips per bit
    val hashes = (0L until 30L).map(i => Multimodal.dHash64(Multimodal.syntheticImage(i)).get)
    val cross = for (i <- hashes.indices; j <- hashes.indices if i < j)
      yield ham(hashes(i), hashes(j))
    assert(cross.min > 15, s"unrelated synthetic images must sit far out: min=${cross.min}")
    // the banded join finds exactly the brute-force hamming pairs
    val media = (0L until 30L).map(i => (i, Multimodal.syntheticImage(i))) ++
      (0L until 10L).map(i => (i + 1000L, Multimodal.syntheticImage(i, brighten = 12)))
    val got = Multimodal.imageNearDupPairsFor(media.toDF("media_id", "payload"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == (0L until 10L).map(i => (i, i + 1000L)).toSet,
      s"banded pairs must be exactly the planted set: $got")
  }

  test("q223 WAV decode: round trip exact, chunk walk + pad rule honored, failure paths None") {
    // round trip: parse(build(id)) returns exactly the formula samples
    for (id <- Seq(0L, 1L, 3L, 7L)) {
      val w = Multimodal.decodeWav(Multimodal.syntheticWav(id)).get
      assert((w.sampleRate, w.channels, w.bits) == (8000, 1, 16))
      val want = Array.tabulate(256)(i =>
        (((id * 31L + i.toLong * 17L) % 2048L) - 1024L).toInt)
      assert(w.samples.sameElements(want), s"id=$id samples diverged")
      // the LIST metadata chunk (odd size -> pad byte) is skipped, and
      // ONLY on the planted ids — the walk is exercised, not lucky
      assert(w.skippedChunks == (if (id % 3 == 0) 1 else 0),
        s"id=$id skipped ${w.skippedChunks}")
    }
    // failure paths map to None, never a garbage parse
    val good = Multimodal.syntheticWav(5L)
    assert(Multimodal.decodeWav(good.take(40)).isEmpty, "truncation must fail")
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes).isEmpty,
      "wrong form type must fail")
    val nonPcm = good.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float -> not the PCM contract
    assert(Multimodal.decodeWav(nonPcm).isEmpty, "non-PCM must fail")
    // a crafted chunk size near Int.MaxValue must not wrap the bounds
    // check negative and index out of range (the r16 advice finding)
    val crafted = good.clone()
    crafted(16) = 0xff.toByte; crafted(17) = 0xff.toByte
    crafted(18) = 0xff.toByte; crafted(19) = 0x7f.toByte // fmt size = MaxInt
    assert(Multimodal.decodeWav(crafted).isEmpty,
      "overflowing chunk size must map to None, never a throw")
    // decodeMeta routes real WAVs through the parser (dims = shape)
    val meta = Multimodal.decodeMeta("audio", good)
    assert(meta.format == "wav" && meta.width == 256 && meta.height == 1,
      s"decodeMeta must carry the decoded shape: $meta")
    // and the fixture's text payloads still fall through to the stub
    val stub = Multimodal.decodeMeta("audio", "hello world".getBytes)
    assert(stub.format != "wav")
  }

  test("q229 MP4 decode: box walk exact on all planted edge paths, failure paths None") {
    // ids cover: plain (1), free-box skip (3), largesize moov (5),
    // mvhd v1 (7), and the triple overlap (0: skip+largesize+v1... 0
    // hits all three classes), plus 105 = 3·5·7
    for (id <- Seq(0L, 1L, 3L, 5L, 7L, 105L)) {
      val m = Multimodal.decodeMp4(Multimodal.syntheticMp4(id)).get
      assert(m.majorBrand == "isom" && m.timescale == 600L)
      assert(m.duration == (id * 37L) % 100000L + 600L, s"id=$id duration")
      assert(m.nTracks == 1 + (id % 3L).toInt, s"id=$id tracks")
      assert(m.mvhdVersion == (if (id % 7L == 0L) 1 else 0), s"id=$id v")
      assert(m.skippedBoxes == (if (id % 3L == 0L) 1 else 0), s"id=$id skip")
      assert(m.largesizeBoxes == (if (id % 5L == 0L) 1 else 0), s"id=$id ls")
    }
    // failure paths map to None, never a throw or a garbage parse
    val good = Multimodal.syntheticMp4(1L)
    assert(Multimodal.decodeMp4(good.take(20)).isEmpty, "truncation")
    assert(Multimodal.decodeMp4("not a movie file".getBytes).isEmpty,
      "wrong magic")
    // ftyp must be FIRST (ISO-BMFF: file-type box precedes everything)
    val freeFirst = java.nio.ByteBuffer.allocate(good.length + 8)
      .putInt(8).put("free".getBytes("US-ASCII")).put(good).array()
    assert(Multimodal.decodeMp4(freeFirst).isEmpty, "late ftyp")
    // a crafted size field of 0xffffffff (unsigned) must bound-check as
    // Long, map to None, and never index out of range
    val crafted = good.clone()
    crafted(16) = 0xff.toByte; crafted(17) = 0xff.toByte
    crafted(18) = 0xff.toByte; crafted(19) = 0xff.toByte
    assert(Multimodal.decodeMp4(crafted).isEmpty, "overflowing box size")
    // decodeMeta routes real MP4s: width ≙ tracks, height ≙ seconds
    val meta = Multimodal.decodeMeta("video", Multimodal.syntheticMp4(2L))
    assert(meta.format == "mp4" && meta.width == 3 &&
      meta.height == ((2L * 37L) % 100000L + 600L).toInt / 600,
      s"decodeMeta must carry the walked movie shape: $meta")
    // and text payloads still fall through to the stub untouched
    assert(Multimodal.decodeMeta("video", "hello world".getBytes)
      .format == "fake-mp4")
  }
}