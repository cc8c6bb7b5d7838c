package graft

import graft.functions.ImageOps
import graft.functions.ImageOps.Gray
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure kernels (SURVEY §5.2 item 3) —
  * runs under sbt's native ScalaCheck integration, no Spark session.
  */
object KernelProps extends Properties("graft.kernels") {

  private val imgGen: Gen[Gray] = for {
    bytes <- Gen.containerOfN[Array, Byte](256, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield Gray(16, 16, bytes)

  property("equalizeHist preserves pixel count and byte range") =
    Prop.forAll(imgGen) { img =>
      val out = ImageOps.equalizeHist(img)
      out.px.length == img.px.length
    }

  property("equalizeHist spans [0,255] when >=2 levels occupied") =
    Prop.forAll(imgGen) { img =>
      val levels = img.px.map(_ & 0xff).distinct
      val out = ImageOps.equalizeHist(img).px.map(_ & 0xff)
      levels.length < 2 || (out.min == 0 && out.max == 255)
    }

  property("equalizeHist is idempotent on its own output's extremes") =
    Prop.forAll(imgGen) { img =>
      // equalizing twice still spans the full range (stability, not drift)
      val once = ImageOps.equalizeHist(img)
      val twice = ImageOps.equalizeHist(once)
      val l1 = once.px.map(_ & 0xff); val l2 = twice.px.map(_ & 0xff)
      l1.distinct.length < 2 || (l2.min == 0 && l2.max == 255)
    }

  property("augmentVariants: deterministic per seed, 9 indexed variants") =
    Prop.forAll(imgGen, Gen.long) { (img, seed) =>
      val a = ImageOps.augmentVariants(img, seed)
      val b = ImageOps.augmentVariants(img, seed)
      a.map(_._1) == (0 until 9) &&
        a.zip(b).forall { case ((_, x), (_, y)) => java.util.Arrays.equals(x.px, y.px) }
    }

  property("warpAffine output size equals input size for any params") =
    Prop.forAll(imgGen, Gen.choose(-45.0, 45.0), Gen.choose(0.5, 2.0)) { (img, deg, scale) =>
      ImageOps.warpAffine(img, deg, scale, 0, 0).px.length == img.px.length
    }

  property("resize yields exactly newW*newH pixels for any target size") =
    Prop.forAll(imgGen, Gen.choose(1, 48), Gen.choose(1, 48)) { (img, w, h) =>
      val out = ImageOps.resize(img, w, h)
      out.w == w && out.h == h && out.px.length == w * h
    }

  property("identity resize preserves EVERY pixel, borders included") =
    Prop.forAll(imgGen) { img =>
      // the half-pixel mapping at scale 1 lands exactly on source pixels,
      // and edge clamping means border pixels are fetched, not zero-filled
      ImageOps.resize(img, 16, 16).px.sameElements(img.px)
    }

  property("upscale of a constant image is constant everywhere, borders included") =
    Prop.forAll(Gen.choose(Byte.MinValue, Byte.MaxValue),
      Gen.choose(17, 48), Gen.choose(17, 48)) { (v, w, h) =>
      val img = Gray(16, 16, Array.fill(256)(v))
      ImageOps.resize(img, w, h).px.forall(_ == v)
    }

  private val fragGen: Gen[String] =
    Gen.choose(30, 120).flatMap(n => Gen.stringOfN(n, Gen.alphaChar))

  property("winnow: a shared run of k+w-1 chars guarantees a shared fingerprint") =
    Prop.forAll(fragGen, fragGen, fragGen, fragGen,
      Gen.stringOfN(16 + 8 - 1, Gen.alphaChar)) { (a, b, c, d, shared) =>
      // SIGMOD'03 detection guarantee: the shared run holds w consecutive
      // identical k-gram hashes — one full window — whose minimum both
      // documents must select, wherever the run sits
      val f1 = graft.operators.Dedup.winnow(a + shared + b).toSet
      val f2 = graft.operators.Dedup.winnow(c + shared + d).toSet
      (f1 & f2).nonEmpty
    }

  property("winnow: deterministic, and empty below one k-gram") =
    Prop.forAll(fragGen) { s =>
      graft.operators.Dedup.winnow(s).sameElements(graft.operators.Dedup.winnow(s)) &&
        graft.operators.Dedup.winnow(s.take(15)).isEmpty
    }

  property("flattenName never contains '/' after the prefix") =
    Prop.forAll(Gen.listOf(Gen.alphaNumStr), Gen.alphaNumStr) { (segs, prefix) =>
      val path = segs.mkString("/")
      !ImageOps.flattenName(path, prefix).drop(prefix.length + 1).contains('/')
    }

  property("WAV build->parse round trip is lossless for any (id, n, rate)") =
    Prop.forAll(Gen.long, Gen.choose(1, 2048), Gen.choose(1, 192000)) {
      (id, n, rate) =>
        import graft.multimodal.Multimodal
        val w = Multimodal.decodeWav(Multimodal.syntheticWav(id, n, rate)).get
        w.sampleRate == rate && w.channels == 1 && w.bits == 16 &&
          w.samples.length == n &&
          w.skippedChunks == (if (id % 3 == 0) 1 else 0) &&
          w.samples.zipWithIndex.forall { case (s, i) =>
            s == (((id * 31L + i.toLong * 17L) % 2048L) - 1024L).toInt
          }
    }

  property("WAV parser totals on arbitrary bytes: None or a parse, never a throw") =
    Prop.forAll(Gen.containerOfN[Array, Byte](64,
        Gen.choose(Byte.MinValue, Byte.MaxValue))) { junk =>
      // random blobs essentially never carry RIFF+WAVE+fmt+data; the
      // contract under test is TOTALITY — malformed input maps to None
      // (or a well-formed parse), never an exception
      val r = scala.util.Try(graft.multimodal.Multimodal.decodeWav(junk))
      r.isSuccess
    }

  property("MP4 build->parse round trip is lossless for any (id, timescale, duration, tracks)") =
    Prop.forAll(Gen.long, Gen.choose(1L, 1000000L), Gen.choose(0L, 1L << 40),
        Gen.choose(0, 16)) { (id, ts, dur, nTracks) =>
      import graft.multimodal.Multimodal
      // durations past 2^32 force the v1/largesize-safe paths on their
      // planted id classes; v0 ids clamp duration into 32 bits
      val d = if (id % 7L == 0L) dur else dur % (1L << 31)
      val m = Multimodal.decodeMp4(Multimodal.syntheticMp4(
        id, ts, _ => d, _ => nTracks)).get
      m.majorBrand == "isom" && m.timescale == ts && m.duration == d &&
        m.nTracks == nTracks &&
        m.mvhdVersion == (if (id % 7L == 0L) 1 else 0) &&
        m.skippedBoxes == (if (id % 3L == 0L) 1 else 0) &&
        m.largesizeBoxes == (if (id % 5L == 0L) 1 else 0)
    }

  property("MP4 walker totals on arbitrary bytes: None or a parse, never a throw") =
    Prop.forAll(Gen.containerOfN[Array, Byte](64,
        Gen.choose(Byte.MinValue, Byte.MaxValue))) { junk =>
      scala.util.Try(graft.multimodal.Multimodal.decodeMp4(junk)).isSuccess
    }

  property("MP4 walker totals on crafted ftyp-prefixed garbage") =
    Prop.forAll(Gen.containerOfN[Array, Byte](56,
        Gen.choose(Byte.MinValue, Byte.MaxValue))) { tail =>
      // adversarial shape: a VALID ftyp header followed by garbage boxes
      // — the walk must reject malformed/overflowing sizes via None
      val head = java.nio.ByteBuffer.allocate(16)
        .putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0).array()
      scala.util.Try(
        graft.multimodal.Multimodal.decodeMp4(head ++ tail)).isSuccess
    }
}
