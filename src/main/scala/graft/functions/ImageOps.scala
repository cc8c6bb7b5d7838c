package graft.functions

/** Pure-JVM grayscale image ops (SURVEY §2.7 U1/U2). The reference does
  * these inside side-effecting Python UDFs (cv2.equalizeHist at
  * /root/reference/src/preprocessing_pipeline.py:39-51; random
  * rotate/affine/noise augments at :65-100) with files written from inside
  * the UDF. Here they are pure `Array[Byte] => Array[Byte]` functions:
  * deterministic (seeded per-row), retry-safe under speculative execution,
  * and sink-agnostic — the engine writes results through a proper sink
  * (SURVEY §4.2 item 5).
  *
  * Images are dense row-major grayscale byte planes (width × height), the
  * same layout cv2.IMREAD_GRAYSCALE yields.
  */
object ImageOps {

  final case class Gray(w: Int, h: Int, px: Array[Byte]) {
    require(px.length == w * h, s"pixel buffer ${px.length} != $w*$h")
  }

  /** U1 — histogram equalization (cv2.equalizeHist semantics: map each
    * level through the normalized CDF of the 256-bin histogram).
    */
  def equalizeHist(img: Gray): Gray = {
    val hist = new Array[Long](256)
    img.px.foreach(b => hist(b & 0xff) += 1)
    val total = img.px.length.toLong
    // cv2 normalizes by (total - cdf(min_nonzero_bin)) and maps to 0..255
    val cdf = new Array[Long](256)
    var acc = 0L
    var i = 0
    while (i < 256) { acc += hist(i); cdf(i) = acc; i += 1 }
    val cdfMin = cdf.find(_ > 0).getOrElse(0L)
    val denom = math.max(total - cdfMin, 1L)
    val lut = new Array[Byte](256)
    i = 0
    while (i < 256) {
      lut(i) = math.round((cdf(i) - cdfMin).toDouble / denom * 255.0).toInt
        .max(0).min(255).toByte
      i += 1
    }
    Gray(img.w, img.h, img.px.map(b => lut(b & 0xff)))
  }

  /** Deterministic per-row RNG: splitmix64 over a seed derived from the
    * row key — retries reproduce identical pixels (the reference's unseeded
    * np.random draws do not; SURVEY §4.2 item 5).
    */
  private def splitmix64(state: Long): (Long, Long) = {
    val z0 = state + 0x9e3779b97f4a7c15L
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z0, z ^ (z >>> 31))
  }

  private def nextDouble(seed: Long): (Long, Double) = {
    val (s, v) = splitmix64(seed)
    (s, (v >>> 11).toDouble / (1L << 53).toDouble)
  }

  /** Bilinear sample with constant-0 border for points OUTSIDE the image
    * (cv2 BORDER_CONSTANT — what warpAffine's rotation voids need) and
    * edge-clamped corner fetches for points ON it: a sample anywhere in
    * [0, w-1]×[0, h-1] — including the last row/column — interpolates real
    * pixels and never reads the synthetic 0 border.
    */
  private def sampleBilinear(img: Gray, x: Double, y: Double): Int = {
    if (x < 0 || y < 0 || x > img.w - 1 || y > img.h - 1) 0
    else {
      val xi = math.floor(x).toInt; val yi = math.floor(y).toInt
      val fx = x - xi; val fy = y - yi
      def p(cx: Int, cy: Int): Int =
        img.px(math.min(cy, img.h - 1) * img.w + math.min(cx, img.w - 1)) & 0xff
      math.round(
        p(xi, yi) * (1 - fx) * (1 - fy) + p(xi + 1, yi) * fx * (1 - fy) +
          p(xi, yi + 1) * (1 - fx) * fy + p(xi + 1, yi + 1) * fx * fy).toInt
    }
  }

  /** Affine warp: rotate by `deg` about the center, scale, translate. */
  def warpAffine(img: Gray, deg: Double, scale: Double, tx: Double, ty: Double): Gray = {
    val rad = math.toRadians(deg)
    val c = math.cos(rad) / scale; val s = math.sin(rad) / scale
    val cx = img.w / 2.0; val cy = img.h / 2.0
    val out = new Array[Byte](img.px.length)
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        val dx = x - cx - tx; val dy = y - cy - ty
        val sx = c * dx + s * dy + cx
        val sy = -s * dx + c * dy + cy
        out(y * img.w + x) = sampleBilinear(img, sx, sy).max(0).min(255).toByte
        x += 1
      }
      y += 1
    }
    Gray(img.w, img.h, out)
  }

  /** Gaussian noise via Box–Muller on the splitmix stream. */
  def addGaussianNoise(img: Gray, sigma: Double, seed: Long): Gray = {
    val out = new Array[Byte](img.px.length)
    var s = seed
    var i = 0
    while (i < img.px.length) {
      val (s1, u1) = nextDouble(s)
      val (s2, u2) = nextDouble(s1)
      s = s2
      val g = math.sqrt(-2.0 * math.log(math.max(u1, 1e-12))) * math.cos(2 * math.Pi * u2)
      out(i) = ((img.px(i) & 0xff) + g * sigma).round.toInt.max(0).min(255).toByte
      i += 1
    }
    Gray(img.w, img.h, out)
  }

  /** Bilinear resize to (newW × newH) — the thumbnail/downsample step of a
    * media pipeline (pairs with the frame sampler and feature extractor in
    * graft.multimodal). Pure and deterministic like every kernel here.
    */
  def resize(img: Gray, newW: Int, newH: Int): Gray = {
    require(newW > 0 && newH > 0, s"resize target must be positive, got ${newW}x$newH")
    val out = new Array[Byte](newW * newH)
    val sx = img.w.toDouble / newW
    val sy = img.h.toDouble / newH
    var y = 0
    while (y < newH) {
      var x = 0
      while (x < newW) {
        // sample at the source-space center of each target pixel, clamped
        // into the image: the half-pixel mapping puts border-pixel centers
        // slightly outside [0, w-1], where resize semantics (cv2) replicate
        // the edge rather than blend with a constant border
        val gx = math.min(math.max((x + 0.5) * sx - 0.5, 0.0), img.w - 1.0)
        val gy = math.min(math.max((y + 0.5) * sy - 0.5, 0.0), img.h - 1.0)
        val px = sampleBilinear(img, gx, gy)
        out(y * newW + x) = px.max(0).min(255).toByte
        x += 1
      }
      y += 1
    }
    Gray(newW, newH, out)
  }

  /** U2 — the reference's 9-variant augmentation
    * (/root/reference/src/preprocessing_pipeline.py:77-98): 3 rotations
    * ±5°, 3 scale-0.9..1.1 + translate-±3px, 3 gaussian-noise adds — but
    * parameterized from the seed, so variant i of row r is a pure function
    * of (r, i).
    */
  def augmentVariants(img: Gray, rowSeed: Long): Seq[(Int, Gray)] =
    (0 until 9).map { i =>
      val (_, u) = nextDouble(rowSeed * 31 + i)
      val v =
        if (i < 3) warpAffine(img, deg = (u * 2 - 1) * 5.0, scale = 1.0, tx = 0, ty = 0)
        else if (i < 6) {
          val (_, u2) = nextDouble(rowSeed * 31 + i + 1000)
          warpAffine(img, deg = 0, scale = 0.9 + u * 0.2,
            tx = (u2 * 2 - 1) * 3.0, ty = (u * 2 - 1) * 3.0)
        } else addGaussianNoise(img, sigma = 5.0 + u * 5.0, seed = rowSeed * 31 + i)
      (i, v)
    }

  /** The reference's flattened output naming (`/`→`_`,
    * /root/reference/src/preprocessing_pipeline.py:48-51) as a pure
    * function; the expression twin is regexp_replace (SURVEY §7.4 item 2).
    */
  def flattenName(path: String, prefix: String): String =
    prefix + "_" + path.replace("/", "_")
}
