package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star [EXT]; reference analog: the
  * path-string + out-of-band JPEG store of SURVEY §1.1 item 2, promoted to
  * a true in-table `binary` column per SURVEY §1.4).
  *
  * Real: the schema (binary payload + typed metadata struct), the
  * partitioning, the typed-Dataset batch shape, feature extraction and
  * frame sampling over raw bytes — AND baseline JPEG/PNG decode via
  * `javax.imageio` (JDK stdlib: [[decodeMeta]]/[[decodeToGray]]/
  * [[decodeResize]]), covering the reference's cv2.imread → resize
  * tensor path with a public, dependency-free decoder — AND PCM WAV via
  * the hand-rolled RIFF chunk walker [[decodeWav]] (r16: a container
  * parse plus raw little-endian integers needs no codec library;
  * oracle-audited end-to-end by q223) — AND ISO-BMFF/MP4 container
  * metadata via the box walker [[decodeMp4]] (r17, q229; SAMPLE decode
  * — h264 frames — would need a codec and is declared out of scope,
  * the same container/payload split the WAV parser draws).
  * No codec container remains stubbed: `decodeStub` is now only the
  * unrecognized-payload fallback (deterministic fake dims keep the
  * schema and batch shape real for the text-byte fixtures).
  */
object Multimodal {

  case class MediaMeta(n_bytes: Long, format: String, width: Int, height: Int)
  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Long,
                           histogram: Seq[Long], n_frames: Int)

  /** Ingest the documents fixture as a binary-column media table: text
    * bytes stand in for encoded media payloads (SURVEY Role mapping —
    * documents.text ≙ image bytes). media_type round-robins image/audio/
    * video so every branch of the pipeline is exercised.
    *
    * Scale note: payloads stay in executors end-to-end (no driver
    * round-trip); repartition by media_id spreads decode work evenly and
    * is the same layout a binaryFile scan of a 100 TB object store needs.
    */
  def ingest(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, tpe, payload) =>
        MediaRow(id, tpe, payload, decodeMeta(tpe, payload))
      }
  }

  /** Media header decode: REAL for baseline JPEG and PNG via
    * `javax.imageio` (JDK stdlib — public, headless-safe, no external
    * codec dependency), matching the reference's cv2.imread behavior
    * (/root/reference/src/preprocessing_pipeline.py:39); every other
    * payload falls back to [[decodeStub]]. The fixture's text-byte
    * payloads carry no JPEG/PNG signature, so the q37/q42 oracle
    * contracts are untouched by the real path.
    */
  def decodeMeta(mediaType: String, payload: Array[Byte]): MediaMeta =
    decodeImage(payload) match {
      case Some(img) =>
        MediaMeta(payload.length.toLong, sniffFormat(payload),
          img.getWidth, img.getHeight)
      case None => decodeWav(payload) match {
        // real RIFF/PCM parse (r16): width ≙ samples, height ≙ channels
        // — the dims slot carries the decoded shape, same as images
        case Some(w) => MediaMeta(payload.length.toLong, "wav",
          w.samples.length, w.channels)
        case None => decodeMp4(payload) match {
          // real ISO-BMFF walk (r17): width ≙ tracks, height ≙ whole
          // seconds of movie duration
          case Some(m) => MediaMeta(payload.length.toLong, "mp4",
            m.nTracks, (m.duration / m.timescale).toInt)
          case None => decodeStub(mediaType, payload)
        }
      }
    }

  // --- WAV (RIFF/PCM) — REAL decode, zero dependencies -----------------
  //
  // WAV was carried as a "non-JDK codec" stub since the multimodal rows
  // landed, but PCM WAV needs no codec at all: the container is a RIFF
  // chunk walk and the samples are raw little-endian integers. The
  // parser below is a real reader — it walks chunks in any order, skips
  // unknown ones (LIST/INFO metadata is routine in the wild), honors the
  // RIFF odd-size pad rule, and validates the PCM format tag — so the
  // declared stub now covers MP4 only.

  /** Decoded PCM audio: format fields from the fmt chunk, samples from
    * the data chunk (16-bit LE), and the count of unknown chunks the
    * walk skipped (the honesty signal that the parser handled a real
    * container, not just the happy path). */
  case class WavPcm(sampleRate: Int, channels: Int, bits: Int,
                    samples: Array[Int], skippedChunks: Int)

  /** Parse a RIFF/WAVE PCM payload; None for wrong magic, truncation,
    * or a non-PCM / non-16-bit format (the decode-failure contract of
    * [[decodeImage]]). Chunk walk: any order, unknown chunks skipped,
    * odd-size chunks padded to even (the RIFF rule real files exercise
    * via 9-byte INFO strings). */
  def decodeWav(payload: Array[Byte]): Option[WavPcm] = {
    def le32(p: Int): Int =
      (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8) |
        ((payload(p + 2) & 0xff) << 16) | ((payload(p + 3) & 0xff) << 24)
    def le16(p: Int): Int = (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8)
    def tag(p: Int): String = new String(payload, p, 4, "US-ASCII")
    if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, ch, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    var skipped = 0
    while (pos + 8 <= payload.length) {
      val id = tag(pos)
      val size = le32(pos + 4)
      // overflow-safe bounds: all operands non-negative, so the subtract
      // form cannot wrap (pos + 8 + size overflows Int for a crafted size
      // near Int.MaxValue and would pass a sum-form check, then index OOB
      // — violating the None-never-throw contract)
      if (size < 0 || size > payload.length - pos - 8) return None
      id match {
        case "fmt " if size >= 16 =>
          fmt = Some((le16(pos + 8), le16(pos + 10), le32(pos + 12),
            le16(pos + 22)))
        case "data" => data = Some((pos + 8, size))
        case _ => skipped += 1
      }
      pos += 8 + size + (size & 1) // odd chunks carry a pad byte
    }
    for {
      (audioFormat, ch, rate, bits) <- fmt
      (off, size) <- data
      if audioFormat == 1 && bits == 16 && ch >= 1 && size % 2 == 0
    } yield {
      val n = size / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) = le16(off + 2 * i).toShort.toInt // sign-extend int16
        i += 1
      }
      WavPcm(rate, ch, bits, samples, skipped)
    }
  }

  /** A deterministic synthetic PCM WAV derived from `id` alone (the q171
    * planted-pixel discipline on the audio axis): 256 16-bit mono
    * samples at 8 kHz with s_i = ((id·31 + i·17) mod 2048) − 1024 —
    * integer arithmetic the oracle replays verbatim. Every third file
    * carries a 9-byte LIST metadata chunk BETWEEN fmt and data (odd
    * size → pad byte), so the parser's chunk walk and pad rule are
    * exercised by the planted corpus, not just trusted. */
  private[graft] def syntheticWav(id: Long, n: Int = 256,
                                  rate: Int = 8000): Array[Byte] = {
    val samples = Array.tabulate(n)(i =>
      (((id * 31L + i.toLong * 17L) % 2048L) - 1024L).toInt)
    val withList = id % 3 == 0
    val listPayload = "INFOgraft".getBytes("US-ASCII") // 9 bytes -> odd
    val listLen = if (withList) 8 + listPayload.length + 1 else 0
    val total = 12 + listLen + (8 + 16) + (8 + 2 * n)
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("WAVE".getBytes("US-ASCII"))
    if (withList) {
      bb.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length)
        .put(listPayload).put(0.toByte) // the RIFF pad byte
    }
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** U5/q223 — WAV DECODE AUDIT: build `nFiles` planted PCM WAVs
    * in-engine, push every payload through the REAL RIFF parser in
    * executors, and emit per file the format fields and integer audio
    * features of the DECODED samples: sample count, rate, channels,
    * bits, peak amplitude, energy (Σs², exact integer), zero crossings,
    * and the skipped-chunk count (1 exactly on the LIST-carrying
    * files). The oracle re-derives every column from the id formula
    * alone — a hash match proves the bytes → container → samples round
    * trip is lossless, including the chunk-skip and pad-rule paths (the
    * q82/q85/q171 plant discipline stretched to audio).
    *
    * Scale: synthesis and decode are per-row executor work on a
    * media_id-partitioned relation — the identical shape a binaryFile
    * scan of a 100 TB audio store feeds; no driver round-trip, no
    * shuffle until the (tiny) feature rows. */
  def wavDecodeAudit(spark: SparkSession, nFiles: Int = 50): DataFrame = {
    import spark.implicits._
    require(nFiles >= 1, s"need nFiles >= 1; got $nFiles")
    spark.range(nFiles.toLong)
      .repartition(math.min(nFiles, 8), col("id")).as[Long]
      .map { id =>
        val w = decodeWav(syntheticWav(id)).getOrElse(
          throw new IllegalStateException(s"planted wav $id failed to parse"))
        var peak = 0L
        var sumSq = 0L
        var zc = 0L
        var i = 0
        while (i < w.samples.length) {
          val s = w.samples(i).toLong
          if (math.abs(s) > peak) peak = math.abs(s)
          sumSq += s * s
          if (i > 0 && w.samples(i - 1).toLong * s < 0) zc += 1
          i += 1
        }
        (id, w.samples.length.toLong, w.sampleRate.toLong,
          w.channels.toLong, w.bits.toLong, peak, sumSq, zc,
          w.skippedChunks.toLong)
      }
      .toDF("media_id", "n_samples", "sample_rate", "n_channels", "bits",
        "peak", "sum_sq", "zero_crossings", "n_chunks_skipped")
  }

  // --- MP4 (ISO-BMFF) — REAL container decode, zero dependencies -------
  //
  // MP4 was the last declared codec stub. Like WAV (r16), the CONTAINER
  // needs no codec: ISO/IEC 14496-12 is a box walk — size(4, big-endian)
  // + type(4 ascii), size==1 → a 64-bit largesize follows, size==0 → the
  // box runs to the end of its enclosure — with containers (moov, trak)
  // holding child boxes. The movie-level metadata a data pipeline
  // indexes on (brand, timescale, duration, track count) lives in
  // ftyp/mvhd/trak headers; SAMPLE decode (h264 frames) would need a
  // codec and stays out of scope — the walker parses the container, the
  // same split the WAV parser drew between RIFF and the PCM payload.

  /** Decoded ISO-BMFF movie metadata: the ftyp major brand, mvhd
    * timescale/duration (version 0 and 1 both parsed), the trak count,
    * plus the walk-honesty counters: boxes skipped (free/mdat/udta/...)
    * and 64-bit-largesize boxes traversed. */
  case class Mp4Meta(majorBrand: String, timescale: Long, duration: Long,
                     nTracks: Int, mvhdVersion: Int, skippedBoxes: Int,
                     largesizeBoxes: Int)

  /** Parse an ISO-BMFF payload; None for a missing/late ftyp, a missing
    * moov/mvhd, truncation, or any malformed box size (the decode-
    * failure contract of [[decodeWav]]). All size arithmetic in Long:
    * box sizes are UNSIGNED 32-bit (or 64-bit largesize) and an Int walk
    * would wrap on crafted sizes — the WAV overflow lesson, applied from
    * the start. */
  def decodeMp4(payload: Array[Byte]): Option[Mp4Meta] = {
    val n = payload.length.toLong
    def be32(p: Long): Long =
      ((payload(p.toInt) & 0xffL) << 24) | ((payload(p.toInt + 1) & 0xffL) << 16) |
        ((payload(p.toInt + 2) & 0xffL) << 8) | (payload(p.toInt + 3) & 0xffL)
    def be64(p: Long): Long = (be32(p) << 32) | be32(p + 4)
    def tag(p: Long): String = new String(payload, p.toInt, 4, "US-ASCII")
    if (n < 16 || tag(4) != "ftyp") return None
    var brand: Option[String] = None
    var mvhd: Option[(Int, Long, Long)] = None // (version, timescale, duration)
    var tracks = 0
    var skipped = 0
    var largesizes = 0
    // one flat iterative walk with an explicit enclosure stack: (end,
    // isMoov) — no recursion depth to attack with nested containers
    var stack = List((n, false))
    var pos = 0L
    var ok = true
    while (ok && stack.nonEmpty) {
      val (end, inMoov) = stack.head
      if (pos >= end) stack = stack.tail // enclosure exhausted
      else if (end - pos < 8) ok = false // trailing garbage
      else {
        val sizeField = be32(pos)
        val id = tag(pos + 4)
        var header = 8L
        val boxSize =
          if (sizeField == 1L) {
            if (end - pos < 16) { ok = false; 0L }
            else { header = 16L; largesizes += 1; be64(pos + 8) }
          } else if (sizeField == 0L) end - pos // runs to enclosure end
          else sizeField
        if (!ok || boxSize < header || boxSize > end - pos) ok = false
        else {
          val body = pos + header
          val next = pos + boxSize
          id match {
            case "ftyp" =>
              if (pos != 0L || boxSize < 16L) ok = false
              else brand = Some(tag(body))
            case "moov" => // descend: children own [body, next)
              stack = (next, true) :: stack
            case "mvhd" if inMoov =>
              val v = payload(body.toInt) & 0xff
              if (v == 1 && boxSize >= header + 4 + 28)
                mvhd = Some((1, be32(body + 20), be64(body + 24)))
              else if (v == 0 && boxSize >= header + 4 + 16)
                mvhd = Some((0, be32(body + 12), be32(body + 16)))
              else ok = false
            case "trak" if inMoov => tracks += 1
            case _ => skipped += 1
          }
          if (ok && id != "moov") pos = next
          else if (ok) pos = body // moov: first child starts at body
        }
      }
    }
    // ftyp alone is not a movie: require mvhd with a sane timescale
    for {
      _ <- if (ok) Some(()) else None
      b <- brand
      (v, ts, dur) <- mvhd
      if ts > 0L && dur >= 0L
    } yield Mp4Meta(b, ts, dur, tracks, v, skipped, largesizes)
  }

  /** A deterministic synthetic MP4 derived from `id` alone (the
    * [[syntheticWav]] plant discipline on the video axis): ftyp(isom) +
    * moov(mvhd + traks), with the walker's edge paths exercised by the
    * planted corpus, not just trusted — every third file carries a
    * skipped `free` box, every fifth writes moov in the 64-bit
    * largesize form, every seventh uses mvhd version 1 (64-bit
    * duration). timescale 600, duration = (id·37 mod 100000) + 600,
    * tracks = 1 + id mod 3 — integer arithmetic the oracle replays. */
  private[graft] def syntheticMp4(id: Long, timescale: Long = 600L,
                                  durationOf: Long => Long =
                                    i => (i * 37L) % 100000L + 600L,
                                  tracksOf: Long => Int =
                                    i => 1 + (i % 3L).toInt): Array[Byte] = {
    val duration = durationOf(id)
    val nTracks = tracksOf(id)
    val withFree = id % 3L == 0L
    val largesize = id % 5L == 0L
    val mvhdV1 = id % 7L == 0L
    val bb = java.nio.ByteBuffer.allocate(4096) // BIG_ENDIAN by default
    def box(tpe: String)(body: => Unit): Unit = {
      val at = bb.position()
      bb.putInt(0).put(tpe.getBytes("US-ASCII"))
      body
      bb.putInt(at, bb.position() - at)
    }
    box("ftyp") { bb.put("isom".getBytes("US-ASCII")).putInt(512) }
    if (withFree) box("free") { bb.put("pad".getBytes("US-ASCII")) }
    val moovAt = bb.position()
    // largesize form: size=1 marker + 64-bit length after the type
    if (largesize) bb.putInt(1).put("moov".getBytes("US-ASCII")).putLong(0L)
    else bb.putInt(0).put("moov".getBytes("US-ASCII"))
    box("mvhd") {
      if (mvhdV1)
        bb.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
          .putLong(0L).putLong(0L) // creation/modification (64-bit)
          .putInt(timescale.toInt).putLong(duration)
      else
        bb.put(0.toByte).put(Array[Byte](0, 0, 0))
          .putInt(0).putInt(0) // creation/modification (32-bit)
          .putInt(timescale.toInt).putInt(duration.toInt)
    }
    for (t <- 0 until nTracks)
      box("trak") { box("tkhd") { bb.putInt(t) } }
    val moovEnd = bb.position()
    if (largesize) bb.putLong(moovAt + 8, (moovEnd - moovAt).toLong)
    else bb.putInt(moovAt, moovEnd - moovAt)
    java.util.Arrays.copyOf(bb.array(), moovEnd)
  }

  /** U5/q229 — MP4 DECODE AUDIT (the q223 WAV discipline on the last
    * stubbed codec): build `nFiles` planted ISO-BMFF containers
    * in-engine, push every payload through the REAL box walker in
    * executors, and emit per file the movie metadata plus the
    * walk-honesty counters. The oracle re-derives every column from the
    * id formula alone — a hash match proves the bytes → boxes →
    * metadata walk is exact, including the skipped-box, largesize, and
    * mvhd-v1 paths on exactly the planted ids.
    *
    * Scale: same shape as q223 — per-row executor work on a
    * media_id-partitioned relation, no shuffle until the feature rows. */
  def mp4DecodeAudit(spark: SparkSession, nFiles: Int = 50): DataFrame = {
    import spark.implicits._
    require(nFiles >= 1, s"need nFiles >= 1; got $nFiles")
    spark.range(nFiles.toLong)
      .repartition(math.min(nFiles, 8), col("id")).as[Long]
      .map { id =>
        val m = decodeMp4(syntheticMp4(id)).getOrElse(
          throw new IllegalStateException(s"planted mp4 $id failed to parse"))
        (id, m.majorBrand, m.timescale, m.duration,
          m.duration * 1000L / m.timescale, m.nTracks.toLong,
          m.mvhdVersion.toLong, m.skippedBoxes.toLong,
          m.largesizeBoxes.toLong)
      }
      .toDF("media_id", "brand", "timescale", "duration", "duration_ms",
        "n_tracks", "mvhd_version", "n_boxes_skipped", "n_largesize")
  }

  /** Codec signature sniff: JPEG SOI / PNG magic, else empty. Cheap guard
    * so non-image payloads never pay an ImageIO reader probe. */
  def sniffFormat(payload: Array[Byte]): String =
    if (payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff) "jpeg"
    else if (payload.length >= 8 && (payload(0) & 0xff) == 0x89 &&
        payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') "png"
    else ""

  /** Decode a JPEG/PNG payload to a BufferedImage; None for unrecognized
    * signatures or corrupt streams (ImageIO returns null / throws on
    * truncation — both map to None, the reference's `None`-on-failure
    * contract at preprocessing_pipeline.py:52-55). */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (sniffFormat(payload).isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

  /** Decode to the engine's grayscale plane: integer BT.601 luma
    * (r·299 + g·587 + b·114) / 1000 — deterministic, no float path — so
    * the decoded plane feeds [[graft.functions.ImageOps]] equalize /
    * resize / augment directly. This is U1/U3's read step made real. */
  def decodeToGray(payload: Array[Byte]): Option[graft.functions.ImageOps.Gray] =
    decodeImage(payload).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val px = new Array[Byte](w * h)
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          px(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
          i += 1
          x += 1
        }
        y += 1
      }
      graft.functions.ImageOps.Gray(w, h, px)
    }

  case class DecodedTensor(media_id: Long, width: Int, height: Int,
                           pixels: Array[Byte])

  /** The reference's decode→resize tensor map (U3,
    * /root/reference/src/federated_learning_pipeline.py:36-40: decode
    * JPEG, resize 224×224) as a typed Dataset map over real codec bytes:
    * rows whose payload decodes (JPEG/PNG) emit the resized grayscale
    * plane; undecodable rows drop, the reference's None-filter semantics.
    * Distributed decode: runs per-partition in executors, no driver
    * round-trip, inherits the scan's partitioning. */
  def decodeResize(media: Dataset[MediaRow], w: Int = 224, h: Int = 224): Dataset[DecodedTensor] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      decodeToGray(r.payload).map { g =>
        val rs = graft.functions.ImageOps.resize(g, w, h)
        DecodedTensor(r.media_id, rs.w, rs.h, rs.px)
      }
    }
  }

  /** Fallback header decode for UNRECOGNIZED payloads (exotic image
    * formats, and the text-byte fixtures standing in for encoded media):
    * derives deterministic fake dims from the payload so the schema and
    * batch shape stay real and testable. Since r17 no codec container
    * routes here — JPEG/PNG/WAV/MP4 all have real parsers
    * (see [[decodeMeta]]); the "fake-*" format names are kept for the
    * q37/q42 fixture contracts.
    */
  def decodeStub(mediaType: String, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val fakeDim = (n % 512 + 32).toInt
    mediaType match {
      case "image" => MediaMeta(n, "fake-jpeg", fakeDim, (fakeDim * 3) / 4)
      case "audio" => MediaMeta(n, "fake-wav", 0, 0)
      case _       => MediaMeta(n, "fake-mp4", fakeDim, (fakeDim * 9) / 16)
    }
  }

  /** Byte-level feature extraction — real computation over the payload:
    * a 16-bin byte histogram (the shape an embedding/feature UDF takes:
    * fixed-width vector per row, mapPartitions-friendly) and a frame count
    * from 256-byte "frames".
    */
  def features(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // batch shape: one histogram buffer reused per partition, the same
      // pattern a vectorized decoder batch would use
      rows.map { r =>
        val hist = new Array[Long](16)
        r.payload.foreach(b => hist((b & 0xff) >> 4) += 1)
        MediaFeatures(r.media_id, r.media_type, r.meta.n_bytes,
          hist.toSeq, ((r.meta.n_bytes + 255) / 256).toInt)
      }
    }
  }

  /** Frame sampling for "video" payloads: every k-th 256-byte frame —
    * real chunking logic; with a codec this is keyframe extraction. */
  def sampleFrames(media: Dataset[MediaRow], every: Int = 4): DataFrame = {
    require(every > 0, s"frame sampling stride must be positive, got $every")
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video")
      .flatMap { r =>
        r.payload.grouped(256).zipWithIndex
          .filter(_._2 % every == 0)
          .map { case (frame, idx) => (r.media_id, idx, frame.length) }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Oracle-comparable stats query: per-media byte length, md5, frame
    * count — values DuckDB can recompute from the text column directly.
    */
  def byteStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    features(ingest(spark, dir))
      .toDF()
      .select(col("media_id"), col("media_type"), col("n_bytes"),
        col("n_frames").cast("long").as("n_frames"))
  }

  /** q42 — frame sampling exercised end-to-end: every 4th 256-byte frame
    * of each "video" payload, re-aggregated to (n_sampled, sampled_bytes)
    * per media so the oracle can recompute both from pure byte-length
    * arithmetic. The flatMap is the real 1→N frame generator; only the
    * codec is stubbed.
    */
  def frameSampleStats(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(ingest(spark, dir))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("frame_bytes")).cast("long").as("sampled_bytes"))

  /** U7 [EXT] — PERCEPTUAL IMAGE HASH (dHash, Krawetz): resize the
    * decoded grayscale plane to 9×8 (the house bilinear kernel) and emit
    * one bit per horizontally adjacent pixel pair (left < right) — a
    * 64-bit signature invariant to re-encoding and robust to brightness/
    * contrast shifts and mild noise, because it keys on gradient SIGNS,
    * not values. The standard first pass of image dedup in a training
    * pipeline (checksum dedup misses a re-encoded copy; this catches it).
    */
  def dHash64Of(img: graft.functions.ImageOps.Gray): Long = {
    val s = graft.functions.ImageOps.resize(img, 9, 8)
    var sig = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val l = s.px(y * 9 + x) & 0xff
        val r = s.px(y * 9 + x + 1) & 0xff
        if (l < r) sig |= 1L << bit
        bit += 1
        x += 1
      }
      y += 1
    }
    sig
  }

  /** dHash of an encoded payload; None if the bytes don't decode. */
  def dHash64(payload: Array[Byte]): Option[Long] =
    decodeToGray(payload).map(dHash64Of)

  /** Image near-dup pairs over (media_id, payload): decode → dHash → the
    * D6 banded-hamming join (16×4-bit bands — pigeonhole guarantees
    * exact recall for hamming ≤ 15 ≥ the default radius) → verify
    * bit_count(xor). Decode runs per-partition in executors (the U3
    * distribution); the band join shuffles 8-byte ids+signatures, never
    * pixels. Same scale posture (and the same loose-threshold pruning
    * caveat) as q19's simhash route, which shares the banding.
    */
  def imageNearDupPairsFor(media: DataFrame, maxHamming: Int = 10): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"16x4 banding guarantees recall only to hamming 15; got $maxHamming")
    val spark = media.sparkSession
    import spark.implicits._
    val sigs = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) => dHash64(payload).map(h => (id, h)) }
      .toDF("media_id", "dhash")
    val banded = sigs.select(col("media_id"), col("dhash"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => call_function("shiftright", col("dhash"), b.cast("int") * 4)
          .bitwiseAND(lit(0xfL)))))
      .toDF("media_id", "dhash", "band_id", "band_val")
    banded.as("x").join(banded.as("y"), Seq("band_id", "band_val"))
      .filter(col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        bit_count(col("x.dhash").bitwiseXOR(col("y.dhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** A deterministic synthetic image derived from `id` alone (the q85
    * damage-derived-from-id discipline, applied to pixels): 64×64
    * grayscale random-block gradient seeded by the id. Distinct ids give
    * dHash bits that are independent coin flips — P(hamming ≤ 10) per
    * pair ≈ 3e-9 — so unplanted pairs never collide at fixture scale. */
  private[graft] def syntheticImage(id: Long, brighten: Int = 0): Array[Byte] = {
    val rnd = new java.util.Random(id)
    val w = 64; val h = 64
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // 8x8 blocks of seeded random intensity: coarse structure survives
    // the 9x8 dHash resize, so the hash is id-determined, not noise
    val block = Array.fill(8, 8)(rnd.nextInt(256))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v0 = block(y / 8)(x / 8)
        val v = math.min(255, math.max(0, v0 + brighten))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** q171's registered form: 50 synthetic base images + a re-encoded,
    * brightness-shifted copy of the first 20 (id + 1000 — pixels change,
    * gradient signs don't), run through the REAL decode → dHash → banded
    * join. The found pair set must be EXACTLY the planted one, which the
    * oracle re-derives from id arithmetic alone — no codec needed on the
    * DuckDB side (the q82/q85 plant discipline stretched to pixels). */
  def imageNearDupPlanted(spark: SparkSession, nBase: Int = 50,
                          nDup: Int = 20): DataFrame = {
    import spark.implicits._
    require(nDup <= nBase, s"need nDup <= nBase; got $nDup > $nBase")
    val media = spark.range(nBase.toLong).as[Long].map { i =>
      (i, syntheticImage(i))
    }.union(spark.range(nDup.toLong).as[Long].map { i =>
      (i + 1000L, syntheticImage(i, brighten = 12))
    }).toDF("media_id", "payload")
    imageNearDupPairsFor(media)
      .select(col("id_a"), col("id_b"), lit(true).as("found"))
  }
}
