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
  * frame sampling over raw bytes.
  * STUBBED: actual media codec decode — the container has no image/audio
  * libraries, so `decodeStub` derives deterministic fake dims from the
  * payload; it is clearly marked and isolated so a codec-backed
  * implementation drops in without touching the Spark plumbing.
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
        MediaRow(id, tpe, payload, decodeStub(tpe, payload))
      }
  }

  /** STUB — media header decode. A real implementation parses the codec
    * header (JPEG SOF / WAV fmt / MP4 moov); this deterministic fake keeps
    * the schema and batch shape real so downstream operators are testable.
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
}
