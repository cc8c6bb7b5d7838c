package graft.pipeline

import graft.Tables
import graft.functions.ImageOps
import graft.functions.ImageOps.Gray
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's preprocessing pipeline re-expressed Spark-first
  * (entry point 1, SURVEY §3.1): one linear lazy chain
  *
  *   scan → path-prefix project → dedup gate → normalize (pure map) →
  *   augment fan-out (flatMap 1→9) → seeded client split → parquet sink
  *
  * vs the reference's collect-after-every-stage, side-effecting-UDF version
  * (/root/reference/src/preprocessing_pipeline.py:244-331). Differences
  * that matter at 100 TB (SURVEY §4.2): zero driver round-trips, pure
  * deterministic per-row transforms (retry/speculation-safe), `.cache()`
  * before the split fan-out instead of recomputing the UDF chain per
  * client, and partitioned parquet instead of per-client CSV dirs.
  */
object Preprocess {

  case class ImageRow(path: String, label: Double, w: Int, h: Int, px: Array[Byte])
  case class AugRow(path: String, aug_path: String, variant: Int, label: Double,
                    w: Int, h: Int, px: Array[Byte])

  /** Deterministic synthetic grayscale image per manifest row — the test
    * stand-in for cv2.imread (fixtures carry no real JPEGs; SURVEY role
    * mapping: documents.text ≙ image bytes). */
  def syntheticImage(key: String, w: Int = 32, h: Int = 32): Array[Byte] = {
    val px = new Array[Byte](w * h)
    var s = key.hashCode.toLong & 0xffffffffL
    var i = 0
    while (i < px.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      px(i) = ((s >>> 33) % 256).toByte
      i += 1
    }
    px
  }

  /** Stage 1-2: manifest scan + path prefix (reference :258-268). */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      concat(lit("corpus/"), col("source"), lit("/"), col("doc_id").cast("string"), lit(".img"))
        .as("path"),
      (col("doc_id") % 2).cast("double").as("label"))

  /** Stage 3: dedup gate (reference :279-283) — dropDuplicates applied
    * only if the group-count gate finds dups, same control flow, but the
    * gate is a single aggregate, not a collect. */
  def dedupGate(df: DataFrame): DataFrame = {
    val dups = df.groupBy(col("path")).count().filter(col("count") > 1).limit(1).count()
    if (dups > 0) df.dropDuplicates(Seq("path")) else df
  }

  /** Stage 4: normalize — pure typed map (reference U1, :33-59). Returns
    * null-free rows; a corrupt-image analog yields None and is dropped,
    * mirroring the reference's nullable column + downstream filter. */
  def normalize(spark: SparkSession, df: DataFrame): Dataset[ImageRow] = {
    import spark.implicits._
    df.select(col("path"), col("label")).as[(String, Double)]
      .flatMap { case (path, label) =>
        if (path.isEmpty) None // corrupt-image analog: cv2.imread returning None
        else {
          val img = ImageOps.equalizeHist(Gray(32, 32, syntheticImage(path)))
          Some(ImageRow(path, label, img.w, img.h, img.px))
        }
      }
  }

  /** Stage 5: augment fan-out — one flatMap emitting 9 deterministic
    * variants (reference U2+G1/G2, :111-155, fused: no comma-joined
    * string round-trip, no separate split+explode). */
  def augment(images: Dataset[ImageRow]): Dataset[AugRow] = {
    import images.sparkSession.implicits._
    images.flatMap { r =>
      val rowSeed = scala.util.hashing.MurmurHash3.stringHash(r.path).toLong
      ImageOps.augmentVariants(Gray(r.w, r.h, r.px), rowSeed).map { case (i, g) =>
        AugRow(r.path, ImageOps.flattenName(r.path, s"aug$i"), i, r.label, g.w, g.h, g.px)
      }
    }
  }

  /** Stages 6-7: seeded client split + partitioned parquet sink
    * (reference :185-207). The cache() prevents the n-way fan-out from
    * recomputing the augment chain per client (SURVEY §4.2 item 3);
    * `partitionBy(client_id)` replaces per-client CSV directories.
    * Returns per-client row counts.
    */
  def splitAndSink(aug: Dataset[AugRow], nClients: Int, outDir: String,
                   seed: Long = 42L): Seq[(Int, Long)] = {
    val spark = aug.sparkSession
    val cached = aug.toDF().cache()
    try {
      val splits = cached.randomSplit(Array.fill(nClients)(1.0 / nClients), seed)
      val withClient = splits.zipWithIndex
        .map { case (df, i) => df.withColumn("client_id", lit(i)) }
        .reduce(_.unionByName(_))
      withClient
        .drop("px") // payload stays for real sinks; dropped here to keep test output small
        .write.mode("overwrite").partitionBy("client_id").parquet(outDir)
      // per-client counts come from ONE scan of the written (partition-
      // pruned) sink, not one count() job per split branch — the same
      // rows-vs-files cross-check the reference does by listing the dir
      // (/root/reference/src/preprocessing_pipeline.py:296-303)
      spark.read.parquet(outDir)
        .groupBy(col("client_id")).count()
        .collect()
        .map(r => r.getInt(0) -> r.getLong(1))
        .sortBy(_._1).toSeq
    } finally cached.unpersist()
  }

  /** Declarative twin of the augment fan-out (G2 fused: explode over a
    * deterministic parameter sequence instead of UDF→comma-join→split→
    * explode). Parameters derive from (doc_id, variant) by pure integer
    * mixing, so the plan is SQL-expressible and oracle-checkable while the
    * pixel path (augment above) carries the actual image math.
    */
  def augmentPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // generators must be top-level select expressions (not nested in a
      // Cast), so emit the long sequence directly and explode it bare
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0L), lit(8L))).as("variant"))
      .select(
        col("doc_id"),
        col("variant"),
        when(col("variant") < 3, "rotate")
          .when(col("variant") < 6, "affine")
          .otherwise("noise").as("kind"),
        pmod(col("doc_id") * 2654435761L + col("variant") * 40503L, lit(1000L)).as("param"),
        concat(lit("aug"), col("variant").cast("string"), lit("_"),
          regexp_replace(
            concat(lit("corpus/"), col("source"), lit("/"), col("doc_id").cast("string"), lit(".img")),
            "/", "_")).as("aug_name"))

  /** Thumbnail stage — the media pipeline's resize verb (decode →
    * feature-extract → RESIZE → frame-sample): every normalized image
    * downsampled to thumbW×thumbH with the pure bilinear kernel. */
  def thumbnails(images: Dataset[ImageRow], thumbW: Int = 8, thumbH: Int = 8): Dataset[ImageRow] = {
    import images.sparkSession.implicits._
    images.map { r =>
      val t = ImageOps.resize(Gray(r.w, r.h, r.px), thumbW, thumbH)
      ImageRow(r.path, r.label, t.w, t.h, t.px)
    }
  }

  /** q41 — the pixel pipeline (U1 equalize + U2 augment, typed flatMaps)
    * executed end-to-end as an oracle-checkable invariant query: the 9×
    * fan-out of the reference's rows-vs-files check
    * (/root/reference/src/preprocessing_pipeline.py:296-303), augmented-name
    * uniqueness, the variant universe, and pixel-buffer integrity. This is
    * the harness path that actually runs the image math every round.
    */
  def pipelineInvariant(spark: SparkSession, dir: String): DataFrame = {
    val aug = augment(normalize(spark, dedupGate(manifest(spark, dir))))
    aug.toDF().agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("aug_path")).as("n_distinct_aug_paths"),
      countDistinct(col("variant")).as("n_variants"),
      (min(length(col("px"))) === 1024 && max(length(col("px"))) === 1024).as("px_ok"))
  }

  /** Full chain, returning the per-client counts the reference prints. */
  def run(spark: SparkSession, dir: String, outDir: String, nClients: Int = 4): Seq[(Int, Long)] =
    splitAndSink(augment(normalize(spark, dedupGate(manifest(spark, dir)))), nClients, outDir)
}
