package graft

import graft.pipeline.Preprocess
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end execution of the reference's preprocessing pipeline
  * (normalize → augment → split → sink), asserting the invariants the
  * reference checks at runtime: 9× augmentation fan-out
  * (/root/reference/src/preprocessing_pipeline.py:296-303) and per-client
  * disjointness (/root/reference/utils/preprocessing_testing_utils.py:60-80).
  */
class PreprocessSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("full pipeline: 9x fan-out, disjoint exhaustive clients, parquet sink") {
    val outDir = "target/test-output/preprocess-clients"
    val nInput = Preprocess.dedupGate(Preprocess.manifest(spark, TestSpark.Sf0001)).count()
    val counts = Preprocess.run(spark, TestSpark.Sf0001, outDir, nClients = 4)

    assert(counts.map(_._2).sum == nInput * 9, "augment fan-out must be exactly 9x")
    assert(counts.size == 4)

    val written = spark.read.parquet(outDir)
    assert(written.count() == nInput * 9)
    // disjointness: every augmented path belongs to exactly one client
    val overlaps = written.groupBy(col("aug_path"))
      .agg(countDistinct(col("client_id")).as("nc"))
      .filter(col("nc") > 1).count()
    assert(overlaps == 0L)
    assert(written.select(col("client_id")).distinct().count() == 4)
  }

  test("thumbnail stage resizes every normalized image to the target plane") {
    import spark.implicits._
    val thumbs = Preprocess.thumbnails(
      Preprocess.normalize(spark, Preprocess.manifest(spark, TestSpark.Sf0001)), 8, 8)
    val bad = thumbs.map(r => if (r.w == 8 && r.h == 8 && r.px.length == 64) 0 else 1)
      .reduce(_ + _)
    assert(bad == 0)
    assert(thumbs.count() ==
      Preprocess.manifest(spark, TestSpark.Sf0001).count())
  }

  test("normalize drops nothing on a clean manifest and equalizes every image") {
    val imgs = Preprocess.normalize(spark, Preprocess.manifest(spark, TestSpark.Sf0001))
    val nInput = Preprocess.manifest(spark, TestSpark.Sf0001).count()
    assert(imgs.count() == nInput)
    // equalized output must span the full range per image (≥2 levels is
    // guaranteed for the synthetic noise images)
    import spark.implicits._
    val bad = imgs.map { r =>
      val levels = r.px.map(_ & 0xff)
      if (levels.min == 0 && levels.max == 255) 0 else 1
    }.reduce(_ + _)
    assert(bad == 0)
  }
}
