package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Source surface (SURVEY §2.1): explicit-schema CSV scan (S1 — replacing
  * the reference's driver-side pd.read_csv→createDataFrame,
  * /root/reference/src/preprocessing_pipeline.py:258-264), shard-directory
  * ingest (S2 — replacing glob+pd.concat,
  * /root/reference/src/federated_learning_pipeline.py:57-59), and
  * binary-file ingest (S3 — replacing cv2.imread-inside-UDF,
  * /root/reference/src/preprocessing_pipeline.py:39).
  *
  * Schemas are declared, never inferred (SURVEY §1.2): inference costs an
  * extra pass and silently drifts; at 100 TB both are unacceptable.
  */
object Sources {

  /** The reference's label-CSV schema (FIXTURES.md §A1): path key + 5-label
    * vector. */
  val labelCsvSchema: StructType = StructType(Seq(
    StructField("Path", StringType, nullable = false),
    StructField("Cardiomegaly", DoubleType),
    StructField("Pneumonia", DoubleType),
    StructField("Lung Opacity", DoubleType),
    StructField("Edema", DoubleType),
    StructField("Consolidation", DoubleType)))

  /** S1 — distributed CSV scan with explicit schema. Works identically on
    * one file or a 100 TB directory tree. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S2 — shard-directory ingest: Spark's file index reads every shard in
    * the directory natively (UNION ALL semantics without driver concat). */
  def csvShards(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    csv(spark, dir, schema)

  /** Parquet twin (the engine's default interchange format, SURVEY §1.4). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S3 — binary-file source: path + modificationTime + content bytes as
    * proper columns, replacing read-inside-UDF. `pathGlobFilter` prunes at
    * the file index, before any bytes move.
    */
  def binaryFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
}
