package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** Session-unique tag (applicationId ⊕ session identity): two concurrent
    * sessions on one host — bench + verify, parallel test JVMs — must never
    * race on one scratch path or warehouse table dir.
    */
  private[graft] def sessionTag(spark: SparkSession): String =
    spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + java.lang.Integer.toHexString(System.identityHashCode(spark))

  /** Session-isolated scratch dir for round-trip sinks. */
  private[graft] def scratchDir(spark: SparkSession, name: String): String =
    sys.props("java.io.tmpdir") + s"/graft_${name}_${sessionTag(spark)}"

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

  /** q39 — S1+S2+W1 exercised end-to-end: project orders, sink it as a
    * headered multi-shard CSV directory, re-read the directory with an
    * explicit schema (no inference pass), and aggregate. The aggregate is
    * identical to aggregating the source table directly, which is exactly
    * what the oracle checks — proving the CSV round-trip is lossless
    * (Spark writes doubles in shortest-round-trip form).
    */
  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir(spark, "csv_roundtrip")
    parquet(spark, s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .repartition(4) // a real shard directory, not a single file
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    csvShards(spark, out, schema)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** q48 — JSONL round-trip: documents sunk as multi-shard JSON Lines (the
    * de-facto LLM training-corpus interchange format) and re-read with an
    * explicit schema — no inference pass, which on a 100 TB corpus would
    * mean reading everything twice. The aggregate matches the source
    * table, proving the round-trip is lossless.
    */
  def jsonlRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir(spark, "jsonl_roundtrip")
    parquet(spark, s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(4)
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("lang", StringType),
      StructField("text", StringType)))
    spark.read.schema(schema).json(out)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        min(col("doc_id")).as("min_doc_id"))
  }

  /** q50 — ORC round-trip: the third columnar interchange format next to
    * parquet and JSONL. Same explicit-schema discipline; the aggregate
    * matches the source table, proving losslessness (ORC carries its own
    * schema, but declaring ours pins the types the engine expects).
    */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir(spark, "orc_roundtrip")
    parquet(spark, s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .repartition(4)
      .write.mode("overwrite").orc(out)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType, nullable = false),
      StructField("l_returnflag", StringType),
      StructField("l_quantity", DoubleType)))
    spark.read.schema(schema).orc(out)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** q40 — S3 exercised: the fixture parquet itself read as opaque binary.
    * The oracle re-reads the same file with DuckDB's read_blob and checks
    * name + byte length; exact byte-content equality (sha-256 vs a direct
    * filesystem read) is asserted in SourcesSpec — DuckDB 1.0's sha256()
    * only accepts VARCHAR, so the hash is not oracle-expressible.
    */
  def binarySourceStats(spark: SparkSession, dir: String): DataFrame =
    binaryFiles(spark, dir, glob = "documents.parquet")
      .select(
        substring_index(col("path"), "/", -1).as("file_name"),
        col("length").as("n_bytes"))
}
