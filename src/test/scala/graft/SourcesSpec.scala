package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("binaryFile source returns the exact on-disk bytes (sha-256 vs filesystem read)") {
    val (name, sparkSha) = Sources.binaryFiles(spark, TestSpark.Sf0001, "documents.parquet")
      .select(substring_index(col("path"), "/", -1), sha2(col("content"), 256))
      .as[(String, String)].head()
    assert(name == "documents.parquet")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(TestSpark.Sf0001, "documents.parquet"))
    val fsSha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
    assert(sparkSha == fsSha)
  }

  test("CSV round-trip aggregate equals the source-table aggregate") {
    val viaCsv = Sources.csvRoundTrip(spark, TestSpark.Sf0001)
    val direct = Tables.orders(spark, TestSpark.Sf0001)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
    assert(viaCsv.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaCsv).count() == 0)
  }

  test("explicit-schema CSV scan preserves declared types") {
    val schema = Sources.csvRoundTrip(spark, TestSpark.Sf0001).schema
    assert(schema("cnt").dataType.typeName == "long")
    assert(schema("total").dataType.typeName == "double")
  }
}
