package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format breadth: the engine's operators are `DataFrame → DataFrame`,
  * so every Spark batch source (parquet is the driver testdata's format;
  * CSV / JSON-lines / ORC are the common interchange formats) feeds the
  * identical pipeline. This pins the round-trip semantics that make that
  * claim true — explicit schemas (no sampling-dependent inference at 100 TB)
  * and PERMISSIVE malformed handling, the same contract as the NDJSON
  * stream decode (SURVEY §2a S3).
  */
class SourceFormatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DoubleType)))

  private val rows = Seq(
    (1L, "alpha", 1.5), (2L, "beta", 2.25), (3L, "gamma", -0.75))

  test("CSV, JSON-lines, and ORC round-trip the same rows into the same pipeline") {
    val df = rows.toDF("id", "name", "price")
    val base = java.nio.file.Files.createTempDirectory("graft-src").toString
    df.write.option("header", "true").csv(s"$base/csv")
    df.write.json(s"$base/json")
    df.write.orc(s"$base/orc")

    val fromCsv = spark.read.schema(schema).option("header", "true").csv(s"$base/csv")
    val fromJson = spark.read.schema(schema).json(s"$base/json")
    val fromOrc = spark.read.schema(schema).orc(s"$base/orc")

    val expected = rows.toSet
    for ((src, name) <- Seq((fromCsv, "csv"), (fromJson, "json"), (fromOrc, "orc"))) {
      assert(src.schema == schema, s"$name schema drifted: ${src.schema}")
      // the same operator chain runs on any source
      val out = src.where(col("price") > 0).select("id", "name", "price")
        .as[(Long, String, Double)].collect().toSet
      assert(out == expected.filter(_._3 > 0), s"$name rows diverged: $out")
    }
  }

  test("PERMISSIVE JSON keeps well-formed rows and nulls malformed ones (batch S3 contract)") {
    val base = java.nio.file.Files.createTempDirectory("graft-badjson").toString
    val lines = Seq(
      """{"id": 1, "name": "ok", "price": 2.0}""",
      """{"id": 2, "name": "truncated""", // malformed
      """{"id": 3, "name": "ok2", "price": 4.0}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(base, "part.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val withCorrupt = StructType(schema.fields :+ StructField("_bad", StringType))
    // Spark disallows queries touching only the corrupt-record column on a
    // raw file scan — cache the parsed result first (the documented pattern)
    val parsed = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_bad")
      .json(base)
      .cache()
    val good = parsed.where(col("_bad").isNull).select("id").as[Long].collect().toSet
    val bad = parsed.where(col("_bad").isNotNull).count()
    assert(good == Set(1L, 3L), s"good rows: $good")
    assert(bad == 1, s"expected 1 malformed row, got $bad")
  }
}
