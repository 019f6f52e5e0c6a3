package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink format coverage: the engine reads and writes the standard
  * columnar and text formats with schema fidelity. Parquet is the native
  * path (everything else in the suite exercises it); JSON/CSV need explicit
  * schemas on read (schema-on-read like the reference's NDJSON), ORC is the
  * alternative columnar container.
  */
class FormatRoundTripSpec extends SparkSpec {

  private lazy val events = Tables(spark, "/root/testdata/sf0.001").events
    .select("event_id", "user_id", "event_type", "value", "props")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def assertSame(a: org.apache.spark.sql.DataFrame): Unit = {
    val want = events.orderBy("event_id").collect().toSeq
    val got = a.select("event_id", "user_id", "event_type", "value", "props")
      .orderBy("event_id").collect().toSeq
    assert(got == want)
  }

  test("json round-trip with explicit schema") {
    val dir = tmp("fmt-json")
    events.write.mode("overwrite").json(dir)
    assertSame(spark.read.schema(events.schema).json(dir))
  }

  test("csv round-trip with header and explicit schema") {
    val dir = tmp("fmt-csv")
    events.write.mode("overwrite").option("header", "true").csv(dir)
    assertSame(spark.read.schema(events.schema).option("header", "true").csv(dir))
  }

  test("orc round-trip preserves schema exactly") {
    val dir = tmp("fmt-orc")
    events.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(StructType(back.schema.fields.sortBy(_.name).map(_.copy(nullable = true))) ==
      StructType(events.schema.fields.sortBy(_.name).map(_.copy(nullable = true))))
    assertSame(back)
  }

  test("compressed parquet round-trip (zstd)") {
    val dir = tmp("fmt-zstd")
    events.write.mode("overwrite").option("compression", "zstd").parquet(dir)
    assertSame(spark.read.parquet(dir))
  }
}
