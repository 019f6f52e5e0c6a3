package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the events.ts ingestion shim: the driver's parquet encoding for
  * `events.ts` has already shifted once (timestamp[ns] through r7,
  * timestamp[us] since r8), and every event-time operator consumes int64
  * epoch-ns. Tables.tsNs must absorb any supported encoding so the next
  * shift is a no-op (FIXTURES.md §B, SURVEY §7.4.1).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("events.ts surfaces as int64 epoch-ns whatever the parquet encoding") {
    val events = Tables(spark, dir).events
    assert(events.schema("ts").dataType === LongType,
      "Tables.events must normalize ts to LongType ns")
    // epoch-ns magnitude sanity: year-2000..2100 range, i.e. ~1e18, not µs
    // (~1e15) — catches a forgotten *1000 or a double-applied one
    val Array(lo, hi) = events.agg(min("ts"), max("ts")).as[(Long, Long)]
      .collect().map { case (a, b) => Array(a, b) }.head
    assert(lo > 946684800L * 1000000000L, s"min ts $lo below year-2000 in ns")
    assert(hi < 4102444800L * 1000000000L, s"max ts $hi above year-2100 in ns")
  }

  test("tsNs: long passthrough, timestamp and timestamp_ntz convert, others throw") {
    val long = Seq(1641457021267530036L).toDF("ts")
    assert(Tables.tsNs(long.schema("ts").dataType, col("ts")) != null)
    val asLong = long.select(Tables.tsNs(LongType, col("ts")).as("ts"))
    assert(asLong.head().getLong(0) === 1641457021267530036L)

    val micros = 1641457021267530L
    val tsRow = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val conv = tsRow.select(Tables.tsNs(TimestampType, col("ts")).as("ns"))
    assert(conv.head().getLong(0) === micros * 1000L)

    val ntzRow = tsRow.select(col("ts").cast(TimestampNTZType).as("ts"))
    val convNtz = ntzRow.select(Tables.tsNs(TimestampNTZType, col("ts")).as("ns"))
    assert(convNtz.head().getLong(0) === micros * 1000L)

    intercept[IllegalStateException] {
      Tables.tsNs(StringType, col("ts"))
    }
  }

  test("releaseMaterialized drops localCheckpoint blocks clearCache leaves behind") {
    val ck = spark.range(1000).toDF("id").localCheckpoint(true)
    ck.count()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "precondition: checkpoint blocks survive clearCache (else this guard is moot)")
    GraftSession.releaseMaterialized(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseMaterialized must unpersist every RDD-level block")
  }
}
