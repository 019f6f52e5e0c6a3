package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated parquet tables (TESTDATA.md). One parquet
  * file per table under `$dir/`. All readers go through here so schema
  * options (nanosAsLong, see [[GraftSession]]) apply uniformly.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** `events` with `ts` normalized to int64 epoch-nanoseconds regardless of
    * the parquet encoding the driver generated. Every event-time operator in
    * the engine consumes `ts` as LongType ns (the reference treats
    * `TaskEvent.Time` as an int64 ns scalar, app.rb:154-155), so the encoding
    * shim lives here and nowhere else:
    *  - parquet `timestamp[ns]` + nanosAsLong=true → already LongType ns:
    *    pass through.
    *  - parquet `timestamp[us]` (current testdata) → surfaces as
    *    TIMESTAMP/TIMESTAMP_NTZ (nanosAsLong only affects ns columns):
    *    `unix_micros * 1000`. The session timezone is UTC (GraftSession), so
    *    the NTZ→TZ cast is a lossless UTC reinterpretation — the same
    *    convention DuckDB's `epoch_ns(ts)` oracle applies to naive timestamps.
    * A column-level rewrite, not a scan-level option, so predicate pushdown
    * and pruning on the remaining columns are unaffected.
    */
  def events: DataFrame = {
    val raw = table("events")
    raw.withColumn("ts", Tables.tsNs(raw.schema("ts").dataType, col("ts")))
  }

  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  /** Normalize a loaded `ts` column of the given type to int64 epoch-ns. */
  private[graft] def tsNs(dt: org.apache.spark.sql.types.DataType, c: Column): Column = dt match {
    case LongType                          => c
    case TimestampType                     => unix_micros(c) * lit(1000L)
    case TimestampNTZType                  => unix_micros(c.cast(TimestampType)) * lit(1000L)
    case other =>
      throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other; expected int64 ns, timestamp, or timestamp_ntz")
  }
}
