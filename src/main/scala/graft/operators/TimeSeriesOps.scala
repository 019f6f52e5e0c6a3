package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series alignment operators over int64-ns event time (SURVEY §1.2:
  * event time stays LongType ns end to end; bucket arithmetic uses integer
  * `div`, never `/` — double division corrupts int64 ns above 2^53).
  */
object TimeSeriesOps {

  /** Regularise an irregular event stream onto a fixed grid per key: one row
    * per (key, bucket) over each key's observed span, with event counts
    * (0 for gaps) and the last observed aggregate forward-filled across
    * gaps — the resample + ffill step that precedes windowed feature
    * extraction.
    *
    * Scale shape: rather than the naive grid-generate + left-join +
    * fill-window plan (5 exchanges: agg, span agg, two join sides, window),
    * each observed bucket looks back at its predecessor with `lag` and emits
    * the gap rows itself — one aggregation shuffle on (key, bucket), one
    * key-partitioned window, and a narrow gap-explode: 2 exchanges total
    * (asserted in PlanQualitySpec). Forward fill falls out of the explode —
    * gap rows carry the predecessor's aggregate directly, no second window.
    * Grid size is bounded by span/bucket per key, independent of event
    * count. */
  def resampleFill(df: DataFrame, keyCol: String, tsNsCol: String,
                   valCol: String, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, s"bucketNs must be positive, got $bucketNs")
    val ts = col(tsNsCol)
    // Floor division that matches DuckDB's `//` for negative timestamps too:
    // ts - pmod(ts, b) is the largest multiple of b that is <= ts, so the
    // integral divide is exact and its truncation direction is irrelevant.
    // Column-based (not expr(s"...")) so odd column names needing backticks
    // still resolve.
    val bucket =
      call_function("div", ts - pmod(ts, lit(bucketNs)), lit(bucketNs))
        .as("bucket")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    df
      .select(col(keyCol), bucket, col(valCol))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"), avg(col(valCol)).as("v"))
      .withColumn("prev_bucket", lag("bucket", 1).over(w))
      .withColumn("prev_v", lag("v", 1).over(w))
      // emit every bucket in (prev_bucket, bucket]: the gaps, then the
      // observed bucket itself (first bucket of a key has no predecessor)
      .select(col(keyCol), col("bucket"), col("n"), col("v"), col("prev_v"),
        explode(sequence(
          coalesce(col("prev_bucket") + lit(1L), col("bucket")),
          col("bucket"))).as("b"))
      .select(col(keyCol), col("b").as("bucket"),
        when(col("b") === col("bucket"), col("n")).otherwise(lit(0L)).as("n"),
        round(when(col("b") === col("bucket"), col("v")).otherwise(col("prev_v")), 6)
          .as("v_fill"))
  }
}
