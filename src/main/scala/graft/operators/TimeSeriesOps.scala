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
    * Scale shape: two aggregations and one left join, all keyed on
    * (key, bucket) / key — partial-aggregated and AQE-planned; the window
    * fill partitions by key (no global ordering). Grid size is bounded by
    * span/bucket per key, independent of event count. */
  def resampleFill(df: DataFrame, keyCol: String, tsNsCol: String,
                   valCol: String, bucketNs: Long): DataFrame = {
    val bucket = expr(s"$tsNsCol div ${bucketNs}L").as("bucket")
    val perBucket = df
      .select(col(keyCol), bucket, col(valCol))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"), avg(col(valCol)).as("v"))
    val grid = perBucket
      .groupBy(col(keyCol))
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col(keyCol), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(perBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(last(col("v"), ignoreNulls = true).over(fill), 6).as("v_fill"))
  }
}
