package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) queries: rows not strictly dominated on both
  * dimensions (maximize x AND y).
  *
  * Scale design: the textbook formulation needs, for every x, the maximum y
  * among STRICTLY GREATER x — a prefix maximum over a globally ordered
  * sequence, which as a single window is a one-partition bottleneck.
  * Instead the prefix max is computed at two levels: a per-bucket window
  * (partitioned by a fixed-width bucket of x — distributed) plus a
  * cross-bucket prefix over the tiny bucket-maxima table (broadcast back).
  * Every step is a hash aggregation, a partitioned window, or a broadcast
  * join; nothing funnels the distinct-x table through one task.
  */
object ParetoOps {

  /** 2-D skyline, maximizing both `xCol` and `yCol`: keep a row iff no other
    * row has strictly greater x AND strictly greater y. `bucketWidth` sets
    * the x-bucketing granularity of the distributed prefix max (any positive
    * value is correct; aim for hundreds-to-thousands of buckets).
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String, bucketWidth: Double): DataFrame = {
    // one row per distinct x with its best y; bucket by x range
    val pmax = df.groupBy(col(xCol))
      .agg(max(col(yCol)).as("__ym"))
      .withColumn("__b", floor(col(xCol) / bucketWidth))
    // cross-bucket prefix: max y of all strictly higher buckets (tiny table)
    val wb = Window.orderBy(col("__b").desc).rowsBetween(Window.unboundedPreceding, -1)
    val bdom = pmax.groupBy(col("__b")).agg(max(col("__ym")).as("__bym"))
      .withColumn("__bdom", max(col("__bym")).over(wb))
      .select(col("__b"), col("__bdom"))
    // within-bucket prefix over distinct x (distributed by bucket), then
    // the dominating y for each x is the better of the two levels
    val wx = Window.partitionBy(col("__b")).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val dom = pmax
      .withColumn("__indom", max(col("__ym")).over(wx))
      .join(broadcast(bdom), Seq("__b"))
      .select(col(xCol), greatest(col("__indom"), col("__bdom")).as("__dom"))
    df.join(dom, Seq(xCol))
      .where(col("__dom").isNull || col(yCol) >= col("__dom"))
      .drop("__dom")
  }
}
