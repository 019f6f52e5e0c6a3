package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles.
  *
  * Spark's built-in exact `percentile()` aggregate buffers EVERY value of a
  * group into one in-memory map before the final merge — at 100 TB a single
  * group's values land on a single reducer and OOM it. This computes the
  * same linear-interpolated quantiles (`quantile_cont` semantics: position
  * `(n-1)·p`) from a key-partitioned sort + rank arithmetic: the sort
  * distributes across the cluster, and only ≤ 2 boundary rows per (group,
  * quantile) survive into the final tiny aggregation.
  */
object QuantileOps {

  /** One row per group: one `label` column per requested probability with
    * the round(·, scale) quantile of `valCol`. */
  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     ps: Seq[(String, Double)], scale: Int = 4): DataFrame = {
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
    val whole = Window.partitionBy(col(groupCol))
    val ranked = df
      .select(col(groupCol), col(valCol))
      // quantile_cont/percentile semantics ignore NULLs; without this filter
      // Spark's NULLS FIRST ordering would rank them ahead of every value
      .where(col(valCol).isNotNull)
      .withColumn("rn", row_number().over(byVal))
      .withColumn("n", count(lit(1)).over(whole))
    // keep only the ≤ 2·|ps| boundary rows per group before aggregating
    val needed = ps.map { case (_, p) =>
      val target = (col("n") - 1) * lit(p)
      val lo = floor(target).cast("long") + 1
      col("rn") === lo || col("rn") === least(lo + 1, col("n"))
    }.reduce(_ || _)
    val aggs = ps.flatMap { case (label, p) =>
      val target = (col("n") - 1) * lit(p)
      val lo = floor(target).cast("long") + 1
      val hi = least(lo + 1, col("n"))
      val frac = target - floor(target)
      val vLo = max(when(col("rn") === lo, col(valCol)))
      val vHi = max(when(col("rn") === hi, col(valCol)))
      val fr = max(frac) // constant within the group
      Seq(round(vLo + fr * (coalesce(vHi, vLo) - vLo), scale).as(label))
    }
    ranked
      .where(needed)
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fixed-width histogram of `valCol`: bin index, count, and the bin's
    * observed min/max. Values below `lo` clamp into bin 0 and values at or
    * above `lo + nBins·width` into the last bin (open outer bins). One
    * partial-combined aggregation on the bin index — the two-pass
    * "min/max then bin" dance is avoided by fixing the range up front,
    * which is also what keeps the bin boundaries stable across reruns and
    * engines. Only non-empty bins appear; NULL values are dropped. */
  def histogram(df: DataFrame, valCol: String,
                lo: Double, width: Double, nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, s"need width>0, nBins>0; got $width, $nBins")
    val v = col(valCol)
    val bin = least(greatest(floor((v - lit(lo)) / lit(width)), lit(0L)),
      lit(nBins - 1L)).cast("long")
    df.where(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("cnt"),
        round(min(v), 6).as("min_v"), round(max(v), 6).as("max_v"))
  }

  /** Winsorize: clamp `valCol` into its group's [pLo, pHi] quantile range,
    * the robust-stats outlier treatment that keeps row count (unlike
    * trimming). The quantile table is one row per group — broadcast back
    * onto the data, so the fact table is scanned once for the quantiles
    * (sort-based, distributed) and once for the clamp; swap the broadcast
    * for a shuffle join if the group count itself is huge. Boundaries and
    * output share one rounding scale so the clamped value is exactly the
    * published quantile.
    */
  /** Equi-depth histogram per group: `nBins` bins whose edges are the
    * i/nBins quantiles of `valCol` within the group, so populations are
    * ~equal up to value ties. Edges come from [[exactQuantiles]] (one slim
    * row per group, broadcast back); bin assignment is a codegen'd chain of
    * comparisons, no per-row interpreted work. Only non-empty bins appear.
    */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valCol: String,
      nBins: Int): DataFrame = {
    require(nBins > 1, s"need nBins>1; got $nBins")
    val edges = (1 until nBins).map(i => s"__e$i" -> i.toDouble / nBins)
    val qs = exactQuantiles(df, groupCol, valCol, ps = edges, scale = 6)
    val bin = edges.map { case (label, _) =>
      when(col(valCol) > col(label), 1L).otherwise(0L)
    }.reduce(_ + _)
    df.where(col(valCol).isNotNull)
      .join(broadcast(qs), Seq(groupCol))
      .groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"),
        round(min(col(valCol)), 6).as("min_v"), round(max(col(valCol)), 6).as("max_v"))
  }

  def winsorize(df: DataFrame, groupCol: String, valCol: String,
      pLo: Double, pHi: Double, scale: Int = 6): DataFrame = {
    val qs = exactQuantiles(df, groupCol, valCol,
      ps = Seq("__qlo" -> pLo, "__qhi" -> pHi), scale = scale)
    df.join(broadcast(qs), Seq(groupCol))
      .withColumn(s"${valCol}_w",
        round(least(greatest(col(valCol), col("__qlo")), col("__qhi")), scale))
      .drop("__qlo", "__qhi")
  }
}
