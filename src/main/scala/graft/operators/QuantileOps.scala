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
}
