package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (Deequ-style constraint suite).
  *
  * Scale design: all per-table metrics are computed in ONE aggregation pass
  * over the fact table — the check suite costs a single scan regardless of
  * how many checks it contains, and the referential-integrity probe rides
  * the same pass as a broadcast hash join against the (small) dimension key
  * set. The wide 1-row aggregate is then unpivoted driver-free into one row
  * per check; nothing here is per-row driver work.
  */
object QualityOps {

  /** One named constraint: a metric column (evaluated inside the single
    * aggregation) and the minimum value it must reach to pass.
    */
  final case class Check(name: String, metric: Column, threshold: Double)

  /** Evaluate a constraint suite in one aggregation pass over `df`.
    * Returns one row per check: (check_name, metric, threshold, pass), with the
    * metric rounded to 6 dp so downstream equality comparisons are stable
    * across summation orders.
    */
  def dqChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val agg = df.agg(
      round(checks.head.metric, 6).as(checks.head.name),
      checks.tail.map(c => round(c.metric, 6).as(c.name)): _*)
    // Unpivot the 1-row wide aggregate into (check, metric) rows in-plan.
    val pairs = checks.map(c =>
      struct(lit(c.name).as("check_name"), col(c.name).as("metric"),
        lit(c.threshold).as("threshold")))
    agg.select(explode(array(pairs: _*)).as("c"))
      .select(col("c.check_name").as("check_name"), col("c.metric").as("metric"),
        col("c.threshold").as("threshold"),
        (col("c.metric") >= col("c.threshold")).as("pass"))
  }

  /** Fraction of rows satisfying `cond` (NULL counts as failing). */
  def rate(cond: Column): Column = avg(when(cond, 1.0d).otherwise(0.0d))
}
