package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the HLL sketch-rollup tier ([[StatsOps.hllRollup]] /
  * [[StatsOps.hllMergedDistinct]]): merge-exactness (per-partition sketches
  * union to exactly the direct whole-scan sketch — HLL registers are
  * per-item maxima), incremental maintenance (appending a day's sketch
  * equals re-rolling the extended range), and estimate accuracy vs the
  * exact distinct count. */
class SketchRollupSpec extends SparkSpec {

  private lazy val events = Tables(spark, "/root/testdata/sf0.01").events
    .select(col("user_id"), (col("ts") - pmod(col("ts"), lit(86400L * 1000000000L))).as("day"))

  test("merged per-day sketches estimate exactly the direct whole-scan sketch") {
    val rollup = StatsOps.hllRollup(events, Seq("day"), "user_id")
    val merged = StatsOps.hllMergedDistinct(rollup, Seq.empty)
      .select("distinct_est").first().getLong(0)
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).cast("long"))
      .first().getLong(0)
    assert(merged === direct,
      "HLL union of per-day sketches must equal the direct sketch (register-max merge)")
  }

  test("estimate is within HLL error bounds of the exact distinct count") {
    val exact = events.select(countDistinct("user_id")).first().getLong(0)
    val est = StatsOps.hllMergedDistinct(
      StatsOps.hllRollup(events, Seq("day"), "user_id"), Seq.empty)
      .select("distinct_est").first().getLong(0)
    // lgK=12 -> relative standard error ~1.04/sqrt(4096) ~ 1.6%; allow 5 sigma
    val tol = math.max(5, (exact * 0.09).toLong)
    assert(math.abs(est - exact) <= tol, s"est=$est exact=$exact")
  }

  test("incremental append: old rollup + new day's sketch == re-rolled range") {
    val days = events.select("day").distinct()
      .orderBy("day").collect().map(_.getLong(0))
    assert(days.length >= 2, "fixture must span at least two days")
    val cut = days(days.length / 2)
    val oldRollup = StatsOps.hllRollup(events.where(col("day") < cut), Seq("day"), "user_id")
    val newDay = StatsOps.hllRollup(events.where(col("day") === cut), Seq("day"), "user_id")
    // maintenance path: append the new day's sketch row — no history rescan
    val appended = StatsOps.hllMergedDistinct(oldRollup.unionByName(newDay), Seq.empty)
      .select("distinct_est").first().getLong(0)
    val rerolled = StatsOps.hllMergedDistinct(
      StatsOps.hllRollup(events.where(col("day") <= cut), Seq("day"), "user_id"), Seq.empty)
      .select("distinct_est").first().getLong(0)
    assert(appended === rerolled)
  }

  test("grouped readout: per-day estimates from the sketch table match per-day direct sketches") {
    val fromRollup = StatsOps.hllMergedDistinct(
      StatsOps.hllRollup(events, Seq("day"), "user_id"), Seq("day"))
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1)))
    val direct = events.groupBy("day")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).cast("long").as("d"))
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fromRollup.toSeq === direct.toSeq)
  }
}
