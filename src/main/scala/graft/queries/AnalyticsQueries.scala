package graft.queries

import graft.Tables
import graft.operators.{PipelineOps, QuantileOps, TimeSeriesOps}
import org.apache.spark.sql.DataFrame

/** Event-analytics query bindings: the history/rolling-metric/anomaly
  * surface a product-analytics or monitoring pipeline runs over the ns-time
  * event stream, plus value distribution profiling. Each query has a DuckDB
  * oracle; event time follows the engine-wide convention (int64 ns in
  * Spark, µs-truncated on both sides before surfacing — SURVEY §7.4.1).
  */
object AnalyticsQueries {

  val queries: Map[String, Tables => DataFrame] = Map(
    // SCD-2 history: compress each user's event-type changelog into
    // versioned validity ranges (gaps-and-islands, single key exchange).
    "q_scd2" -> { t =>
      PipelineOps.scd2History(t.events, "user_id", "ts", "event_id", "event_type")
        .orderBy("user_id", "version")
    },

    // Trailing 7-day rolling distinct actives per day (MAU-family metric)
    // without a sliding count-distinct window: explode each active
    // (day, user) into the 7 window ends it serves, then one count-distinct
    // per day.
    "q_rolling_actives" -> { t =>
      TimeSeriesOps.rollingDistinctActives(t.events, "user_id", "ts", windowDays = 7)
        .orderBy("day")
    },

    // Rolling z-score anomaly flags per event type: each value scored
    // against the 20 points strictly before it.
    "q_anomaly_zscore" -> { t =>
      TimeSeriesOps.zscoreAnomalies(t.events, "event_type", "ts", "event_id", "value",
          lookback = 20, threshold = 2.5, minPrior = 5)
        .orderBy("event_type", "ts_us", "event_id")
    },

    // First-order event-type transition matrix over per-user sequences.
    "q_event_transitions" -> { t =>
      TimeSeriesOps.transitionCounts(t.events, "user_id", "ts", "event_id", "event_type")
        .orderBy("src", "dst")
    },

    // Fixed-width value histogram of order totals (clamped outer bins).
    "q_histogram" -> { t =>
      QuantileOps.histogram(t.orders, "o_totalprice", lo = 0.0, width = 50000.0, nBins = 10)
        .orderBy("bin")
    },

    // Statistical aggregate surface: correlation, covariance, dispersion,
    // and least-squares regression per group — all single-pass partial
    // aggregates (Spark's declarative aggregates merge moment sketches, so
    // the shuffle carries a handful of doubles per group, never values).
    "q_stat_aggs" -> { t =>
      import org.apache.spark.sql.functions._
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
          round(stddev_samp(col("l_extendedprice")), 4).as("std_price"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"))
        .orderBy("l_returnflag")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts_us, event_id, event_type AS state
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN state IS NOT DISTINCT FROM lag(state) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id) THEN 0 ELSE 1 END AS chg
        |  FROM e),
        |i AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM f),
        |v AS (
        |  SELECT user_id, state, island, min(ts_us) AS valid_from,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM i GROUP BY user_id, state, island)
        |SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version, state,
        |  valid_from, lead(valid_from) OVER w AS valid_to, n_events
        |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)
        |ORDER BY user_id, version""".stripMargin.replaceAll("\\s+", " "),

    "q_rolling_actives" ->
      """WITH a AS (
        |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id FROM events),
        |x AS (SELECT user_id, unnest(range(day, day + 7)) AS wday FROM a)
        |SELECT wday AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS actives
        |FROM x GROUP BY wday ORDER BY day""".stripMargin.replaceAll("\\s+", " "),

    "q_anomaly_zscore" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) AS ts_us, event_id, value FROM events),
        |w AS (
        |  SELECT *, count(value) OVER win AS pn, avg(value) OVER win AS pm,
        |    stddev_samp(value) OVER win AS ps
        |  FROM e WINDOW win AS (PARTITION BY event_type ORDER BY ts_us, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, ts_us, event_id, value,
        |  CASE WHEN pn >= 5 AND ps > 0 THEN round((value - pm) / ps, 4) END AS z,
        |  coalesce(CASE WHEN pn >= 5 AND ps > 0
        |    THEN abs(round((value - pm) / ps, 4)) > 2.5 END, false) AS is_anomaly
        |FROM w ORDER BY event_type, ts_us, event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts_us, event_id, event_type AS src
        |  FROM events),
        |p AS (
        |  SELECT src, lead(src) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id) AS dst
        |  FROM e)
        |SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM p
        |WHERE dst IS NOT NULL GROUP BY src, dst ORDER BY src, dst"""
        .stripMargin.replaceAll("\\s+", " "),

    "q_histogram" ->
      """SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 50000.0), 0), 9) AS BIGINT) AS bin,
        |CAST(count(*) AS BIGINT) AS cnt,
        |round(min(o_totalprice), 6) AS min_v, round(max(o_totalprice), 6) AS max_v
        |FROM orders WHERE o_totalprice IS NOT NULL
        |GROUP BY 1 ORDER BY bin""".stripMargin.replaceAll("\\s+", " "),

    "q_stat_aggs" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |round(stddev_samp(l_extendedprice), 4) AS std_price,
        |round(var_samp(l_quantity), 4) AS var_qty,
        |round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replaceAll("\\s+", " ")
  )
}
