package graft.queries

import graft.Tables
import graft.operators.NomadEventOps._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Batch bindings of the reference's operator inventory (SURVEY.md §2a) over
  * the driver's `events` table, each with a DuckDB oracle.
  *
  * The `events` table is the direct analog of the Nomad task-event stream
  * (FIXTURES.md §B): `user_id` ↔ task_identifier key space, `ts` ↔
  * `TaskEvent.Time` (int64 ns), `event_type` ↔ task-event `Type`, `props` ↔
  * `Details`. The analog mapping used throughout:
  *
  *  - event_type "view"     ↔ the default namespace / heartbeat-ish noise
  *  - event_type "signup"   ↔ "Restart Signaled" (classified via regex)
  *  - event_type "purchase" ↔ "Terminated" (classified via oom/exit_code)
  *  - derived details map: exit_code = k % 3 (string), oom_killed =
  *    value > 95 (string bool), restart_reason = "unhealthy" iff k odd —
  *    all string-valued, mirroring Nomad's all-string Details map.
  *
  * Every query ends in a total order on a unique key so the driver's
  * hash-compare is deterministic (SURVEY §7.4.4).
  */
object EventQueries {

  private val kSchema = StructType(Seq(StructField("k", LongType)))

  /** `ts` truncated from ns to µs precision (still ns-scaled). DuckDB's
    * TIMESTAMP is µs-precision, so the oracle's `epoch_ns(ts)` carries
    * trailing zeros; every output/comparison uses the same truncation to stay
    * bit-identical. Dedup/watermark semantics are unaffected at data's
    * inter-event gaps (minutes). */
  private def tsUs: Column = col("ts") - (col("ts") % 1000)

  /** Shared derived columns (the "details" analog). */
  private def enriched(t: Tables): DataFrame = enriched(t.events)

  private def enriched(events: DataFrame): DataFrame = {
    val k = from_json(col("props"), kSchema).getField("k")
    events
      .withColumn("k", k)
      .withColumn("exit_code", (col("k") % 3).cast("string"))
      .withColumn("oom_killed", when(col("value") > 95, "true").otherwise("false"))
      .withColumn("restart_reason", when(col("k") % 2 === 1, "unhealthy").otherwise("ok"))
  }

  /** Events pre-sorted by event_id for per-row assembly queries whose output
    * contract is ORDER BY event_id anyway. Sorting FIRST moves only the
    * narrow input columns through the range exchange, and — because the
    * events parquet is a small single-row-group file that scans as ONE
    * partition — the exchange is also what spreads the downstream JSON/
    * string assembly across cores instead of leaving it on a single task.
    * Column pruning still narrows the scan below the sort; the computing
    * projection stays above it, and projection/filter preserve the sort
    * order, so `.orderBy` at the end becomes unnecessary. */
  private def eventsSorted(t: Tables): DataFrame = t.events.orderBy("event_id")

  private def stateCol: Column =
    classifyState(col("event_type"), "signup", "purchase",
      col("restart_reason"), col("oom_killed"), col("exit_code"))

  private def taskIdCol: Column =
    taskIdentifier(col("event_type"), "view",
      col("user_id").cast("string"), col("event_id").cast("string"))

  private def nodeCol: Column =
    concat(lit("node-"), (col("user_id") % 10).cast("string"))

  // Oracle SQL fragments (DuckDB dialect) mirroring the derived columns.
  private val K   = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
  private val EC  = s"CAST($K % 3 AS VARCHAR)"
  private val OOM = "CASE WHEN value > 95 THEN 'true' ELSE 'false' END"
  private val RR  = s"CASE WHEN $K % 2 = 1 THEN 'unhealthy' ELSE 'ok' END"
  private val TID =
    "CASE WHEN event_type <> 'view' THEN event_type || '/' ELSE '' END || " +
    "CAST(user_id AS VARCHAR) || '.' || CAST(event_id AS VARCHAR)"
  private val NODE = "'node-' || CAST(user_id % 10 AS VARCHAR)"
  private val STATE =
    s"""CASE WHEN event_type = 'signup' THEN
       |  (CASE WHEN regexp_matches($RR, 'unhealthy') THEN 'failure' ELSE 'success' END)
       |WHEN event_type = 'purchase' THEN
       |  (CASE WHEN $OOM = 'true' THEN 'failure'
       |        WHEN $EC = '0' THEN 'success' ELSE 'failure' END)
       |ELSE NULL END""".stripMargin.replaceAll("\\s+", " ")
  private def SUBJ(tid: String = TID) =
    s"'**' || $tid || '** task is **' || event_type || '** on **' || $NODE || '** node'"

  val queries: Map[String, Tables => DataFrame] = Map(
    // S1 — initial offset discovery (app.rb:63-70): scalar max as the
    // starting offset.
    "q_initial_offset" -> { t =>
      t.events.agg(max(col("event_id")).as("last_log_index"))
    },

    // S3 — schema-on-read JSON decode with malformed-drop (lib/ndjson.rb:31-33):
    // PERMISSIVE from_json + null filter.
    "q_ndjson_decode" -> { t =>
      eventsSorted(t)
        .select(col("event_id"), from_json(col("props"), kSchema).getField("k").as("k"))
        .where(col("k").isNotNull)
    },

    // F1 — heartbeat split (app.rb:110-117): partition the stream into
    // heartbeat vs data rows; track latest liveness timestamp per branch.
    "q_heartbeat_split" -> { t =>
      t.events
        .withColumn("is_heartbeat", (col("event_type") === "view").cast("int"))
        .groupBy("is_heartbeat")
        .agg(count(lit(1)).as("n"), max(tsUs).as("latest_ts"))
        .orderBy("is_heartbeat")
    },

    // F2 — stale-offset filter (app.rb:119-122), threshold derived as a
    // broadcast scalar (the "agent/self" snapshot analog).
    "q_stale_index_filter" -> { t =>
      val threshold = t.events.agg(floor(max(col("event_id")) / 2).cast("long").as("thr"))
      t.events
        .crossJoin(broadcast(threshold))
        .where(col("event_id") > col("thr"))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    },

    // F3 — topic dispatch (app.rb:128-129).
    "q_topic_filter" -> { t =>
      topicFilter(t.events, col("event_type"), "purchase")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // F5 — regex anti-filter, substring semantics (app.rb:139-141).
    "q_regex_antifilter" -> { t =>
      regexAntiFilter(t.events, col("event_type"), "err")
        .select("event_id", "event_type")
        .orderBy("event_id")
    },

    // F6 — denylist (app.rb:169-173).
    "q_denylist" -> { t =>
      denyAllowFilter(t.events, col("event_type"), deny = Seq("view", "click"), allow = Nil)
        .select("event_id", "event_type")
        .orderBy("event_id")
    },

    // F6+F7 — deny-then-allow precedence: 'error' is in BOTH lists and must
    // be dropped (app.rb:169-179, SURVEY §7.4.5).
    "q_allowlist" -> { t =>
      denyAllowFilter(t.events, col("event_type"),
        deny = Seq("error"), allow = Seq("error", "purchase", "signup"))
        .select("event_id", "event_type")
        .orderBy("event_id")
    },

    // P1 — nested projection through constructed structs (app.rb:130-135,
    // 152-155): build the frame→payload→allocation shape, then dig.
    "q_nested_project" -> { t =>
      eventsSorted(t)
        .select(col("event_id"),
          struct(
            struct(
              from_json(col("props"), kSchema).getField("k").as("k"),
              col("user_id").as("uid")).as("alloc"),
            col("event_type").as("topic")).as("frame"))
        .select(col("event_id"),
          col("frame.alloc.k").as("k"),
          col("frame.alloc.uid").as("uid"),
          col("frame.topic").as("topic"))
    },

    // P2/P4 — explode array (app.rb:126, 151): array round-trip per key.
    "q_explode_events" -> { t =>
      t.events
        .groupBy("user_id")
        .agg(sort_array(collect_list(col("event_id"))).as("ids"))
        .select(col("user_id"), explode(col("ids")).as("event_id"))
        .orderBy("user_id", "event_id")
    },

    // P3 — explode map into (key, value) pairs (app.rb:139).
    "q_explode_taskstates" -> { t =>
      t.events
        .select(col("event_id"),
          explode(map(
            lit("type"), col("event_type"),
            lit("uid"), col("user_id").cast("string"))).as(Seq("key", "value")))
        .orderBy("event_id", "key")
    },

    // D1 — conditional key construction (app.rb:143-144).
    "q_task_identifier" -> { t =>
      eventsSorted(t)
        .select(col("event_id"), taskIdCol.as("task_identifier"))
    },

    // D2 — latest timestamp per key (app.rb:156-160, 270-273).
    "q_latest_ts_per_key" -> { t =>
      t.events
        .groupBy("user_id")
        .agg(max(tsUs).as("latest_ts"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // ST1 batch analog — high-watermark dedup (app.rb:163-167).
    "q_dedup_high_watermark" -> { t =>
      dedupHighWatermark(t.events.withColumn("ts", tsUs), col("user_id"), col("ts"))
        .select("event_id", "user_id", "ts")
        .orderBy("event_id")
    },

    // D3 — details quote-swap + JSON re-encode + fenced description
    // (app.rb:186-193).
    "q_details_json" -> { t =>
      val e = enriched(eventsSorted(t))
      val details = map(
        lit("exit_code"), col("exit_code"),
        lit("oom_killed"), col("oom_killed"),
        lit("restart_reason"), col("restart_reason"))
      e.select(col("event_id"),
          detailsJson(details).as("details_json"),
          fencedDescription(concat(lit("event "), col("event_id").cast("string")),
            detailsJson(details)).as("description"))
    },

    // D4 — three-valued state classification (app.rb:195-209).
    "q_state_classify" -> { t =>
      enriched(eventsSorted(t))
        .select(col("event_id"), col("event_type"), stateCol.as("state"))
    },

    // D5 — subject formatting (app.rb:183).
    "q_subject_format" -> { t =>
      eventsSorted(t)
        .select(col("event_id"),
          subject(taskIdCol, col("event_type"), nodeCol).as("subject"))
    },

    // D6 — markdown dialect transform (app.rb:245).
    "q_slack_markdown" -> { t =>
      eventsSorted(t)
        .select(col("event_id"),
          slackMarkdown(subject(taskIdCol, col("event_type"), nodeCol)).as("slack_subject"))
    },

    // D7 — colour mapping, NULL-preserving (app.rb:218-227, 248-256).
    "q_color_map" -> { t =>
      enriched(eventsSorted(t))
        .withColumn("state", stateCol)
        .select(col("event_id"), col("state"),
          discordColor(col("state")).as("discord_color"),
          slackColor(col("state")).as("slack_color"))
    },

    // D8 — payload assembly; to_json omits the NULL colour key exactly like
    // the reference's conditional embed colour (app.rb:214-234).
    "q_payload_json" -> { t =>
      enriched(eventsSorted(t))
        .withColumn("state", stateCol)
        .select(col("event_id"),
          discordPayload(
            concat(lit("event "), col("event_id").cast("string")),
            subject(taskIdCol, col("event_type"), nodeCol),
            discordColor(col("state"))).as("payload"))
    },

    // D9 — ns-epoch timestamp codec (app.rb:9-23).
    "q_ns_timestamp" -> { t =>
      eventsSorted(t)
        .select(col("event_id"), nomadTimestamp(tsUs).as("nomad_ts"))
    },

    // D11 — count-aware noun inflection (app.rb:95,149): the reference's
    // "N events detected" log line, over per-type event counts.
    "q_pluralize" -> { t =>
      t.events.groupBy("event_type").agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          concat(col("n").cast("string"), lit(" "),
            pluralize(lit("event"), col("n"))).as("label"))
        .orderBy("event_type")
    },

    // D8 — Slack payload assembly (app.rb:240-261): the description embeds
    // newlines and the fenced details JSON (double quotes), so this also
    // proves to_json's escaping against DuckDB's.
    "q_slack_payload" -> { t =>
      val e = enriched(eventsSorted(t))
      val details = map(
        lit("exit_code"), col("exit_code"),
        lit("oom_killed"), col("oom_killed"),
        lit("restart_reason"), col("restart_reason"))
      e.withColumn("state", stateCol)
        .select(col("event_id"),
          slackPayload(
            slackMarkdown(subject(taskIdCol, col("event_type"), nodeCol)),
            fencedDescription(concat(lit("event "), col("event_id").cast("string")),
              detailsJson(details)),
            slackColor(col("state"))).as("payload"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_initial_offset" ->
      "SELECT max(event_id) AS last_log_index FROM events",

    "q_ndjson_decode" ->
      s"""SELECT event_id, $K AS k FROM events WHERE $K IS NOT NULL ORDER BY event_id""",

    "q_heartbeat_split" ->
      """SELECT CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_heartbeat,
        |count(*) AS n, max(epoch_ns(ts)) AS latest_ts
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\\s+", " "),

    "q_stale_index_filter" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_id > (SELECT max(event_id) // 2 FROM events)
        |ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_topic_filter" ->
      "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase' ORDER BY event_id",

    "q_regex_antifilter" ->
      "SELECT event_id, event_type FROM events WHERE NOT regexp_matches(event_type, 'err') ORDER BY event_id",

    "q_denylist" ->
      "SELECT event_id, event_type FROM events WHERE event_type NOT IN ('view', 'click') ORDER BY event_id",

    "q_allowlist" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type NOT IN ('error')
        |AND event_type IN ('error', 'purchase', 'signup')
        |ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_nested_project" ->
      s"SELECT event_id, $K AS k, user_id AS uid, event_type AS topic FROM events ORDER BY event_id",

    "q_explode_events" ->
      """SELECT user_id, event_id FROM (
        |SELECT user_id, unnest(list_sort(list(event_id))) AS event_id
        |FROM events GROUP BY user_id)
        |ORDER BY user_id, event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_explode_taskstates" ->
      """SELECT event_id, key, value FROM (
        |SELECT event_id, 'type' AS key, event_type AS value FROM events
        |UNION ALL
        |SELECT event_id, 'uid' AS key, CAST(user_id AS VARCHAR) AS value FROM events)
        |ORDER BY event_id, key""".stripMargin.replaceAll("\\s+", " "),

    "q_task_identifier" ->
      s"SELECT event_id, $TID AS task_identifier FROM events ORDER BY event_id",

    "q_latest_ts_per_key" ->
      """SELECT user_id, max(epoch_ns(ts)) AS latest_ts, count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\\s+", " "),

    "q_dedup_high_watermark" ->
      """SELECT event_id, user_id, epoch_ns(ts) AS ts FROM (
        |SELECT event_id, user_id, ts, min(ts) OVER (PARTITION BY user_id) AS wm FROM events)
        |WHERE ts > wm ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_details_json" -> {
      val json = s"""'{"exit_code":"' || $EC || '","oom_killed":"' || $OOM || '","restart_reason":"' || $RR || '"}'"""
      s"""SELECT event_id, $json AS details_json,
         |'event ' || CAST(event_id AS VARCHAR) || chr(10) || '```' || $json || '```' AS description
         |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " ")
    },

    "q_state_classify" ->
      s"SELECT event_id, event_type, $STATE AS state FROM events ORDER BY event_id",

    "q_subject_format" ->
      s"SELECT event_id, ${SUBJ()} AS subject FROM events ORDER BY event_id",

    "q_slack_markdown" ->
      s"SELECT event_id, replace(${SUBJ()}, '**', '*') AS slack_subject FROM events ORDER BY event_id",

    "q_color_map" ->
      s"""SELECT event_id, $STATE AS state,
         |CASE WHEN $STATE = 'failure' THEN 15158332 WHEN $STATE = 'success' THEN 3066993 END AS discord_color,
         |CASE WHEN $STATE = 'failure' THEN '#e74c3c' WHEN $STATE = 'success' THEN '#2ecc71' END AS slack_color
         |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_payload_json" -> {
      val color =
        s"CASE WHEN $STATE = 'failure' THEN 15158332 WHEN $STATE = 'success' THEN 3066993 END"
      s"""SELECT event_id,
         |'{"content":"event ' || CAST(event_id AS VARCHAR) || '","embeds":[{"description":"' || ${SUBJ()} || '"' ||
         |CASE WHEN $color IS NOT NULL THEN ',"color":' || CAST($color AS VARCHAR) ELSE '' END ||
         |'}]}' AS payload
         |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " ")
    },

    "q_ns_timestamp" ->
      """SELECT event_id,
        |CAST(epoch_ns(ts) // 1000000000 AS VARCHAR) || '.' ||
        |lpad(CAST(epoch_ns(ts) % 1000000000 AS VARCHAR), 9, '0') AS nomad_ts
        |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_pluralize" ->
      """SELECT event_type, count(*) AS n,
        |CAST(count(*) AS VARCHAR) || ' event' ||
        |CASE WHEN count(*) = 1 THEN '' ELSE 's' END AS label
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\\s+", " "),

    "q_slack_payload" -> {
      val json = s"""'{"exit_code":"' || $EC || '","oom_killed":"' || $OOM || '","restart_reason":"' || $RR || '"}'"""
      val desc = s"'event ' || CAST(event_id AS VARCHAR) || chr(10) || '```' || $json || '```'"
      val color =
        s"CASE WHEN $STATE = 'failure' THEN '#e74c3c' WHEN $STATE = 'success' THEN '#2ecc71' END"
      // to_json(VARCHAR) emits the JSON-escaped quoted string, matching
      // Spark's to_json escaping of the embedded quotes/newlines.
      s"""SELECT event_id,
         |'{"attachments":[{"mrkdwn_in":["text"],"text":' || CAST(to_json($desc) AS VARCHAR) ||
         |',"pretext":' || CAST(to_json(replace(${SUBJ()}, '**', '*')) AS VARCHAR) ||
         |CASE WHEN $color IS NOT NULL THEN ',"color":"' || $color || '"' ELSE '' END ||
         |'}]}' AS payload
         |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " ")
    }
  )
}
