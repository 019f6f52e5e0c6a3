package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline's operators (SURVEY.md §2a), re-expressed as pure,
  * declarative Spark transformations. Each function is a `DataFrame =>
  * DataFrame` (or `Column`-producing) combinator so the same logic serves the
  * batch oracle queries, the structured-streaming pipeline
  * ([[graft.streaming.NomadPipeline]]) and tests.
  *
  * Everything here stays inside Catalyst built-ins — no UDFs — so the whole
  * operator chain compiles into a single whole-stage-codegen span and
  * predicate pushdown / column pruning reach the scan (SURVEY §4).
  *
  * Reference citations are `file:line` into /root/reference.
  */
object NomadEventOps {

  // ---------------------------------------------------------------- filters

  /** F2 — stale-offset filter: keep only rows strictly newer than the
    * starting index (reference app.rb:119-122). */
  def staleIndexFilter(df: DataFrame, indexCol: Column, startingIndex: Column): DataFrame =
    df.where(indexCol > startingIndex)

  /** F3 — topic dispatch: the reference `case` statement handles exactly one
    * topic and silently drops the rest (app.rb:128-129, 275). */
  def topicFilter(df: DataFrame, topicCol: Column, topic: String): DataFrame =
    df.where(topicCol === topic)

  /** F5 — regex anti-filter: drop rows whose key matches a substring regex
    * (`/connect-proxy/`, app.rb:139-141 — substring match, not equality). */
  def regexAntiFilter(df: DataFrame, col: Column, pattern: String): DataFrame =
    df.where(!col.rlike(pattern))

  /** F6+F7 — deny-then-allow list cascade. Denylist is checked first and
    * wins; an empty allowlist admits everything (app.rb:169-179). */
  def denyAllowFilter(df: DataFrame, typeCol: Column,
                      deny: Seq[String], allow: Seq[String]): DataFrame = {
    val afterDeny = if (deny.isEmpty) df else df.where(!typeCol.isin(deny: _*))
    if (allow.isEmpty) afterDeny else afterDeny.where(typeCol.isin(allow: _*))
  }

  // --------------------------------------------------------- derived columns

  /** D1 — task identifier: `"{ns}/"` prefix only when the namespace is not
    * the default, then `jobId.taskId` (app.rb:143-144). */
  def taskIdentifier(ns: Column, defaultNs: String, jobId: Column, taskId: Column): Column =
    concat(
      when(ns =!= defaultNs, concat(ns, lit("/"))).otherwise(lit("")),
      jobId, lit("."), taskId)

  /** ST1 batch analog — keyed high-watermark dedup: the streaming reference
    * keeps only events strictly newer than the per-key watermark seeded at
    * batch start (app.rb:145-146, 163-167, 270-273). The batch analog seeds
    * the watermark with the key's earliest timestamp and keeps strictly-later
    * rows. Exact streaming semantics live in
    * [[graft.streaming.HighWatermarkDedup]]. */
  def dedupHighWatermark(df: DataFrame, keyCol: Column, tsCol: Column): DataFrame = {
    val wm = min(tsCol).over(Window.partitionBy(keyCol))
    df.withColumn("__wm", wm).where(tsCol > col("__wm")).drop("__wm")
  }

  /** D3 — details re-encode: quote-swap every map value then serialise to
    * JSON (app.rb:186-193). Deterministic because map construction order is
    * fixed by the caller (SURVEY §7.4.3). */
  def detailsJson(details: Column): Column =
    to_json(transform_values(details, (_, v) => regexp_replace(v, "\"", "'")))

  /** D3 — fenced-details description suffix: append ``` `\n```{json}``` ```
    * only when the details map is non-empty — a single leading newline, no
    * newlines inside the fences (app.rb:192 `description << "\n```#{json}```"`). */
  def fencedDescription(base: Column, detailsJson: Column): Column =
    concat(base,
      when(detailsJson =!= lit("{}") && detailsJson.isNotNull,
        concat(lit("\n```"), detailsJson, lit("```"))).otherwise(lit("")))

  /** D4 — state classification (app.rb:195-209). Three-valued: most event
    * types classify to NULL (no colour), not success (SURVEY §7.4.8).
    *
    *  - `restartType`: failure iff `restart_reason` matches /unhealthy/
    *  - `terminatedType`: failure iff `oom_killed == "true"`, else success
    *    iff `exit_code == "0"`, else failure — note the *string*-typed
    *    comparisons, mirroring Nomad's all-string Details map.
    */
  def classifyState(eventType: Column, restartType: String, terminatedType: String,
                    restartReason: Column, oomKilled: Column, exitCode: Column): Column =
    when(eventType === restartType,
      when(restartReason.rlike("unhealthy"), "failure").otherwise("success"))
    .when(eventType === terminatedType,
      when(oomKilled === "true", "failure")
        .when(exitCode === "0", "success")
        .otherwise("failure"))
    .otherwise(lit(null).cast("string"))

  /** D5 — Discord-markdown subject line (app.rb:183). */
  def subject(taskIdentifier: Column, eventType: Column, nodeName: Column): Column =
    format_string("**%s** task is **%s** on **%s** node", taskIdentifier, eventType, nodeName)

  /** D6 — markdown dialect transform: Discord bold → Slack bold (app.rb:245). */
  def slackMarkdown(subject: Column): Column =
    regexp_replace(subject, "\\*\\*", "*")

  /** D7 — colour mapping; NULL state maps to NULL colour (app.rb:218-227,
    * 248-256). */
  def discordColor(state: Column): Column =
    when(state === "failure", 15158332).when(state === "success", 3066993)

  def slackColor(state: Column): Column =
    when(state === "failure", "#e74c3c").when(state === "success", "#2ecc71")

  /** D8 — Discord payload assembly (app.rb:214-234). `to_json` drops NULL
    * fields, matching the reference's conditional `color` key. */
  def discordPayload(content: Column, description: Column, color: Column): Column =
    to_json(struct(
      content.as("content"),
      array(struct(description.as("description"), color.as("color"))).as("embeds")))

  /** D8 — Slack payload assembly (app.rb:240-261): one attachment with
    * `mrkdwn_in: ["text"]`, the fenced description as `text`, the
    * Slack-bold subject as `pretext`, and a conditional `color` key —
    * `to_json` both escapes embedded quotes/newlines correctly and drops the
    * NULL colour field, matching the reference's conditional
    * `attachment[:color]`. */
  def slackPayload(slackSubject: Column, description: Column, color: Column): Column =
    to_json(struct(
      array(struct(
        array(lit("text")).as("mrkdwn_in"),
        description.as("text"),
        slackSubject.as("pretext"),
        color.as("color"))).as("attachments")))

  /** D11 — count-aware noun inflection (app.rb:95, app.rb:149: ActiveSupport
    * `'event'.pluralize(n)` in log lines — "1 event" / "3 events"). Regular
    * +s inflection only: the reference applies it to "second" and "event",
    * both regular; irregular-noun tables are out of scope. */
  def pluralize(noun: Column, n: Column): Column =
    concat(noun, when(n === 1, lit("")).otherwise(lit("s")))

  /** D9 — ns-epoch timestamp codec: seconds + zero-padded 9-digit subsecond
    * part (app.rb:9-23). Integer arithmetic only — int64 ns does not fit a
    * double (SURVEY §7.4.1). */
  def nomadTimestamp(tsNs: Column): Column = {
    // int64 ns exceeds double's 53-bit mantissa, so `/` (double division)
    // would corrupt the low digits; subtract the remainder and divide as
    // decimal(38,0), which is exact for an even multiple.
    val subNs = tsNs % lit(1000000000L)
    val secs = ((tsNs - subNs).cast("decimal(38,0)") / lit(1000000000L)).cast("long")
    concat(secs.cast("string"), lit("."), lpad(subNs.cast("string"), 9, "0"))
  }
}
