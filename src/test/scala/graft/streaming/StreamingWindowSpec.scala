package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class TimedEvent(ts: Timestamp, event_type: String)

/** Event-time tumbling-window aggregation with a watermark — the streaming
  * form of q_tumbling_window (X6): late data beyond the watermark is
  * dropped, windows finalise in append mode once the watermark passes.
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked tumbling window finalises and drops late data") {
    val input = MemoryStream[TimedEvent](spark)
    val windowed = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("event_type"), col("n"))
    val ckpt = java.nio.file.Files.createTempDirectory("win-ckpt").toString
    val q = windowed.writeStream.format("memory").queryName("win_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    try {
      // hour-1 events
      input.addData(TimedEvent(t("2024-01-01 10:05:00"), "click"),
                    TimedEvent(t("2024-01-01 10:20:00"), "click"),
                    TimedEvent(t("2024-01-01 10:40:00"), "view"))
      q.processAllAvailable()
      // advance event time well past hour 1 + watermark → hour-1 windows close
      input.addData(TimedEvent(t("2024-01-01 12:30:00"), "click"))
      q.processAllAvailable()
      // late event for the closed hour-1 window → dropped by the watermark
      input.addData(TimedEvent(t("2024-01-01 10:50:00"), "click"))
      q.processAllAvailable()
      // push watermark far enough to close every window
      input.addData(TimedEvent(t("2024-01-01 15:00:00"), "view"))
      q.processAllAvailable()

      val out = spark.table("win_out")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(out.contains((t("2024-01-01 10:00:00"), "click", 2L)),
        s"hour-1 click window wrong: $out")
      assert(out.contains((t("2024-01-01 10:00:00"), "view", 1L)))
      // the late hour-1 click must NOT have bumped the count to 3
      assert(!out.exists { case (w, et, n) =>
        w == t("2024-01-01 10:00:00") && et == "click" && n == 3L })
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups keys with bounded state") {
    // the watermark-bounded dedup variant: unlike the reference's grow-only
    // task_metadata map (app.rb:78), state for keys older than the watermark
    // is evicted — the third member of the streaming-dedup family alongside
    // flatMapGroupsWithState and transformWithState
    val input = MemoryStream[TimedEvent](spark)
    val deduped = input.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_type")
    val ckpt = java.nio.file.Files.createTempDirectory("ddww-ckpt").toString
    val q = deduped.writeStream.format("memory").queryName("ddww_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      input.addData(TimedEvent(t("2024-01-01 10:00:00"), "click"),
                    TimedEvent(t("2024-01-01 10:01:00"), "click"),
                    TimedEvent(t("2024-01-01 10:02:00"), "view"))
      q.processAllAvailable()
      // duplicate within the watermark window → dropped
      input.addData(TimedEvent(t("2024-01-01 10:05:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("ddww_out").count() == 2)
      // advance the watermark far past the old keys, then re-send: state was
      // evicted, so the key passes again
      input.addData(TimedEvent(t("2024-01-01 12:00:00"), "purchase"))
      q.processAllAvailable()
      input.addData(TimedEvent(t("2024-01-01 12:01:00"), "click"))
      q.processAllAvailable()
      val types = spark.table("ddww_out").as[(Timestamp, String)].collect().map(_._2)
      assert(types.count(_ == "click") == 2, s"evicted key should re-emit: ${types.toSeq}")
    } finally q.stop()
  }
}
