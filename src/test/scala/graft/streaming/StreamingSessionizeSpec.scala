package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

case class SessionEvent(ts: Timestamp, user: String)

/** Streaming gap-sessionization (the q_sessionize counterpart): sessions
  * merge across micro-batches, finalize in append mode once the watermark
  * passes, and agree tuple-for-tuple with the same operator run in batch
  * over the same rows.
  */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("sessions merge across micro-batches, close at the gap, and match batch") {
    val input = MemoryStream[SessionEvent](spark)
    val out = StreamingSessionize.sessions(input.toDF(), "user", "ts",
      gap = "30 minutes", watermarkDelay = "10 minutes")
    val ckpt = java.nio.file.Files.createTempDirectory("sess-ckpt").toString
    val q = out.writeStream.format("memory").queryName("sess_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val coreRows = Seq(
      SessionEvent(t("2024-01-01 10:00:00"), "a"),
      SessionEvent(t("2024-01-01 10:10:00"), "a"), // within gap → same session
      SessionEvent(t("2024-01-01 10:05:00"), "b"),
      SessionEvent(t("2024-01-01 12:00:00"), "a")) // > gap later → new session
    try {
      // split the first session ACROSS micro-batches: state must merge
      input.addData(coreRows(0))
      q.processAllAvailable()
      input.addData(coreRows(1), coreRows(2))
      q.processAllAvailable()
      input.addData(coreRows(3))
      q.processAllAvailable()
      // advance the watermark far enough to close every core session
      input.addData(SessionEvent(t("2024-01-01 23:00:00"), "z"))
      q.processAllAvailable()

      val streamed = spark.table("sess_out")
        .as[(String, Timestamp, Timestamp, Long)].collect().toSet
      val expected = Set(
        ("a", t("2024-01-01 10:00:00"), t("2024-01-01 10:40:00"), 2L),
        ("b", t("2024-01-01 10:05:00"), t("2024-01-01 10:35:00"), 1L),
        ("a", t("2024-01-01 12:00:00"), t("2024-01-01 12:30:00"), 1L))
      assert(expected.subsetOf(streamed),
        s"closed sessions missing or wrong: $streamed")
      // the 23:00 'z' session cannot have closed (nothing advanced past it)
      assert(!streamed.exists(_._1 == "z"), s"unclosed session emitted: $streamed")

      // batch parity on the SAME rows: identical operator, identical tuples
      val batch = StreamingSessionize.sessions(coreRows.toDF(), "user", "ts",
          gap = "30 minutes", watermarkDelay = "10 minutes")
        .as[(String, Timestamp, Timestamp, Long)].collect().toSet
      assert(batch == expected, s"batch sessionization diverged: $batch")
    } finally q.stop()
  }

  test("events later than the watermark do not reopen a finalized session") {
    val input = MemoryStream[SessionEvent](spark)
    val out = StreamingSessionize.sessions(input.toDF(), "user", "ts",
      gap = "30 minutes", watermarkDelay = "10 minutes")
    val ckpt = java.nio.file.Files.createTempDirectory("sess-ckpt2").toString
    val q = out.writeStream.format("memory").queryName("sess_out2")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      input.addData(SessionEvent(t("2024-01-01 10:00:00"), "a"))
      q.processAllAvailable()
      input.addData(SessionEvent(t("2024-01-01 15:00:00"), "a")) // closes 10:00
      q.processAllAvailable()
      // a late event inside the CLOSED 10:00 session window: must be dropped,
      // not re-emitted as a duplicate or merged session
      input.addData(SessionEvent(t("2024-01-01 10:05:00"), "a"))
      q.processAllAvailable()
      input.addData(SessionEvent(t("2024-01-01 23:00:00"), "z")) // close 15:00
      q.processAllAvailable()
      val rows = spark.table("sess_out2")
        .as[(String, Timestamp, Timestamp, Long)].collect().toSeq
      val tenOclock = rows.filter(r => r._1 == "a" && r._2 == t("2024-01-01 10:00:00"))
      assert(tenOclock == Seq(("a", t("2024-01-01 10:00:00"),
        t("2024-01-01 10:30:00"), 1L)), s"finalized session disturbed: $rows")
    } finally q.stop()
  }
}
