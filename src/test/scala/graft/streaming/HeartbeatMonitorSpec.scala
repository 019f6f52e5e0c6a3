package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** T1 via state timeouts: a source that stops beating gets a stale verdict
  * once the processing-time timeout lapses.
  *
  * Note: `processAllAvailable()` is unusable here — a query with armed
  * processing-time timers keeps scheduling batches, so the call never sees a
  * quiescent point. The test polls the sink with a deadline instead.
  */
class HeartbeatMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("silent source times out and emits a stale verdict") {
    val input = MemoryStream[Heartbeat](spark)
    val monitored = HeartbeatMonitor.monitor(input.toDS(), thresholdMs = 1000)
    val ckpt = java.nio.file.Files.createTempDirectory("hb-ckpt").toString
    val q = monitored.writeStream.format("memory").queryName("hb_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(200))
      .outputMode("append").start()
    try {
      input.addData(Heartbeat("nomad", 100L))
      def rows() = spark.table("hb_out").as[Liveness].collect().toSeq
      def awaitTrue(what: String)(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(250)
        assert(cond, s"$what; sink=${rows().mkString(",")}; status=${q.status}")
      }
      awaitTrue("live beat not observed") {
        rows().contains(Liveness("nomad", stale = false, 100L))
      }
      // no further beats: the 1s timer must fire and emit a stale verdict
      awaitTrue("no stale verdict after timeout") {
        rows().exists(l => l.source == "nomad" && l.stale)
      }
    } finally q.stop()
  }
}
