package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState variant of ST1: same frame-snapshot semantics as the
  * flatMapGroupsWithState implementation, on the RocksDB state store. */
class WatermarkDedupProcessorSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState dedup matches the frame-snapshot semantics") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[DedupEvent](spark)
      val deduped = WatermarkDedupProcessor.dedup(input.toDS(), initialWatermarkNs = 100L)
      val ckpt = java.nio.file.Files.createTempDirectory("tws-ckpt").toString
      val q = deduped.writeStream.format("memory").queryName("tws_out")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        // batch 1, two frames: duplicate ts within frame 1 passes twice;
        // the same ts re-sent in frame 2 is dropped (per-frame watermark)
        input.addData(
          DedupEvent("a", 1L, 200L, "x"), DedupEvent("a", 1L, 200L, "y"),
          DedupEvent("a", 2L, 200L, "dup"), DedupEvent("a", 2L, 300L, "new"),
          DedupEvent("a", 1L, 50L, "stale"))
        q.processAllAvailable()
        val out1 = spark.table("tws_out").as[DedupEvent].collect()
          .map(e => (e.event_time, e.payload)).sorted
        assert(out1.toSeq == Seq((200L, "x"), (200L, "y"), (300L, "new")))

        // batch 2: watermark persisted at 300 → only newer events pass
        input.addData(DedupEvent("a", 3L, 300L, "old"), DedupEvent("a", 3L, 400L, "ok"))
        q.processAllAvailable()
        val out2 = spark.table("tws_out").as[DedupEvent].collect()
          .map(_.payload).sorted
        assert(out2.toSeq == Seq("new", "ok", "x", "y"))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state TTL path starts and dedups (ProcessingTime mode when ttl is set)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[DedupEvent](spark)
      // TTL long enough that nothing evicts within the test: proves the
      // ttl=Some path runs at all (TimeMode.None would throw
      // StatefulProcessorCannotAssignTTLInTimeMode at query start)
      val deduped = WatermarkDedupProcessor.dedup(input.toDS(),
        initialWatermarkNs = 100L, ttl = Some(java.time.Duration.ofHours(1)))
      val ckpt = java.nio.file.Files.createTempDirectory("tws-ttl-ckpt").toString
      val q = deduped.writeStream.format("memory").queryName("tws_ttl_out")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      // ProcessingTime mode keeps the query's clock armed, so
      // processAllAvailable can hang — poll the sink with a deadline instead.
      def awaitRows(expected: Seq[String]): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        var got = Seq.empty[String]
        while (got != expected && System.currentTimeMillis() < deadline) {
          Thread.sleep(200)
          got = spark.table("tws_ttl_out").as[DedupEvent].collect().map(_.payload).sorted.toSeq
        }
        assert(got == expected)
      }
      try {
        input.addData(
          DedupEvent("a", 1L, 200L, "x"),
          DedupEvent("a", 2L, 200L, "dup"),
          DedupEvent("a", 1L, 50L, "stale"))
        awaitRows(Seq("x"))
        input.addData(DedupEvent("a", 3L, 300L, "ok"), DedupEvent("a", 3L, 150L, "old"))
        awaitRows(Seq("ok", "x"))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
