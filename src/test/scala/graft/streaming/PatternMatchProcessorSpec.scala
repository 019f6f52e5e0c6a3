package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** CEP-lite sequence detection on ListState: ordered attachment, window
  * expiry, overlap, cross-batch pending state.
  */
class PatternMatchProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb(body: => Unit): Unit = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private val stages = Seq("view", "click", "buy")

  private def run(name: String, batches: Seq[Seq[StageEvent]],
                  windowNs: Long = 100L): Seq[PatternMatch] = {
    val input = MemoryStream[StageEvent](spark)
    val matches = PatternMatchProcessor.detect(input.toDS(), stages, windowNs)
    val ckpt = java.nio.file.Files.createTempDirectory(s"cep-$name").toString
    val q = matches.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[PatternMatch].collect().toSeq.sortBy(m => (m.key, m.t1))
    } finally q.stop()
  }

  test("detects an in-order sequence and ignores out-of-order stages") {
    withRocksDb {
      val got = run("cep1", Seq(Seq(
        StageEvent("u", 10, "view"), StageEvent("u", 20, "click"), StageEvent("u", 30, "buy"),
        // buy before click never matches
        StageEvent("v", 10, "view"), StageEvent("v", 20, "buy"), StageEvent("v", 30, "click"))))
      assert(got == Seq(PatternMatch("u", 10, 20, 30)))
    }
  }

  test("window expiry kills stale anchors; overlapping sequences both match") {
    withRocksDb {
      val got = run("cep2", Seq(Seq(
        // anchor at 10 expires by 150 (window 100): no match for it
        StageEvent("u", 10, "view"), StageEvent("u", 150, "click"),
        // two interleaved full sequences inside the window, oldest-first
        StageEvent("w", 10, "view"), StageEvent("w", 15, "view"),
        StageEvent("w", 20, "click"), StageEvent("w", 25, "click"),
        StageEvent("w", 30, "buy"), StageEvent("w", 35, "buy"))))
      assert(got == Seq(
        PatternMatch("w", 10, 20, 30), PatternMatch("w", 15, 25, 35)))
    }
  }

  test("pending partials persist across micro-batches") {
    withRocksDb {
      val got = run("cep3", Seq(
        Seq(StageEvent("u", 10, "view")),
        Seq(StageEvent("u", 20, "click")),
        Seq(StageEvent("u", 30, "buy"),
          // and a fresh anchor whose completion never arrives
          StageEvent("u", 40, "view"))))
      assert(got == Seq(PatternMatch("u", 10, 20, 30)))
    }
  }
}
