package graft.streaming

import graft.SparkSpec
import graft.operators.StatsOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming maintenance of the HLL sketch table
  * ([[StatsOps.hllRollup]] / [[StatsOps.hllMergedDistinct]]): each
  * micro-batch appends its own per-key sketch rows (foreachBatch — the
  * same append-only pattern as the streamed PQ-index ingest), and readouts
  * union ALL appended rows per key. Because HLL union is associative and
  * order-independent, the appended table gives EXACTLY the estimate a
  * batch rescan of everything streamed so far produces — no compaction or
  * dedup step is needed for correctness (compaction is an optimization
  * that bounds rows-per-key, not a correctness requirement). */
class StreamingSketchRollupSpec extends SparkSpec {
  import spark.implicits._

  test("per-micro-batch sketch appends estimate exactly the batch rescan") {
    val day0 = 0L
    val day1 = 86400L * 1000000000L
    val batch1 = Seq((day0, 11L), (day0, 12L), (day1, 11L), (day1, 13L))
    val batch2 = Seq((day0, 12L), (day0, 14L), (day1, 15L)) // overlaps batch1
    val sink = java.nio.file.Files.createTempDirectory("sketch-rollup").toString

    val in = MemoryStream[(Long, Long)](spark)
    val q = in.toDF().toDF("day", "user_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StatsOps.hllRollup(batch, Seq("day"), "user_id")
          .write.mode("append").parquet(sink)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sketch-ckpt").toString)
      .start()
    in.addData(batch1)
    q.processAllAvailable()
    in.addData(batch2)
    q.processAllAvailable()
    q.stop()

    val table = spark.read.parquet(sink)
    // two batches → up to two sketch rows per day; readout unions them
    val streamed = StatsOps.hllMergedDistinct(table, Seq("day"))
      .orderBy("day").as[(Long, Long)].collect().toSeq
    val everything = (batch1 ++ batch2).toDF("day", "user_id")
    val rescan = StatsOps.hllMergedDistinct(
      StatsOps.hllRollup(everything, Seq("day"), "user_id"), Seq("day"))
      .orderBy("day").as[(Long, Long)].collect().toSeq
    assert(streamed === rescan)
    // tiny cardinalities sit in HLL's exact range: pin the true counts too
    assert(streamed === Seq((day0, 3L), (day1, 3L)))
  }
}
