package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming materialized-view maintenance: per-batch partial aggregates
  * fold to exactly the batch-global aggregate, replay is idempotent, and a
  * stream-static broadcast enrichment rides the same micro-batch.
  */
class StreamingAggViewSpec extends SparkSpec {
  import spark.implicits._

  test("view equals global aggregate across micro-batches; replay is idempotent") {
    val path = java.nio.file.Files.createTempDirectory("aggview").toString + "/mv"
    val keys = Seq("k")
    val sums = Seq("cnt", "sv")

    // two disjoint micro-batches with an overlapping key
    val b0 = Seq(("a", 10.0), ("a", 20.0), ("b", 5.0)).toDF("k", "v")
      .withColumn("cnt", lit(1L)).withColumn("sv", col("v"))
    val b1 = Seq(("a", 1.0), ("c", 7.0)).toDF("k", "v")
      .withColumn("cnt", lit(1L)).withColumn("sv", col("v"))
    StreamingAggView.writePartial(path, keys, sums)(b0, 0L)
    StreamingAggView.writePartial(path, keys, sums)(b1, 1L)
    // at-least-once replay of batch 1 must overwrite, not double-count
    StreamingAggView.writePartial(path, keys, sums)(b1, 1L)

    val view = StreamingAggView.readView(spark, path, keys, sums)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(view == Map("a" -> (3L, 31.0), "b" -> (1L, 5.0), "c" -> (1L, 7.0)))
  }

  test("maintains the view from a real stream with stream-static broadcast enrichment") {
    val path = java.nio.file.Files.createTempDirectory("aggview-e2e").toString + "/mv"
    val dim = broadcast(Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment"))

    val in = MemoryStream[(Long, Double)](spark)
    val enriched = in.toDF().toDF("user_id", "v")
      .join(dim, Seq("user_id")) // stream-static: re-planned per micro-batch
      .withColumn("cnt", lit(1L)).withColumn("sv", col("v"))
    val q = enriched.writeStream
      .outputMode("update")
      .foreachBatch(StreamingAggView.writePartial(path, Seq("segment"), Seq("cnt", "sv")) _)
      .start()
    try {
      in.addData((1L, 10.0), (2L, 3.0))
      q.processAllAvailable()
      in.addData((1L, 5.0), (3L, 99.0)) // user 3 has no dimension row → dropped
      q.processAllAvailable()
    } finally q.stop()

    val view = StreamingAggView.readView(spark, path, Seq("segment"), Seq("cnt", "sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(view == Map("gold" -> (2L, 15.0), "basic" -> (1L, 3.0)))
  }
}
