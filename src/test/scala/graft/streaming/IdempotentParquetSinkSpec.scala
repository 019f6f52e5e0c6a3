package graft.streaming

import graft.SparkSpec

/** Replay-safety of the batch-id-partitioned foreachBatch sink: re-running a
  * batch overwrites its own output (no duplicates), distinct batches
  * accumulate. */
class IdempotentParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  test("replayed batch overwrites its own partition; new batches append") {
    val path = java.nio.file.Files.createTempDirectory("idem-sink").toString + "/out"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    IdempotentParquetSink.write(path)(b0, 0L)
    // at-least-once replay of the SAME batch (e.g. failure between sink
    // completion and checkpoint commit) must not duplicate rows
    IdempotentParquetSink.write(path)(b0, 0L)
    assert(spark.read.parquet(path).count() == 2)

    val b1 = Seq((3L, "c")).toDF("id", "v")
    IdempotentParquetSink.write(path)(b1, 1L)
    val out = spark.read.parquet(path)
    assert(out.count() == 3)
    // batch-aligned incremental read
    assert(out.where("batch_id > 0").count() == 1)
  }
}
