package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming materialized-view maintenance on plain parquet: each
  * micro-batch lands as a PARTIAL aggregate in its own `batch_id` partition
  * (idempotent under replay, like [[IdempotentParquetSink]]), and the view
  * is the algebraic fold of all partials — the streaming face of
  * `PipelineOps.mergeAggregates`.
  *
  * Why partials instead of read-merge-write: a replayed batch overwrites
  * exactly its own partition, so at-least-once `foreachBatch` still yields
  * an exactly-once view without transactional storage; and the refresh cost
  * per batch is the batch's own group count, never the view size. Readers
  * fold |batches| × |groups-per-batch| slim rows — when that log grows long,
  * folding old partitions into one is ordinary compaction (a table format's
  * MERGE does the same thing with bookkeeping; the algebra is identical).
  *
  * Only algebraic (commutative-monoid) measures compose this way; carry
  * avg/stddev as sum+count parts and finalize in the reader.
  */
object StreamingAggView {

  /** Use as `.writeStream.foreachBatch(StreamingAggView.writePartial(path, Seq("k"), Seq("cnt", "sv")) _)`.
    * `sumCols` are summable columns of the batch rows (pre-derive e.g.
    * `cnt = lit(1L)` upstream for counts).
    */
  def writePartial(path: String, keyCols: Seq[String], sumCols: Seq[String])(
      batch: DataFrame, batchId: Long): Unit =
    batch.groupBy(keyCols.map(col): _*)
      .agg(sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** Current view state: fold every batch partial. */
  def readView(spark: SparkSession, path: String,
      keyCols: Seq[String], sumCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
}
