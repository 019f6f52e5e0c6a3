package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST1 — keyed stateful high-watermark dedup with the reference's exact
  * batch-snapshot semantics (reference app.rb:72-78, 145-146, 158-167,
  * 270-273):
  *
  *  - state per `task_identifier` = the highest event `Time` (int64 ns) seen
  *    in *previous* batches, seeded with the pipeline start time (app.rb:72);
  *  - every event in the current batch is compared against that SNAPSHOT,
  *    not a running max — equal-timestamp duplicates within one batch all
  *    pass (SURVEY §7.4.2; a naive dropDuplicates would drop them);
  *  - after the batch, the watermark advances to max(snapshot, batch max) —
  *    monotone, never retreats (app.rb:270-273).
  *
  * Implemented with `flatMapGroupsWithState` — an API extension point, not
  * planner surgery (SURVEY §4). State is one Long per key: at 100 TB-scale
  * key cardinality this stays KB-per-million-keys in the state store.
  */
final case class HighWatermarkDedup(
    initialWatermarkNs: Long,
    keyCol: String = "task_identifier",
    timeCol: String = "event_time") {

  def apply(spark: SparkSession, events: DataFrame): DataFrame = {
    val schema = events.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val timeIdx = schema.fieldIndex(timeCol)
    val init = initialWatermarkNs
    implicit val rowEnc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema))
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.scalaLong

    events
      .groupByKey((r: Row) => r.getString(keyIdx))
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
          val snapshot = state.getOption.getOrElse(init)
          val batch = rows.toVector
          val out = batch.filter { r =>
            !r.isNullAt(timeIdx) && r.getLong(timeIdx) > snapshot  // app.rb:163
          }
          val batchMax = batch.iterator
            .filterNot(_.isNullAt(timeIdx)).map(_.getLong(timeIdx))
            .foldLeft(snapshot)(math.max)                          // app.rb:270-273
          state.update(batchMax)
          out.iterator
      }(stateEnc, rowEnc)
      .toDF(schema.fieldNames.toIndexedSeq: _*)
  }
}
