package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A deduplicatable task event for the typed state API. */
case class DedupEvent(
    task_identifier: String,
    frame_index: Long,
    event_time: Long,
    payload: String)

/** ST1 on the modern arbitrary-state API (`transformWithState`,
  * Spark 4 `StatefulProcessor`): identical frame-snapshot semantics to
  * [[HighWatermarkDedup]] (reference app.rb:163-167, 270-273), plus the one
  * thing the reference can't do — **state TTL**. The reference's
  * `task_metadata` map grows without bound for the life of the process
  * (app.rb:78, SURVEY §4 "unbounded growth = its memory model"); a TTL on
  * the per-key watermark evicts keys for tasks that stopped emitting, which
  * is what keeps 100 TB-scale key cardinality bounded in the state store
  * (requires the RocksDB state store provider).
  */
class WatermarkDedupProcessor(initialWatermarkNs: Long, ttl: TTLConfig)
    extends StatefulProcessor[String, DedupEvent, DedupEvent] {

  @transient private var wm: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    wm = getHandle.getValueState[Long]("watermark", Encoders.scalaLong, ttl)

  override def handleInputRows(key: String, rows: Iterator[DedupEvent],
                               timerValues: TimerValues): Iterator[DedupEvent] = {
    val batch = rows.toVector
    val units = batch.groupBy(_.frame_index).toSeq.sortBy(_._1).map(_._2)
    val (out, cur) = WatermarkLogic.dedupUnits[DedupEvent](units,
      e => Some(e.event_time),
      if (wm.exists()) wm.get() else initialWatermarkNs)
    wm.update(cur)
    out.iterator
  }
}

object WatermarkDedupProcessor {

  /** Apply the processor to a typed event stream. `ttl` None = keep state
    * forever (the reference's behaviour); Some(d) = evict idle keys. TTL
    * state requires `TimeMode.ProcessingTime` (Spark rejects TTL variables
    * under `TimeMode.None` with StatefulProcessorCannotAssignTTLInTimeMode),
    * so the time mode follows the ttl choice. */
  def dedup(events: Dataset[DedupEvent], initialWatermarkNs: Long,
            ttl: Option[java.time.Duration] = None): Dataset[DedupEvent] = {
    val cfg = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    implicit val enc = Encoders.product[DedupEvent]
    events
      .groupByKey(_.task_identifier)(Encoders.STRING)
      .transformWithState(
        new WatermarkDedupProcessor(initialWatermarkNs, cfg),
        timeMode, OutputMode.Append())
  }
}
